"""Roofline / MFU accounting for the PGO solver backends.

BASELINE.md asks for "PGO iters/sec/chip at speed-of-light"; this module
makes that claim checkable by counting the FLOPs each backend touches
per Gauss-Newton iteration (analytic formulas from the static layout)
and converting measured iteration times into achieved TFLOP/s and
model-FLOP-utilization against the chip's peak.

Peak numbers: TPU v5e ≈ 197 TFLOP/s bf16; full-f32 matmul passes run the
MXU at ~1/4 of that (~49 TFLOP/s), which round-1 profiling confirmed is
where XLA's dense Cholesky lands (docs/PERFORMANCE.md). The solver runs
f32-with-highest-precision, so the f32 peak is the honest denominator.
"""

from __future__ import annotations

# f32 (highest-precision matmul) peak per chip, FLOP/s
PEAK_F32 = {
    "tpu": 49.2e12,   # v5e: 197 bf16 / 4
    "cpu": None,      # no meaningful single number; MFU reported as None
}


def banded_solve_flops(n: int, kb: int, nb: int) -> float:
    """Banded blocked Cholesky solve (ops/band_chol.solve_band_chol):
    per block row — chol kb^3/3, panel triangular solve kb^3, symmetric
    update 2 kb^3; substitutions 4*2 kb^2 per row (lower order)."""
    fact = nb * ((1.0 / 3.0 + 1.0 + 2.0) * kb**3)
    subs = nb * (8.0 * kb**2)
    return fact + subs


def _cr_eliminated_blocks(nb: int) -> int:
    """Total eliminated blocks over all native-length CR levels:
    m -> ceil(m/2) per level eliminates floor(m/2); sums to nb - 1."""
    return max(0, nb - 1)


def banded_cr_flops(n: int, kb: int, nb: int) -> float:
    """Cyclic-reduction banded solve (ops/band_chol.cr_factorize +
    cr_substitute): per level with h odd blocks — batched chol h kb^3/3,
    two batched trsm 2 h kb^3, three batched gemms 6 h kb^3; the
    native-length levels eliminate nb - 1 blocks total (no
    power-of-two padding). Substitution: ~10 kb^2 per block per
    direction (lower order)."""
    fact = _cr_eliminated_blocks(nb) * ((1.0 / 3.0 + 2.0 + 6.0) * kb**3)
    subs = nb * (10.0 * kb**2)
    return fact + subs


def banded_pallas_flops(n: int, kb: int, nb: int) -> float:
    """Fused Pallas chain (ops/band_chol_pallas.solve_band_pallas):
    same chain as banded-direct plus the explicit inverse-factor
    construction — per block row: base-case chol+inverse ~2/3 kb^3,
    sub-panel solves + trailing updates ~3 kb^3 (counting the Linv
    off-diagonal block substitution), coupling panel + Schur update
    4 kb^3. Substitution sweeps are 8 kb^2 matvecs per row."""
    fact = nb * ((2.0 / 3.0 + 3.0 + 4.0) * kb**3)
    subs = nb * (8.0 * kb**2)
    return fact + subs


def banded_mixed_flops(n: int, kb: int, nb: int,
                       rounds: int = 10) -> float:
    """Mixed-precision banded solve (solvers.make_banded_mixed): one
    bf16 CR factorization (banded_cr_flops' factorization term) plus
    ``rounds`` CG iterations, each an exact block-tridiagonal matvec
    (3 batched kb x kb matmuls per block row = 6 nb kb^2), one
    CR-substitution preconditioner apply (~10 kb^2 per block), and ~10n
    CG vector work. ``rounds`` defaults to 10 — the counted lp="high"
    range (intel 9, dlr 27, torus3D 10 via make_banded_mixed's
    return_rounds; the lp="bf16" variant measures 64-233 and only wins
    on well-conditioned graphs)."""
    fact = _cr_eliminated_blocks(nb) * ((1.0 / 3.0 + 2.0 + 6.0) * kb**3)
    per_round = nb * 6.0 * kb**2 + nb * 10.0 * kb**2 + 10.0 * n
    return fact + rounds * per_round


def dense_solve_flops(n: int) -> float:
    """Dense Cholesky n^3/3 + two triangular solves 2 n^2."""
    return n**3 / 3.0 + 2.0 * n**2


def schur_solve_flops(n_pose: int, n_lm: int) -> float:
    """Schur elimination (solvers.solve_schur): W = Hll^-1 Hlp per
    landmark (2x2 inverse + 2 x n_pose panel), S = Hpp - Hpl W
    (2 n_pose^2 n_lm_dof), reduced dense Cholesky."""
    nl_dof = 2 * n_lm
    return (
        n_lm * (8 + 2 * 2 * 2 * n_pose)          # Hll^-1, W panels
        + 2.0 * n_pose * n_pose * nl_dof          # S formation
        + dense_solve_flops(n_pose)
    )


def linearize_flops(n_pp: int, n_pl: int, n_qq: int) -> float:
    """Per-edge residual+Jacobian+A^T Omega A work (entry-level count of
    the SoA component products; ~small vs the solve)."""
    return 600.0 * n_pp + 400.0 * n_pl + 6000.0 * n_qq


def pgo_iteration_flops(graph, backend: str, band_layout=None) -> float:
    """Total FLOPs of one GN iteration (linearize + assemble + solve)."""
    n = graph.total_dof
    lin = linearize_flops(
        graph.pp_from.shape[0], graph.pl_pose.shape[0],
        graph.qq_from.shape[0],
    )
    if backend == "banded-direct" and band_layout is not None:
        solve = banded_solve_flops(n, band_layout.kb, band_layout.nb)
    elif backend == "banded-cr" and band_layout is not None:
        solve = banded_cr_flops(n, band_layout.kb, band_layout.nb)
    elif backend == "banded-pallas" and band_layout is not None:
        from rustrobotics_tpu.ops.band_chol_pallas import (
            pallas_band_supported,
        )

        if pallas_band_supported(band_layout):
            solve = banded_pallas_flops(n, band_layout.kb, band_layout.nb)
        else:  # fell back to the XLA chain
            solve = banded_solve_flops(n, band_layout.kb, band_layout.nb)
    elif backend == "banded-mixed" and band_layout is not None:
        solve = banded_mixed_flops(n, band_layout.kb, band_layout.nb)
    elif backend == "schur":
        n_lm = graph.landmarks2.shape[0]
        solve = schur_solve_flops(n - 2 * n_lm, n_lm)
    else:
        solve = dense_solve_flops(n)
    return lin + solve


def mfu(flops_per_sec: float, platform: str):
    """Model FLOP utilization vs the platform's f32 peak (None on CPU)."""
    peak = PEAK_F32.get(platform)
    if not peak:
        return None
    return flops_per_sec / peak
