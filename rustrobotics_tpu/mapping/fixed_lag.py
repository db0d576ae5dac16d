"""Fixed-lag smoother: sliding-window pose-graph optimization with
marginalization.

Production online SLAM keeps a bounded window of recent poses, optimizes
it each step, and MARGINALIZES the oldest pose into a dense Gaussian prior
instead of dropping its information — the standard fixed-lag scheme. The
reference has nothing incremental (its PGO is batch-only over whole g2o
files).

TPU design: everything is fixed-shape — W window poses, W-1 chain
(odometry) edges, a C-capacity masked set of in-window loop closures, and
a dense (3W, 3W) prior information matrix — so ``advance`` jits once and a
whole session runs as a ``lax.scan``. The inner Gauss-Newton solve is a
dense 3W Cholesky (window sizes are tens of poses; the MXU eats it).

Marginalization: at the window optimum the factors' information is
assembled into H (3W, 3W); eliminating the oldest pose's 3x3 block by
Schur complement gives the new prior Lambda' = H_rr - H_r0 H_00^-1 H_0r
anchored at the converged estimates (eta = 0 — the
relinearize-at-convergence approximation used by fixed-lag smoothers).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.geometry import se2
from rustrobotics_tpu.mapping.linearize import edge_terms_pp_soa
from rustrobotics_tpu.utils.angles import wrap_angle


@flax.struct.dataclass
class FixedLagState:
    poses: jnp.ndarray         # (W, 3) current window estimates
    chain_z: jnp.ndarray       # (W-1, 3) odometry measurements i -> i+1
    clos_ij: jnp.ndarray       # (C, 2) int32 window indices (i, j)
    clos_z: jnp.ndarray        # (C, 3)
    clos_mask: jnp.ndarray     # (C,) bool
    prior_lambda: jnp.ndarray  # (3W, 3W) information of the marginal prior
    prior_mu: jnp.ndarray      # (W, 3) anchor of the prior chart
    steps: jnp.ndarray         # () int32 — poses consumed so far
    clos_cursor: jnp.ndarray   # () int32 — round-robin insertion cursor


@flax.struct.dataclass
class FixedLagSmoother:
    """window: W poses; closure_capacity: C masked slots."""

    window: int = flax.struct.field(pytree_node=False)
    closure_capacity: int = flax.struct.field(pytree_node=False)
    chain_omega: jnp.ndarray   # (3, 3) odometry information
    clos_omega: jnp.ndarray    # (3, 3) closure information
    anchor_weight: float = flax.struct.field(pytree_node=False, default=1e6)
    gn_iters: int = flax.struct.field(pytree_node=False, default=3)

    @classmethod
    def create(cls, window, closure_capacity, chain_omega, clos_omega,
               **kw):
        return cls(window=window, closure_capacity=closure_capacity,
                   chain_omega=jnp.asarray(chain_omega),
                   clos_omega=jnp.asarray(clos_omega), **kw)

    def init_state(self, pose0) -> FixedLagState:
        w, c = self.window, self.closure_capacity
        pose0 = jnp.asarray(pose0)
        dtype = pose0.dtype
        lam = jnp.zeros((3 * w, 3 * w), dtype)
        # gauge anchor on the first pose of the first window
        lam = lam.at[:3, :3].set(jnp.eye(3, dtype=dtype) * self.anchor_weight)
        return FixedLagState(
            poses=jnp.broadcast_to(pose0, (w, 3)).astype(dtype),
            chain_z=jnp.zeros((w - 1, 3), dtype),
            clos_ij=jnp.zeros((c, 2), jnp.int32),
            clos_z=jnp.zeros((c, 3), dtype),
            clos_mask=jnp.zeros(c, bool),
            prior_lambda=lam,
            prior_mu=jnp.broadcast_to(pose0, (w, 3)).astype(dtype),
            steps=jnp.asarray(1, jnp.int32),
            clos_cursor=jnp.asarray(0, jnp.int32),
        )

    # ----------------------------------------------------------- internals

    def _chart(self, poses, mu):
        """Window chart: translation difference + wrapped angle diff."""
        d = poses - mu
        return d.at[:, 2].set(wrap_angle(d[:, 2])).reshape(-1)

    def _assemble(self, state: FixedLagState):
        """H (3W, 3W), b (3W,) at the current estimates; active edges =
        chain edges with index < steps-1 (young windows are short)."""
        w = self.window
        dtype = state.poses.dtype
        n = 3 * w
        h = jnp.zeros((n, n), dtype)
        b = jnp.zeros(n, dtype)

        def add_edges(h, b, frm, to, z, omega, mask):
            e_cnt = frm.shape[0]
            om = jnp.broadcast_to(omega, (e_cnt, 3, 3)) * mask[:, None, None]
            _, hii, hij, hjj, bi, bj, _ = edge_terms_pp_soa(
                state.poses, frm, to, z, om
            )
            rows3 = lambda k: frm * 3 + k  # noqa: E731
            cols3 = lambda k: to * 3 + k  # noqa: E731
            for a in range(3):
                for c_ in range(3):
                    h = h.at[rows3(a), rows3(c_)].add(hii[a][c_])
                    h = h.at[rows3(a), cols3(c_)].add(hij[a][c_])
                    h = h.at[cols3(a), rows3(c_)].add(hij[c_][a])
                    h = h.at[cols3(a), cols3(c_)].add(hjj[a][c_])
                # b convention: H dx = b with b = -J^T Omega e
                b = b.at[rows3(a)].add(-bi[a])
                b = b.at[cols3(a)].add(-bj[a])
            return h, b

        chain_from = jnp.arange(w - 1, dtype=jnp.int32)
        chain_mask = (chain_from + 1 < state.steps).astype(dtype)
        h, b = add_edges(h, b, chain_from, chain_from + 1, state.chain_z,
                         self.chain_omega, chain_mask)
        h, b = add_edges(h, b, state.clos_ij[:, 0], state.clos_ij[:, 1],
                         state.clos_z, self.clos_omega,
                         state.clos_mask.astype(dtype))

        # prior factor: E = 0.5 (v - mu)^T Lambda (v - mu)
        e_prior = self._chart(state.poses, state.prior_mu)
        h = h + state.prior_lambda
        b = b - state.prior_lambda @ e_prior  # our b convention is -J^T Ω e

        # pin factor-free dofs (window slots beyond `steps` while the
        # window is still filling) so H stays SPD
        inactive = (jnp.arange(n) >= 3 * state.steps).astype(dtype)
        h = h + jnp.diag(inactive)
        return h, b

    def _gn(self, state: FixedLagState) -> FixedLagState:
        def body(poses, _):
            st = state.replace(poses=poses)
            h, b = self._assemble(st)
            d = jnp.sqrt(jnp.clip(jnp.diagonal(h), 1e-12, None))
            hs = h / (d[:, None] * d[None, :])
            with jax.default_matmul_precision("highest"):
                cf = jax.scipy.linalg.cho_factor(hs)
                dx = jax.scipy.linalg.cho_solve(cf, b / d) / d
            return se2.retract(poses, dx.reshape(-1, 3)), None

        poses, _ = jax.lax.scan(body, state.poses, None,
                                length=self.gn_iters)
        return state.replace(poses=poses)

    # ------------------------------------------------------------- stepping

    def add_closure(self, state: FixedLagState, i, j, z) -> FixedLagState:
        """Register a loop closure between window poses i -> j (oldest
        window pose is index 0). Takes the first free slot; with all slots
        busy the closure at the round-robin cursor (the oldest insertion)
        is overwritten."""
        free = jnp.argmin(state.clos_mask)  # first False, else 0
        all_busy = jnp.all(state.clos_mask)
        slot = jnp.where(all_busy, state.clos_cursor, free)
        return state.replace(
            clos_ij=state.clos_ij.at[slot].set(
                jnp.asarray([i, j], jnp.int32)),
            clos_z=state.clos_z.at[slot].set(z),
            clos_mask=state.clos_mask.at[slot].set(True),
            clos_cursor=(slot + 1) % self.closure_capacity,
        )

    def advance(self, state: FixedLagState, odom_z) -> FixedLagState:
        """Optimize the window, marginalize the oldest pose, slide, and
        append the new odometry edge/pose."""
        w = self.window
        dtype = state.poses.dtype
        state = self._gn(state)

        # marginalize pose 0 out of the information at the optimum
        h, _ = self._assemble(state)
        with jax.default_matmul_precision("highest"):
            h00 = h[:3, :3] + jnp.eye(3, dtype=dtype) * 1e-9
            k = jnp.linalg.solve(h00, h[:3, 3:])
            lam_marg = h[3:, 3:] - h[3:, :3] @ k  # (3(W-1), 3(W-1))
        lam_new = jnp.zeros((3 * w, 3 * w), dtype)
        lam_new = lam_new.at[: 3 * (w - 1), : 3 * (w - 1)].set(lam_marg)

        # slide the window; predict the new pose from odometry off the
        # last ACTIVE pose (index steps-1 while the window is filling)
        full = state.steps >= w
        last = state.poses[jnp.clip(state.steps - 1, 0, w - 1)]
        new_pose = se2.compose(last, odom_z)
        poses = jnp.where(
            full,
            jnp.concatenate([state.poses[1:], new_pose[None]], axis=0),
            _insert_at(state.poses, state.steps, new_pose),
        )
        chain_z = jnp.where(
            full,
            jnp.concatenate([state.chain_z[1:], odom_z[None]], axis=0),
            _insert_at(state.chain_z, state.steps - 1, odom_z),
        )
        # closures shift with the window once it is full; expired ones die
        ij = jnp.where(full, state.clos_ij - 1, state.clos_ij)
        mask = jnp.logical_and(state.clos_mask, ij.min(axis=1) >= 0)
        prior_lambda = jnp.where(full, lam_new, state.prior_lambda)
        prior_mu = jnp.where(full, poses, state.prior_mu)
        return FixedLagState(
            poses=poses, chain_z=chain_z, clos_ij=ij, clos_z=state.clos_z,
            clos_mask=mask, prior_lambda=prior_lambda, prior_mu=prior_mu,
            steps=state.steps + 1, clos_cursor=state.clos_cursor,
        )

    def current_pose(self, state: FixedLagState):
        idx = jnp.clip(state.steps - 1, 0, self.window - 1)
        return state.poses[idx]


def _insert_at(arr, idx, row):
    idx = jnp.clip(idx, 0, arr.shape[0] - 1)
    return arr.at[idx].set(row)
