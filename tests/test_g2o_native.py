"""Native C++ g2o parser vs the pure-Python tokenizer.

The native parser is the framework's equivalent of the reference's native
(Rust) data loader (g2o.rs:35-143). Contract: bit-identical arrays on
every bundled dataset, and graceful fallback (``None``) on anything it
cannot parse — the Python parser then owns error semantics.
"""

import numpy as np
import pytest

from rustrobotics_tpu.mapping import g2o
from rustrobotics_tpu.mapping.g2o_native import native_available, parse_native

GRAPHS = [
    "intel.g2o", "dlr.g2o", "simulation-pose-pose.g2o",
    "simulation-pose-landmark.g2o", "input_M3500_g2o.g2o",
    "sphere2500.g2o", "torus3D.g2o", "parking-garage.g2o",
]

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native g2o parser unavailable (no g++)"
)


@pytest.mark.parametrize("name", GRAPHS)
def test_native_bitwise_parity(dataset_dir, name):
    path = str(dataset_dir / "g2o" / name)
    dn = parse_native(path)
    dp = g2o._parse_python(path)
    assert dn is not None
    assert set(dn) == set(dp)
    for k in dp:
        if isinstance(dp[k], (int, np.integer)):
            assert int(dn[k]) == int(dp[k]), k
        else:
            assert dn[k].dtype == dp[k].dtype, k
            assert np.array_equal(dn[k], dp[k]), k


def test_load_g2o_uses_identical_graph(dataset_dir):
    """load_g2o (native path) == graph built from the Python parse dict."""
    path = str(dataset_dir / "g2o" / "intel.g2o")
    graph, meta = g2o.load_g2o_with_meta(path)
    graph_py, meta_py = g2o._build_graph(g2o._parse_python(path), np.float64)
    import jax

    for a, b in zip(jax.tree.leaves(graph), jax.tree.leaves(graph_py)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert graph.total_dof == graph_py.total_dof == 5184
    assert graph.prior2 == graph_py.prior2
    assert np.array_equal(meta.pp_file_index, meta_py.pp_file_index)


def test_native_rejects_unknown_record(tmp_path):
    """Unknown tags: native returns None; the Python fallback raises."""
    bad = tmp_path / "bad.g2o"
    bad.write_text("VERTEX_SE2 0 0.0 0.0 0.0\nFIXED 0\n")
    assert parse_native(str(bad)) is None
    with pytest.raises(ValueError, match="unsupported g2o record"):
        g2o.load_g2o(str(bad))


def test_native_handles_forward_edge_reference(tmp_path):
    """Edges may cite vertices declared later in the file (both parsers
    resolve indices after the full pass)."""
    f = tmp_path / "fwd.g2o"
    f.write_text(
        "EDGE_SE2 0 1 1.0 0.0 0.0 1 0 0 1 0 1\n"
        "VERTEX_SE2 0 0.0 0.0 0.0\n"
        "VERTEX_SE2 1 1.0 0.0 0.0\n"
    )
    dn = parse_native(str(f))
    dp = g2o._parse_python(str(f))
    assert dn is not None
    assert np.array_equal(dn["pp_from"], dp["pp_from"])
    assert np.array_equal(dn["pp_to"], dp["pp_to"])
    assert dn["prior2"] == dp["prior2"] == 0
