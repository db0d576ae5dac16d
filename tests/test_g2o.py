"""g2o parse-contract tests (golden counts from src/mapping/g2o.rs:149-175)."""

import numpy as np
import pytest

from rustrobotics_tpu.mapping import load_g2o


CASES = [
    ("simulation-pose-pose.g2o", 400, 1773, 1200),
    ("simulation-pose-landmark.g2o", 77, 297, 195),
    ("intel.g2o", 1728, 4830, 5184),
    ("dlr.g2o", 3873, 17605, 11043),
]


@pytest.mark.parametrize("name,nodes,edges,dof", CASES)
def test_parse_counts_2d(dataset_dir, name, nodes, edges, dof):
    g = load_g2o(dataset_dir / "g2o" / name)
    assert g.num_nodes == nodes
    assert g.num_edges == edges
    assert g.total_dof == dof


def test_parse_3d_sphere(dataset_dir):
    """3D parse contract is ours to establish (the reference parses but
    cannot optimize 3D; quaternion parse order fixed, g2o.rs:18-22)."""
    g = load_g2o(dataset_dir / "g2o" / "sphere2500.g2o")
    assert g.is_3d
    assert g.poses3.shape[0] == 2500
    assert g.total_dof == 2500 * 6
    # quaternions stored wxyz and normalized
    norms = np.linalg.norm(np.asarray(g.poses3[:, 3:]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    # information matrices symmetric
    om = np.asarray(g.qq_omega)
    np.testing.assert_allclose(om, np.swapaxes(om, -1, -2))


def test_offsets_are_reference_layout(dataset_dir):
    """dof offsets follow file order with 3/2/6 strides (g2o.rs:54-78)."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    offs = np.sort(
        np.concatenate([np.asarray(g.pose2_offsets), np.asarray(g.lm2_offsets)])
    )
    assert offs[0] == 0
    assert g.total_dof == 195
    # strides are 3 (pose) or 2 (landmark) depending on node kind
    diffs = np.diff(offs)
    assert set(diffs.tolist()) <= {2, 3}
