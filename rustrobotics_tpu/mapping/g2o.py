"""g2o file parser -> typed, padded, struct-of-arrays pose graph.

Parses the record kinds the reference supports (src/mapping/g2o.rs:53-137):
VERTEX_SE2, VERTEX_XY, VERTEX_SE3:QUAT, EDGE_SE2, EDGE_SE2_XY,
EDGE_SE3:QUAT. Instead of hash maps of enums, nodes and edges land in dense
arrays grouped by type, with integer index arrays — the layout XLA needs for
vmapped linearization and scatter-add assembly.

Known reference bug NOT reproduced: nalgebra's ``Quaternion::new`` takes
(w, x, y, z) but the reference passes (qx, qy, qz, qw) (g2o.rs:18-22),
scrambling every 3D rotation it parses. We store quaternions as
[qw, qx, qy, qz] with correct field order.

Layout contract (matches the reference dof layout for oracle comparisons):
each vertex gets a dof offset in *file order* — SE2: 3, XY: 2, SE3: 6
(g2o.rs:54-78). ``total_dof`` equals the reference's ``len`` so parse-count
golden tests (g2o.rs:149-175) apply directly.
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class PoseGraphData:
    """Device-resident pose graph, grouped by node/edge type.

    2D: poses2 (N2, 3) [x, y, theta], landmarks2 (L2, 2).
    3D: poses3 (N3, 7) [t, q_wxyz].
    Edges reference *type-local indices* (row into poses2/landmarks2/poses3).
    """

    # nodes
    poses2: jnp.ndarray  # (N2, 3)
    landmarks2: jnp.ndarray  # (L2, 2)
    poses3: jnp.ndarray  # (N3, 7)
    # SE2-SE2 edges
    pp_from: jnp.ndarray  # (E_pp,) int32 -> poses2 row
    pp_to: jnp.ndarray
    pp_z: jnp.ndarray  # (E_pp, 3)
    pp_omega: jnp.ndarray  # (E_pp, 3, 3)
    # SE2-XY edges
    pl_pose: jnp.ndarray  # (E_pl,) int32 -> poses2 row
    pl_lm: jnp.ndarray  # (E_pl,) int32 -> landmarks2 row
    pl_z: jnp.ndarray  # (E_pl, 2)
    pl_omega: jnp.ndarray  # (E_pl, 2, 2)
    # SE3-SE3 edges
    qq_from: jnp.ndarray  # (E_qq,) int32 -> poses3 row
    qq_to: jnp.ndarray
    qq_z: jnp.ndarray  # (E_qq, 7)
    qq_omega: jnp.ndarray  # (E_qq, 6, 6)
    # reference dof layout (for oracle-parity dx vectors)
    pose2_offsets: jnp.ndarray  # (N2,) int32
    lm2_offsets: jnp.ndarray  # (L2,) int32
    pose3_offsets: jnp.ndarray  # (N3,) int32
    # static metadata
    total_dof: int = flax.struct.field(pytree_node=False, default=0)
    prior2: int = flax.struct.field(pytree_node=False, default=-1)
    prior3: int = flax.struct.field(pytree_node=False, default=-1)

    @property
    def num_nodes(self) -> int:
        return self.poses2.shape[0] + self.landmarks2.shape[0] + self.poses3.shape[0]

    @property
    def num_edges(self) -> int:
        return self.pp_from.shape[0] + self.pl_pose.shape[0] + self.qq_from.shape[0]

    @property
    def is_3d(self) -> bool:
        return self.poses3.shape[0] > 0

    def astype(self, dtype) -> "PoseGraphData":
        float_fields = {
            "poses2", "landmarks2", "poses3",
            "pp_z", "pp_omega", "pl_z", "pl_omega", "qq_z", "qq_omega",
        }
        updates = {
            name: getattr(self, name).astype(dtype) for name in float_fields
        }
        return self.replace(**updates)


@dataclasses.dataclass
class _Builder:
    pose2_ids: dict
    lm2_ids: dict
    pose3_ids: dict
    poses2: list
    landmarks2: list
    poses3: list
    offsets: dict  # node id -> dof offset (reference layout)
    next_offset: int = 0


@dataclasses.dataclass
class G2OMeta:
    """Host-side parse metadata (not a pytree).

    ``pp_file_index`` / ``pl_file_index`` give, for each typed edge row, its
    position in the reference's mixed-type file-order edge list — used by
    oracle tests that address edges by position (pgo.rs:638,663,697).
    """

    pp_file_index: np.ndarray
    pl_file_index: np.ndarray
    qq_file_index: np.ndarray


def load_g2o(path: str, dtype=np.float64) -> PoseGraphData:
    """Parse a g2o text file (role of parse_g2o, g2o.rs:35-143)."""
    graph, _ = load_g2o_with_meta(path, dtype)
    return graph


def load_g2o_with_meta(path: str, dtype=np.float64):
    """Parse via the native C++ parser (the framework's equivalent of the
    reference's native Rust loader) with automatic fallback to the pure-
    Python tokenizer — both produce bit-identical arrays
    (tests/test_g2o_native.py pins this on every bundled graph)."""
    from . import g2o_native

    d = g2o_native.parse_native(path)
    if d is None:
        d = _parse_python(path)
    return _build_graph(d, dtype)


def _parse_python(path: str) -> dict:
    b = _Builder({}, {}, {}, [], [], [], {})
    pp, pl, qq = [], [], []
    prior2 = -1
    prior3 = -1
    edge_file_index = 0

    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            vals = parts[1:]
            if tag == "VERTEX_SE2":
                node_id = int(vals[0])
                b.pose2_ids[node_id] = len(b.poses2)
                b.poses2.append([float(v) for v in vals[1:4]])
                b.offsets[node_id] = b.next_offset
                b.next_offset += 3
            elif tag == "VERTEX_XY":
                node_id = int(vals[0])
                b.lm2_ids[node_id] = len(b.landmarks2)
                b.landmarks2.append([float(v) for v in vals[1:3]])
                b.offsets[node_id] = b.next_offset
                b.next_offset += 2
            elif tag == "VERTEX_SE3:QUAT":
                node_id = int(vals[0])
                x, y, z, qx, qy, qz, qw = (float(v) for v in vals[1:8])
                b.pose3_ids[node_id] = len(b.poses3)
                b.poses3.append([x, y, z, qw, qx, qy, qz])
                b.offsets[node_id] = b.next_offset
                b.next_offset += 6
            elif tag == "EDGE_SE2":
                f, t = int(vals[0]), int(vals[1])
                x, y, th, i11, i12, i13, i22, i23, i33 = (
                    float(v) for v in vals[2:11]
                )
                omega = [[i11, i12, i13], [i12, i22, i23], [i13, i23, i33]]
                pp.append((f, t, [x, y, th], omega, edge_file_index))
                if prior2 < 0:
                    prior2 = f  # gauge prior on the first SE2 edge's from
                    # node (pose_graph_optimization.rs:330-336)
                edge_file_index += 1
            elif tag == "EDGE_SE2_XY":
                f, t = int(vals[0]), int(vals[1])
                x, y, i11, i12, i22 = (float(v) for v in vals[2:7])
                pl.append((f, t, [x, y], [[i11, i12], [i12, i22]], edge_file_index))
                edge_file_index += 1
            elif tag == "EDGE_SE3:QUAT":
                f, t = int(vals[0]), int(vals[1])
                m = [float(v) for v in vals[2:9]]
                x, y, z, qx, qy, qz, qw = m
                upper = [float(v) for v in vals[9:30]]
                omega = np.zeros((6, 6))
                k = 0
                for i in range(6):
                    for j in range(i, 6):
                        omega[i, j] = upper[k]
                        omega[j, i] = upper[k]
                        k += 1
                qq.append(
                    (f, t, [x, y, z, qw, qx, qy, qz], omega, edge_file_index)
                )
                if prior3 < 0:
                    prior3 = f
                edge_file_index += 1
            else:
                raise ValueError(f"unsupported g2o record {tag!r} in {path}")

    def idx(ids, table):
        return np.asarray([table[i] for i in ids], dtype=np.int32)

    pose2_offsets = [b.offsets[i] for i in sorted(b.pose2_ids, key=b.pose2_ids.get)]
    lm2_offsets = [b.offsets[i] for i in sorted(b.lm2_ids, key=b.lm2_ids.get)]
    pose3_offsets = [b.offsets[i] for i in sorted(b.pose3_ids, key=b.pose3_ids.get)]

    return {
        "poses2": np.asarray(b.poses2, dtype=np.float64).reshape(-1, 3),
        "landmarks2": np.asarray(b.landmarks2, dtype=np.float64).reshape(-1, 2),
        "poses3": np.asarray(b.poses3, dtype=np.float64).reshape(-1, 7),
        "pp_from": idx([e[0] for e in pp], b.pose2_ids),
        "pp_to": idx([e[1] for e in pp], b.pose2_ids),
        "pp_z": np.asarray([e[2] for e in pp], dtype=np.float64).reshape(-1, 3),
        "pp_omega": np.asarray(
            [e[3] for e in pp], dtype=np.float64).reshape(-1, 3, 3),
        "pl_pose": idx([e[0] for e in pl], b.pose2_ids),
        "pl_lm": idx([e[1] for e in pl], b.lm2_ids),
        "pl_z": np.asarray([e[2] for e in pl], dtype=np.float64).reshape(-1, 2),
        "pl_omega": np.asarray(
            [e[3] for e in pl], dtype=np.float64).reshape(-1, 2, 2),
        "qq_from": idx([e[0] for e in qq], b.pose3_ids),
        "qq_to": idx([e[1] for e in qq], b.pose3_ids),
        "qq_z": np.asarray([e[2] for e in qq], dtype=np.float64).reshape(-1, 7),
        "qq_omega": np.asarray(
            [e[3] for e in qq], dtype=np.float64).reshape(-1, 6, 6),
        "pose2_offsets": np.asarray(pose2_offsets, dtype=np.int32),
        "lm2_offsets": np.asarray(lm2_offsets, dtype=np.int32),
        "pose3_offsets": np.asarray(pose3_offsets, dtype=np.int32),
        "pp_file_index": np.asarray([e[4] for e in pp], dtype=np.int64),
        "pl_file_index": np.asarray([e[4] for e in pl], dtype=np.int64),
        "qq_file_index": np.asarray([e[4] for e in qq], dtype=np.int64),
        "total_dof": b.next_offset,
        "prior2": b.pose2_ids.get(prior2, -1) if prior2 >= 0 else -1,
        "prior3": b.pose3_ids.get(prior3, -1) if prior3 >= 0 else -1,
    }


def _build_graph(d: dict, dtype):
    """Numpy parse dict (native or Python) -> device pytree + meta."""

    def arr(a):
        return jnp.asarray(np.asarray(a, dtype=dtype))

    graph = PoseGraphData(
        poses2=arr(d["poses2"]),
        landmarks2=arr(d["landmarks2"]),
        poses3=arr(d["poses3"]),
        pp_from=jnp.asarray(d["pp_from"]),
        pp_to=jnp.asarray(d["pp_to"]),
        pp_z=arr(d["pp_z"]),
        pp_omega=arr(d["pp_omega"]),
        pl_pose=jnp.asarray(d["pl_pose"]),
        pl_lm=jnp.asarray(d["pl_lm"]),
        pl_z=arr(d["pl_z"]),
        pl_omega=arr(d["pl_omega"]),
        qq_from=jnp.asarray(d["qq_from"]),
        qq_to=jnp.asarray(d["qq_to"]),
        qq_z=arr(d["qq_z"]),
        qq_omega=arr(d["qq_omega"]),
        pose2_offsets=jnp.asarray(d["pose2_offsets"]),
        lm2_offsets=jnp.asarray(d["lm2_offsets"]),
        pose3_offsets=jnp.asarray(d["pose3_offsets"]),
        total_dof=int(d["total_dof"]),
        prior2=int(d["prior2"]),
        prior3=int(d["prior3"]),
    )
    meta = G2OMeta(
        pp_file_index=d["pp_file_index"],
        pl_file_index=d["pl_file_index"],
        qq_file_index=d["qq_file_index"],
    )
    return graph, meta
