"""Auxiliary-subsystem tests: checkpoint/resume, metrics, config
(SURVEY §5 — all absent in the reference, first-class here)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rustrobotics_tpu.config import FilterConfig, PGOConfig, from_dict
from rustrobotics_tpu.mapping.synthetic import synthetic_pose_graph_2d
from rustrobotics_tpu.utils.checkpoint import (
    CheckpointingOptimizer,
    restore_checkpoint,
    save_checkpoint,
)
from rustrobotics_tpu.utils.metrics import OptimizerMetrics, PhaseTimer


def test_checkpoint_roundtrip(tmp_path):
    g = synthetic_pose_graph_2d(num_poses=16, num_landmarks=2)
    p = save_checkpoint(tmp_path / "snap.npz", g, step=7)
    g2, step = restore_checkpoint(p, g)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(g.poses2), np.asarray(g2.poses2))
    np.testing.assert_array_equal(np.asarray(g.pp_z), np.asarray(g2.pp_z))
    assert g2.total_dof == g.total_dof


@pytest.mark.slow
def test_checkpointing_optimizer_resumes(tmp_path):
    from rustrobotics_tpu.mapping.pgo import global_error

    g = synthetic_pose_graph_2d(num_poses=48, num_landmarks=4, noise=0.1)
    opt = CheckpointingOptimizer(tmp_path, every=2)
    res1 = opt.optimize(g, num_iterations=3, backend="host", tolerance=0.0)
    assert opt.latest() is not None
    # resume continues from the snapshot, not from scratch
    res2 = opt.optimize(g, num_iterations=6, backend="host", tolerance=0.0)
    assert res2.iterations <= 6
    assert float(global_error(res2.graph)) <= res1.errors[-1] + 1e-9


def test_phase_timer():
    t = PhaseTimer()
    x = jnp.zeros(1000)
    with t.phase("op", block_on=x):
        y = x + 1
    s = t.summary()
    assert s["op"]["count"] == 1
    assert s["op"]["total_s"] >= 0
    del y


@pytest.mark.slow
def test_optimizer_metrics_callback(dataset_dir):
    from rustrobotics_tpu.mapping import load_g2o
    from rustrobotics_tpu.mapping.pgo import optimize

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    m = OptimizerMetrics()
    optimize(g, num_iterations=5, backend="host", callback=m.callback)
    d = m.as_dict()
    assert len(d["chi2"]) >= 2
    assert d["chi2"][-1] < d["chi2"][0]


def test_config_layer():
    cfg = PGOConfig()
    assert cfg.tolerance == 1e-4 and cfg.lambda0 == 0.01  # reference values
    cfg2 = cfg.replace(backend="dense")
    assert cfg2.backend == "dense" and cfg.backend == "host"
    assert hash(cfg) != hash(cfg2)  # hashable (jit-static friendly)
    fc = from_dict(FilterConfig, {"algo": "pf", "num_particles": 64})
    assert fc.num_particles == 64
    with pytest.raises(ValueError):
        from_dict(PGOConfig, {"bogus": 1})


def test_plot_and_gif_writers(tmp_path):
    import numpy as np

    from rustrobotics_tpu.utils.plot import (
        covariance_ellipse,
        plot_filter_history,
        save_filter_gif,
    )

    # ellipse of a diagonal covariance has the right extents
    pts = covariance_ellipse([1.0, 2.0], np.diag([4.0, 0.25]), n_std=1.0,
                             num_points=721)
    assert abs((pts[0].max() - pts[0].min()) / 2 - 2.0) < 1e-3
    assert abs((pts[1].max() - pts[1].min()) / 2 - 0.5) < 1e-3

    t = np.linspace(0, 2 * np.pi, 30)
    hist = {
        "x_true": np.stack([np.cos(t), np.sin(t), t], -1),
        "x_dr": np.stack([np.cos(t) * 1.1, np.sin(t) * 1.1, t], -1),
        "x_est": np.stack([np.cos(t) * 0.99, np.sin(t) * 0.99, t], -1),
        "z": np.stack([np.cos(t), np.sin(t)], -1),
        "cov_est": np.broadcast_to(np.eye(3) * 0.01, (30, 3, 3)),
    }
    png = plot_filter_history(hist, str(tmp_path / "h.png"))
    gif = save_filter_gif(hist, str(tmp_path / "h.gif"), stride=10, fps=5)
    assert (tmp_path / "h.png").stat().st_size > 1000
    assert (tmp_path / "h.gif").stat().st_size > 1000
    assert png.endswith(".png") and gif.endswith(".gif")


def test_debug_sanitizers():
    import jax
    import jax.numpy as jnp

    from rustrobotics_tpu.utils.debug import (
        assert_finite,
        check_covariance,
        checked,
    )

    # NaN inside jit is caught with checkify
    def bad(x):
        return jnp.sqrt(x)  # NaN for negative input

    f = checked(jax.jit(bad))
    f(jnp.asarray(4.0))  # fine
    with pytest.raises(Exception, match="nan"):
        f(jnp.asarray(-1.0))

    # covariance invariant
    def with_cov(c):
        check_covariance(c)
        return c.sum()

    g = checked(jax.jit(with_cov))
    g(jnp.eye(3))
    with pytest.raises(Exception, match="symmetric"):
        g(jnp.asarray([[1.0, 2.0], [0.0, 1.0]]))

    # host-side pytree check
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, jnp.nan])})
