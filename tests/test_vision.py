"""Vision-stack tests: DLT, Zhang calibration, P3P, triangulation,
bundle adjustment (all reference README Todo items, README.md:59-64).
Oracles are synthetic cameras with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.vision import (
    decompose_projection,
    dlt_camera,
    homography,
    p3p_best,
    project,
    projection_matrix,
    triangulate,
    zhang_calibrate,
)


def _rot(rx, ry, rz):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    return (np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            @ np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            @ np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]]))


K = np.array([[800.0, 2.0, 320.0], [0.0, 780.0, 240.0], [0.0, 0.0, 1.0]])


def test_projection_decompose_roundtrip():
    r = _rot(0.1, -0.2, 0.3)
    t = np.array([0.5, -0.2, 2.0])
    p = projection_matrix(jnp.asarray(K), jnp.asarray(r), jnp.asarray(t))
    k2, r2, t2 = decompose_projection(p)
    np.testing.assert_allclose(np.asarray(k2), K / K[2, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2), r, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)


@pytest.mark.slow
def test_dlt_camera_recovers_pose():
    rng = np.random.default_rng(0)
    r = _rot(0.2, 0.1, -0.3)
    t = np.array([0.3, 0.1, 3.0])
    pts = rng.uniform(-1, 1, size=(24, 3))
    p_true = projection_matrix(jnp.asarray(K), jnp.asarray(r),
                               jnp.asarray(t))
    uv = project(p_true, jnp.asarray(pts))
    uv = uv + rng.normal(size=uv.shape) * 0.05
    p_est, (k2, r2, t2) = dlt_camera(jnp.asarray(pts), uv)
    uv2 = project(p_est, jnp.asarray(pts))
    assert float(jnp.abs(uv2 - uv).max()) < 0.5
    np.testing.assert_allclose(np.asarray(k2) * K[2, 2], K, rtol=2e-3,
                               atol=0.5)
    np.testing.assert_allclose(np.asarray(r2), r, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t2), t, atol=2e-2)


def test_homography_exact():
    rng = np.random.default_rng(1)
    h_true = np.array([[1.1, 0.1, 5.0], [-0.2, 0.9, -3.0],
                       [1e-4, -2e-4, 1.0]])
    src = rng.uniform(-10, 10, size=(12, 2))
    sh = np.concatenate([src, np.ones((12, 1))], 1) @ h_true.T
    dst = sh[:, :2] / sh[:, 2:3]
    h = homography(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(h), h_true, atol=1e-6)


@pytest.mark.slow
def test_zhang_calibration():
    """3+ views of a planar grid recover the intrinsics."""
    rng = np.random.default_rng(2)
    gx, gy = np.meshgrid(np.arange(7) * 0.03, np.arange(5) * 0.03)
    obj = np.stack([gx.ravel(), gy.ravel()], -1)  # (35, 2) meters
    obj3 = np.concatenate([obj, np.zeros((len(obj), 1))], 1)

    views = []
    for spec in [(0.15, -0.2, 0.05, 0.02, 0.01, 0.45),
                 (-0.25, 0.1, -0.1, -0.05, 0.03, 0.5),
                 (0.1, 0.3, 0.2, 0.03, -0.04, 0.4),
                 (-0.1, -0.15, 0.3, -0.02, -0.02, 0.55)]:
        r = _rot(*spec[:3])
        t = np.array([spec[3], spec[4], spec[5]])
        p = projection_matrix(jnp.asarray(K), jnp.asarray(r),
                              jnp.asarray(t))
        uv = np.asarray(project(p, jnp.asarray(obj3)))
        views.append(uv + rng.normal(size=uv.shape) * 0.05)

    k_est, rs, ts, _ = zhang_calibrate(jnp.asarray(obj),
                                       jnp.asarray(np.stack(views)))
    k_est = np.asarray(k_est)
    assert abs(k_est[0, 0] - K[0, 0]) < 8.0, k_est
    assert abs(k_est[1, 1] - K[1, 1]) < 8.0, k_est
    assert abs(k_est[0, 2] - K[0, 2]) < 8.0, k_est
    assert abs(k_est[1, 2] - K[1, 2]) < 8.0, k_est
    # extrinsics of view 0 close to truth
    np.testing.assert_allclose(np.asarray(ts[0]),
                               [0.02, 0.01, 0.45], atol=0.02)


@pytest.mark.slow
def test_p3p_recovers_pose():
    rng = np.random.default_rng(3)
    r = _rot(0.2, -0.1, 0.4)
    t = np.array([0.2, -0.3, 1.5])
    world = rng.uniform(-1, 1, size=(4, 3)) + np.array([0, 0, 3.0])
    cam = world @ r.T + t
    bearings = cam / np.linalg.norm(cam, axis=1, keepdims=True)
    r_est, t_est = p3p_best(
        jnp.asarray(world[:3]), jnp.asarray(bearings[:3]),
        jnp.asarray(world[3]), jnp.asarray(bearings[3]))
    np.testing.assert_allclose(np.asarray(r_est), r, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)


@pytest.mark.slow
def test_pnp_ransac_with_outliers():
    """Batched-RANSAC PnP recovers the pose with 30% gross outlier
    correspondences (fixed hypothesis batch, one jittable program)."""
    from rustrobotics_tpu.vision import pnp_ransac

    rng = np.random.default_rng(6)
    r = _rot(0.15, -0.25, 0.3)
    t = np.array([0.1, 0.2, 1.2])
    world = rng.uniform(-1, 1, size=(60, 3)) + np.array([0, 0, 3.0])
    cam = world @ r.T + t
    bearings = cam / np.linalg.norm(cam, axis=1, keepdims=True)
    # corrupt 30%
    bad = rng.choice(60, size=18, replace=False)
    noise_dirs = rng.normal(size=(18, 3))
    bearings[bad] = noise_dirs / np.linalg.norm(noise_dirs, axis=1,
                                               keepdims=True)
    r_est, t_est, inl = jax.jit(
        lambda w, b, k: pnp_ransac(w, b, k, num_hypotheses=256)
    )(jnp.asarray(world), jnp.asarray(bearings), jax.random.key(0))
    np.testing.assert_allclose(np.asarray(r_est), r, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=2e-2)
    inl = np.asarray(inl)
    assert inl.sum() >= 38 and not inl[bad].any()


@pytest.mark.slow  # ~6 s: full radial refit; zhang linear + DLT tests stay fast
def test_zhang_radial_distortion():
    """(k1, k2) recovered from synthetically distorted views."""
    from rustrobotics_tpu.vision import (
        distort_points,
        estimate_radial_distortion,
    )

    rng = np.random.default_rng(7)
    gx, gy = np.meshgrid(np.arange(9) * 0.03, np.arange(7) * 0.03)
    obj = np.stack([gx.ravel(), gy.ravel()], -1)
    obj3 = np.concatenate([obj, np.zeros((len(obj), 1))], 1)
    k1, k2 = -0.25, 0.08

    views, rs, ts = [], [], []
    for spec in [(0.15, -0.2, 0.05, 0.02, 0.01, 0.45),
                 (-0.25, 0.1, -0.1, -0.05, 0.03, 0.5),
                 (0.1, 0.3, 0.2, 0.03, -0.04, 0.4)]:
        r = _rot(*spec[:3])
        t = np.array(spec[3:])
        p = projection_matrix(jnp.asarray(K), jnp.asarray(r),
                              jnp.asarray(t))
        uv = project(p, jnp.asarray(obj3))
        views.append(np.asarray(distort_points(jnp.asarray(K), k1, k2, uv))
                     + rng.normal(size=uv.shape) * 0.02)
        rs.append(r)
        ts.append(t)

    sol = estimate_radial_distortion(
        jnp.asarray(K), jnp.asarray(np.stack(rs)),
        jnp.asarray(np.stack(ts)), jnp.asarray(obj),
        jnp.asarray(np.stack(views)))
    np.testing.assert_allclose(np.asarray(sol), [k1, k2], atol=0.02)


@pytest.mark.slow
def test_triangulation():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, size=(50, 3)) + np.array([0, 0, 4.0])
    ps = []
    for spec in [(0, 0, 0, 0, 0, 0), (0.05, -0.1, 0.02, 0.4, 0, 0.1),
                 (-0.08, 0.12, 0.0, -0.35, 0.1, 0.05)]:
        r = _rot(*spec[:3])
        t = np.array(spec[3:])
        ps.append(projection_matrix(jnp.asarray(K), jnp.asarray(r),
                                    jnp.asarray(t)))
    ps = jnp.stack(ps)
    obs = jnp.stack([project(p, jnp.asarray(pts)) for p in ps], axis=1)
    obs = obs + jnp.asarray(rng.normal(size=obs.shape) * 0.1)
    est = triangulate(ps, obs)
    assert float(jnp.abs(est - pts).max()) < 0.02, \
        float(jnp.abs(est - pts).max())


@pytest.mark.slow
def test_bundle_adjustment_reduces_reprojection_error():
    """Perturbed cameras + points recover: reprojection chi2 drops by
    orders of magnitude and the (gauge-fixed) geometry re-aligns."""
    from rustrobotics_tpu.geometry import se3
    from rustrobotics_tpu.vision.bundle import bundle_adjust, project_point

    rng = np.random.default_rng(5)
    n_cams, n_pts = 6, 40
    pts = rng.uniform(-1, 1, size=(n_pts, 3)) + np.array([0, 0, 4.0])
    cams = []
    for i in range(n_cams):
        r = _rot(*rng.normal(size=3) * 0.1)
        t = np.array([0.5 * i - 1.2, 0.1 * rng.normal(), 0.2 * i * 0])
        q = _mat_to_quat(r)
        cams.append(np.concatenate([t, q]))
    cams = np.asarray(cams)

    obs_cam, obs_pt, obs_uv = [], [], []
    for ci in range(n_cams):
        for pi in range(n_pts):
            uv = np.asarray(project_point(
                jnp.asarray(K), jnp.asarray(cams[ci]),
                jnp.asarray(pts[pi])))
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_uv.append(uv + rng.normal(size=2) * 0.1)

    cams0 = cams.copy()
    cams0[1:, :3] += rng.normal(size=(n_cams - 1, 3)) * 0.05
    pts0 = pts + rng.normal(size=pts.shape) * 0.05
    cams0 = jnp.asarray(np.asarray(
        [np.concatenate([c[:3], c[3:] / np.linalg.norm(c[3:])])
         for c in cams0]))

    new_cams, new_pts, errors = bundle_adjust(
        jnp.asarray(K), cams0, jnp.asarray(pts0),
        np.asarray(obs_cam), np.asarray(obs_pt), np.asarray(obs_uv),
        num_iterations=15,
    )
    assert errors[-1] < errors[0] * 1e-3, (errors[0], errors[-1])
    # converged to the noise floor: ~0.1 px per residual component
    n_obs = len(obs_cam)
    rms = np.sqrt(errors[-1] / (2 * n_obs))
    assert rms < 0.2, rms
    # gauge-fixed camera 0 stayed put
    np.testing.assert_allclose(np.asarray(new_cams[0]), cams[0],
                               atol=1e-4)
    del se3


def _mat_to_quat(r):
    """Rotation matrix -> quaternion [w, x, y, z] (well-conditioned
    branch selection)."""
    tr = np.trace(r)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([0.25 * s, (r[2, 1] - r[1, 2]) / s,
                         (r[0, 2] - r[2, 0]) / s,
                         (r[1, 0] - r[0, 1]) / s])
    i = np.argmax(np.diagonal(r))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(r[i, i] - r[j, j] - r[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[0] = (r[k, j] - r[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (r[j, i] + r[i, j]) / s
    q[1 + k] = (r[k, i] + r[i, k]) / s
    return q
