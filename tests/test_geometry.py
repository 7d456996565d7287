"""Unit tests for the batched geometry kernel library (SURVEY.md §7 step 1).

Each kernel is validated against closed-form ground truth on synthetic scenes
— the test pyramid the reference implies but never wrote (SURVEY.md §4(a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gl_slam_tpu.geometry import essential, pnp, projection, se3, triangulation
from gl_slam_tpu.io import synthetic
from gl_slam_tpu.slam import pose_ba


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(num_landmarks=1500, num_frames=8,
                                height=240, width=320, seed=3)


# ---------------------------------------------------------------- SE3 utils

def test_exp_log_so3_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        w = rng.normal(scale=1.0, size=3).astype(np.float32)
        R = se3.exp_so3(jnp.asarray(w))
        w2 = se3.log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)
        # R must be a rotation
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
        assert float(jnp.linalg.det(R)) == pytest.approx(1.0, abs=1e-5)


def test_exp_so3_small_angle():
    w = jnp.asarray([1e-9, -1e-9, 1e-9], jnp.float32)
    R = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_project_to_so3():
    rng = np.random.default_rng(1)
    R = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(size=3), jnp.float32)))
    noisy = R + 0.05 * rng.normal(size=(3, 3)).astype(np.float32)
    Rp = np.asarray(se3.project_to_so3(jnp.asarray(noisy)))
    np.testing.assert_allclose(Rp @ Rp.T, np.eye(3), atol=1e-5)
    assert np.linalg.norm(Rp - R) < 0.15


def test_delta_pose_identity():
    rng = np.random.default_rng(2)
    R = se3.exp_so3(jnp.asarray(rng.normal(size=3), jnp.float32))
    t = jnp.asarray(rng.normal(size=3), jnp.float32)
    dR, dt = se3.delta_pose(R, t, R, t)
    np.testing.assert_allclose(np.asarray(dR), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dt), np.zeros(3), atol=1e-5)


def test_delta_pose_applies():
    """delta_pose(T_pre, T_post) must map T_pre to T_post when applied."""
    rng = np.random.default_rng(4)
    R1 = se3.exp_so3(jnp.asarray(rng.normal(size=3), jnp.float32))
    t1 = jnp.asarray(rng.normal(size=3), jnp.float32)
    R2 = se3.exp_so3(jnp.asarray(rng.normal(size=3), jnp.float32))
    t2 = jnp.asarray(rng.normal(size=3), jnp.float32)
    dR, dt = se3.delta_pose(R1, t1, R2, t2)
    R2b, t2b = se3.compose(dR, dt, R1, t1)
    np.testing.assert_allclose(np.asarray(R2b), np.asarray(R2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2b), np.asarray(t2), atol=1e-4)


# ------------------------------------------------------------- projection

def test_project_roundtrip(scene):
    K = jnp.asarray(scene.K)
    obs = synthetic.observe_frame(scene, 0, max_keypoints=256)
    R = jnp.asarray(scene.poses_R[0], jnp.float32)
    t = jnp.asarray(scene.poses_t[0], jnp.float32)
    pts = jnp.asarray(scene.landmarks[obs.landmark_ids.clip(0)], jnp.float32)
    uv, z, front = projection.project(K, R, t, pts)
    m = obs.valid
    np.testing.assert_allclose(np.asarray(uv)[m], obs.keypoints[m], atol=0.1)
    assert bool(jnp.all(front[m]))


# ---------------------------------------------------------- triangulation

def test_triangulation_exact(scene):
    """Noise-free two-view DLT must recover landmarks to sub-mm."""
    K = jnp.asarray(scene.K)
    o0 = synthetic.observe_frame(scene, 0, max_keypoints=256)
    o4 = synthetic.observe_frame(scene, 4, max_keypoints=256)
    m01 = synthetic.match_by_landmark_id(o0, o4)
    has = m01 >= 0
    uv0 = jnp.asarray(o0.keypoints)
    uv1 = jnp.asarray(o4.keypoints[m01.clip(0)])
    res = triangulation.triangulate(
        K, jnp.asarray(scene.poses_R[0], jnp.float32),
        jnp.asarray(scene.poses_t[0], jnp.float32),
        jnp.asarray(scene.poses_R[4], jnp.float32),
        jnp.asarray(scene.poses_t[4], jnp.float32),
        uv0, uv1, mask=jnp.asarray(has & o0.valid),
        max_depth=150.0, max_reproj_px=0.5)
    v = np.asarray(res.valid)
    assert v.sum() > 50
    gt = scene.landmarks[o0.landmark_ids[v]]
    err = np.linalg.norm(np.asarray(res.points)[v] - gt, axis=1)
    rel = err / np.linalg.norm(gt, axis=1)
    assert np.median(rel) < 1e-3


def test_triangulation_filters_behind_camera(scene):
    """Points behind either camera must be masked invalid."""
    K = jnp.asarray(scene.K)
    uv0 = jnp.asarray([[160.0, 120.0]] * 4)
    uv1 = jnp.asarray([[160.0, 120.0]] * 4)
    # Two cameras facing AWAY from each other: nothing can be in front of both
    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)
    R1 = jnp.asarray(se3.exp_so3(jnp.asarray([0.0, np.pi, 0.0], jnp.float32)))
    t1 = jnp.asarray([0.0, 0.0, -5.0], jnp.float32)
    res = triangulation.triangulate(K, R0, t0, R1, t1, uv0, uv1,
                                    mask=jnp.ones(4, bool))
    assert not bool(jnp.any(res.valid))


# --------------------------------------------------------------- essential

def test_essential_recovers_pose(scene):
    K = jnp.asarray(scene.K)
    o0 = synthetic.observe_frame(scene, 0, max_keypoints=256)
    o1 = synthetic.observe_frame(scene, 1, max_keypoints=256)
    m01 = synthetic.match_by_landmark_id(o0, o1)
    has = (m01 >= 0) & o0.valid
    # Corrupt 25% of the matches to exercise RANSAC
    rng = np.random.default_rng(7)
    uv1 = o1.keypoints[m01.clip(0)].copy()
    bad = rng.random(len(uv1)) < 0.25
    uv1[bad] += rng.uniform(30, 90, size=(bad.sum(), 2))

    res = essential.estimate_essential(
        K, jnp.asarray(o0.keypoints), jnp.asarray(uv1),
        jnp.asarray(has), jax.random.PRNGKey(0),
        threshold_px=0.75, num_hypotheses=256)
    assert bool(res.ok)

    # Ground-truth relative pose cam0 -> cam1
    R_rel = scene.poses_R[1] @ scene.poses_R[0].T
    t_rel = scene.poses_t[1] - R_rel @ scene.poses_t[0]
    t_rel = t_rel / np.linalg.norm(t_rel)

    rot_err = float(se3.rotation_angle_deg(
        jnp.asarray(R_rel, jnp.float32).T @ res.R))
    t_err = float(se3.translation_direction_angle_deg(
        res.t, jnp.asarray(t_rel, jnp.float32)))
    assert rot_err < 0.5, rot_err
    assert t_err < 2.0, t_err
    # Inliers should be mostly the uncorrupted matches
    inl = np.asarray(res.inliers)
    assert inl[~bad & has].mean() > 0.9
    assert inl[bad & has].mean() < 0.1


def test_essential_scale_adjust():
    t = jnp.asarray([0.0, 0.0, 2.0], jnp.float32)
    out = essential.adjust_translation_magnitude(
        t, jnp.zeros(3, jnp.float32), jnp.asarray([3.0, 0.0, 0.0], jnp.float32))
    assert float(jnp.linalg.norm(out)) == pytest.approx(3.0, rel=1e-5)


# --------------------------------------------------------------------- PnP

def test_pnp_ransac(scene):
    K = jnp.asarray(scene.K)
    obs = synthetic.observe_frame(scene, 3, max_keypoints=256)
    pts = scene.landmarks[obs.landmark_ids.clip(0)].astype(np.float32)
    uv = obs.keypoints.copy()
    rng = np.random.default_rng(11)
    bad = rng.random(len(uv)) < 0.3
    uv[bad] += rng.uniform(25, 80, size=(bad.sum(), 2)).astype(np.float32)

    res = pnp.solve_pnp_ransac(K, jnp.asarray(pts), jnp.asarray(uv),
                               jnp.asarray(obs.valid), jax.random.PRNGKey(1),
                               threshold_px=2.0, num_hypotheses=256)
    assert bool(res.ok)
    rot_err = float(se3.rotation_angle_deg(
        jnp.asarray(scene.poses_R[3], jnp.float32).T @ res.R))
    t_err = float(jnp.linalg.norm(
        res.t - jnp.asarray(scene.poses_t[3], jnp.float32)))
    assert rot_err < 0.2, rot_err
    assert t_err < 0.05, t_err


# --------------------------------------------------------------- pose-only BA

def test_pose_only_ba_converges(scene):
    K = jnp.asarray(scene.K)
    obs = synthetic.observe_frame(scene, 5, max_keypoints=256, noise_px=0.2,
                                  seed=5)
    pts = jnp.asarray(scene.landmarks[obs.landmark_ids.clip(0)], jnp.float32)
    R_gt = jnp.asarray(scene.poses_R[5], jnp.float32)
    t_gt = jnp.asarray(scene.poses_t[5], jnp.float32)
    # Perturb the pose
    dR = se3.exp_so3(jnp.asarray([0.01, -0.02, 0.015], jnp.float32))
    R0 = dR @ R_gt
    t0 = t_gt + jnp.asarray([0.05, -0.04, 0.08], jnp.float32)

    res = pose_ba.pose_only_ba(K, R0, t0, pts, jnp.asarray(obs.keypoints),
                               jnp.asarray(obs.valid), iters=20)
    rot_err = float(se3.rotation_angle_deg(R_gt.T @ res.R))
    t_err = float(jnp.linalg.norm(res.t - t_gt))
    assert rot_err < 0.05, rot_err
    assert t_err < 0.02, t_err


def test_pose_only_ba_multi_matches_vmap(scene):
    """The shared-while_loop multi-start solve (frontend hot path) must
    reproduce vmap(pose_only_ba) over the same starts — the early exit may
    only skip iterations in which every lane is already frozen."""
    K = jnp.asarray(scene.K)
    obs = synthetic.observe_frame(scene, 5, max_keypoints=256, noise_px=0.3,
                                  seed=9)
    pts = jnp.asarray(scene.landmarks[obs.landmark_ids.clip(0)], jnp.float32)
    R_gt = jnp.asarray(scene.poses_R[5], jnp.float32)
    t_gt = jnp.asarray(scene.poses_t[5], jnp.float32)
    starts_R = jnp.stack([
        se3.exp_so3(jnp.asarray([0.01, -0.02, 0.015])) @ R_gt,
        R_gt,
        se3.exp_so3(jnp.asarray([-0.03, 0.01, 0.0])) @ R_gt])
    starts_t = jnp.stack([
        t_gt + jnp.asarray([0.05, -0.04, 0.08]),
        t_gt,
        t_gt + jnp.asarray([-0.1, 0.0, 0.05])])
    uv = jnp.asarray(obs.keypoints)
    valid = jnp.asarray(obs.valid)
    ref = jax.vmap(lambda R0, t0: pose_ba.pose_only_ba(
        K, R0, t0, pts, uv, valid, iters=25,
        coarse_iters=2))(starts_R, starts_t)
    got = pose_ba.pose_only_ba_multi(K, starts_R, starts_t, pts, uv, valid,
                                     iters=25, coarse_iters=2)
    np.testing.assert_allclose(np.asarray(got.R), np.asarray(ref.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.final_cost),
                               np.asarray(ref.final_cost), rtol=1e-5)


def test_pose_only_ba_robust_to_outliers(scene):
    """Cauchy loss must suppress gross outliers (reference Cauchy(1.0))."""
    K = jnp.asarray(scene.K)
    obs = synthetic.observe_frame(scene, 2, max_keypoints=256)
    pts = jnp.asarray(scene.landmarks[obs.landmark_ids.clip(0)], jnp.float32)
    uv = obs.keypoints.copy()
    rng = np.random.default_rng(13)
    bad = rng.random(len(uv)) < 0.2
    uv[bad] += rng.uniform(40, 120, size=(bad.sum(), 2)).astype(np.float32)
    R_gt = jnp.asarray(scene.poses_R[2], jnp.float32)
    t_gt = jnp.asarray(scene.poses_t[2], jnp.float32)
    dR = se3.exp_so3(jnp.asarray([0.008, 0.01, -0.006], jnp.float32))
    res = pose_ba.pose_only_ba(K, dR @ R_gt,
                               t_gt + jnp.asarray([0.03, 0.02, -0.05]),
                               pts, jnp.asarray(uv), jnp.asarray(obs.valid),
                               iters=30)
    rot_err = float(se3.rotation_angle_deg(R_gt.T @ res.R))
    t_err = float(jnp.linalg.norm(res.t - t_gt))
    assert rot_err < 0.1, rot_err
    assert t_err < 0.05, t_err
