"""Tests for loop closing: matrix-free GN/CG optimizer, pose-graph solve on
a synthetic drifted loop, detection against old map points, and the map
correction transform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gl_slam_tpu.geometry import se3
from gl_slam_tpu.ops import optim
from gl_slam_tpu.slam import loopclose


def test_gauss_newton_cg_quadratic():
    """GN/CG must solve a linear least-squares problem exactly."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(20, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))

    def res(p):
        return A @ p - b

    p, cost = optim.gauss_newton_cg(res, jnp.zeros(6), gn_iters=3,
                                    cg_iters=12, step_clip=100.0)
    p_ref = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-3)


def _circle_trajectory(C, radius=10.0):
    """Ground-truth loop: camera travels a full circle."""
    angles = np.linspace(0, 2 * np.pi, C, endpoint=False)
    R = np.zeros((C, 3, 3))
    t = np.zeros((C, 3))
    for k, a in enumerate(angles):
        c, s = np.cos(a), np.sin(a)
        Rwc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        center = np.array([radius * np.sin(a), 0.0, radius * (1 - np.cos(a))])
        R[k] = Rwc.T
        t[k] = -R[k] @ center
    return R.astype(np.float32), t.astype(np.float32)


def test_pose_graph_corrects_drift():
    """Odometry edges from GT + accumulated drift in the estimates + one
    loop edge -> optimization must pull the trajectory back to GT."""
    C = 40
    R_gt, t_gt = _circle_trajectory(C)
    # Relative GT measurements
    Zr = np.einsum('eij,ekj->eik', R_gt[1:], R_gt[:-1])
    Zt = t_gt[1:] - np.einsum('eij,ej->ei', Zr, t_gt[:-1])

    # Build drifted estimates by integrating noisy odometry
    rng = np.random.default_rng(3)
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    for e in range(C - 1):
        dR = np.asarray(se3.exp_so3(jnp.asarray(
            rng.normal(scale=0.004, size=3).astype(np.float32))))
        R_est.append(dR @ Zr[e] @ R_est[-1])
        t_est.append(dR @ (Zr[e] @ t_est[-1] + Zt[e])
                     + rng.normal(scale=0.01, size=3).astype(np.float32))
    R_est = np.stack(R_est)
    t_est = np.stack(t_est)

    # Edges: odometry (GT relative) + loop edge last->first (GT relative)
    ei = np.arange(C - 1, dtype=np.int32)
    ej = ei + 1
    Zr_loop = R_gt[-1] @ R_gt[0].T
    # measurement of edge 0 -> C-1
    Zt_loop = t_gt[-1] - Zr_loop @ t_gt[0]
    edge_i = jnp.asarray(np.concatenate([ei, [0]]).astype(np.int32))
    edge_j = jnp.asarray(np.concatenate([ej, [C - 1]]).astype(np.int32))
    edge_Zr = jnp.asarray(np.concatenate([Zr, Zr_loop[None]]))
    edge_Zt = jnp.asarray(np.concatenate([Zt, Zt_loop[None]]))
    edge_w = jnp.asarray(np.concatenate([np.ones(C - 1), [4.0]]),
                         jnp.float32)
    fixed = jnp.zeros((C,), bool).at[0].set(True)

    drift_before = np.linalg.norm(t_est[-1] - t_gt[-1])
    Rn, tn, cost = loopclose.optimize_pose_graph(
        jnp.asarray(R_est), jnp.asarray(t_est), edge_i, edge_j, edge_Zr,
        edge_Zt, edge_w, fixed, gn_iters=10, cg_iters=80)
    drift_after = np.linalg.norm(np.asarray(tn)[-1] - t_gt[-1])
    assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
    # Rotations stay valid
    RtR = np.einsum('cij,cik->cjk', np.asarray(Rn), np.asarray(Rn))
    assert np.abs(RtR - np.eye(3)).max() < 1e-4


def test_detect_loop_and_correction():
    """Full loop-closure path on the synthetic tracker state."""
    from gl_slam_tpu.config import (BAConfig, FrontendConfig, GeometryConfig,
                                    MapConfig, SLAMConfig)
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam import frontend
    from gl_slam_tpu.slam.pipeline import TrackingPipeline

    H, W, N, D = 240, 320, 256, 64
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D),
        geometry=GeometryConfig(essential_hypotheses=128,
                                triangulation_reproj_px=0.5),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_iters=10, pose_only_iters=15),
        map=MapConfig(max_keyframes=64, max_points=8192,
                      covis_max_points=256, covis_edge_threshold=10),
    )
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=10,
                                 height=H, width=W, desc_dim=D, seed=42)
    obs = [synthetic.observe_frame(scene, i, max_keypoints=N, seed=9)
           for i in range(10)]
    pipe = TrackingPipeline(cfg, scene.K, enable_ba=False)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap((obs[0].keypoints, obs[0].descriptors, obs[0].valid, 0),
                   (obs[1].keypoints, obs[1].descriptors, obs[1].valid, 1),
                   gt_scale=float(np.linalg.norm(c1 - c0)))
    for i in range(2, 10):
        pipe.step(obs[i].keypoints, obs[i].descriptors, obs[i].valid, i)
    pipe.block()

    # "Revisit" frame 1: detect against points older than min_gap
    f = frontend.FrameFeatures(
        kpts=jnp.asarray(obs[1].keypoints),
        desc=jnp.asarray(obs[1].descriptors),
        valid=jnp.asarray(obs[1].valid),
        frame_idx=jnp.asarray(10, jnp.int32))
    det = loopclose.detect_loop(cfg, jnp.asarray(scene.K, jnp.float32),
                                pipe.state.map, f, jax.random.PRNGKey(5),
                                min_gap=5, max_candidates=4096,
                                min_inliers=20)
    assert bool(det.ok), int(det.num_inliers)
    # Pose must match frame 1's GT pose
    rot_err = float(se3.rotation_angle_deg(
        jnp.asarray(scene.poses_R[1], jnp.float32).T @ det.R))
    t_err = float(jnp.linalg.norm(
        det.t - jnp.asarray(scene.poses_t[1], jnp.float32)))
    assert rot_err < 0.3, rot_err
    assert t_err < 0.1, t_err

    # Map correction keeps reprojection consistency: shift all poses by a
    # rigid transform and verify points follow.
    m = pipe.state.map
    dR = jnp.asarray(np.asarray(se3.exp_so3(
        jnp.asarray([0.0, 0.05, 0.0], jnp.float32))))
    new_R = jnp.einsum('kij,jl->kil', m.kf_R, dR.T)
    new_t = m.kf_t
    m2 = loopclose.apply_pose_graph_correction(m, new_R, new_t)
    # A point's camera-frame coordinates in its anchor keyframe are invariant
    p = 5
    a = int(m.pts_first_kf[p])
    before = np.asarray(m.kf_R[a] @ m.pts_xyz[p] + m.kf_t[a])
    after = np.asarray(m2.kf_R[a] @ m2.pts_xyz[p] + m2.kf_t[a])
    np.testing.assert_allclose(after, before, atol=1e-4)


def test_loop_closure_out_of_window():
    """A loop whose revisited keyframe is OLDER than the pose-graph window
    must still enforce the absolute target pose on the last keyframe (the
    edge re-anchors to the gauge-fixed node 0 of the window)."""
    from gl_slam_tpu.config import (BAConfig, FrontendConfig, GeometryConfig,
                                    MapConfig, SLAMConfig)
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam.pipeline import TrackingPipeline

    H, W, N, D = 240, 320, 256, 64
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D),
        geometry=GeometryConfig(essential_hypotheses=128,
                                triangulation_reproj_px=0.5),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_iters=10, pose_only_iters=15),
        map=MapConfig(max_keyframes=64, max_points=8192,
                      covis_max_points=256, covis_edge_threshold=10),
    )
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=14,
                                 height=H, width=W, desc_dim=D, seed=42)
    obs = [synthetic.observe_frame(scene, i, max_keypoints=N, seed=9,
                                   noise_px=0.3)
           for i in range(14)]
    pipe = TrackingPipeline(cfg, scene.K, enable_ba=False)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap((obs[0].keypoints, obs[0].descriptors, obs[0].valid, 0),
                   (obs[1].keypoints, obs[1].descriptors, obs[1].valid, 1),
                   gt_scale=float(np.linalg.norm(c1 - c0)))
    for i in range(2, 14):
        pipe.step(obs[i].keypoints, obs[i].descriptors, obs[i].valid, i)
    pipe.block()

    # Fabricate a verified detection: revisited keyframe 1 (well outside a
    # 6-kf pose-graph window), absolute target = GT pose of the last frame.
    det = loopclose.LoopDetection(
        ok=jnp.asarray(True),
        loop_kf=jnp.asarray(1, jnp.int32),
        R=jnp.asarray(scene.poses_R[13], jnp.float32),
        t=jnp.asarray(scene.poses_t[13], jnp.float32),
        num_inliers=jnp.asarray(100, jnp.int32))
    before = np.linalg.norm(
        np.asarray(pipe.state.map.kf_t[13]) - scene.poses_t[13])
    new_state = loopclose.close_loop(cfg, jnp.asarray(scene.K, jnp.float32),
                                     pipe.state, det, max_graph_kf=6)
    after = np.linalg.norm(
        np.asarray(new_state.map.kf_t[13]) - scene.poses_t[13])
    # The last keyframe must be pulled toward the measured absolute pose
    assert after < max(0.5 * before, 0.02), (before, after)
    # Pre-window keyframes untouched
    np.testing.assert_allclose(np.asarray(new_state.map.kf_t[1]),
                               np.asarray(pipe.state.map.kf_t[1]))


def test_loopclose_eval_bounds():
    """Committed chunked-path loop-closure A/B evidence (VERDICT r2 item 5):
    scripts/eval_loopclose.py tracks a closed-circle revisit trajectory
    through the SAME fused chunked driver bench uses, loop closing OFF vs
    ON, and commits LOOPCLOSE_EVAL.json. These bounds assert that at least
    one closure fired on the revisit and that it reduced the final ATE."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..",
                        "LOOPCLOSE_EVAL.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("no committed loop-closure eval "
                    "(run scripts/eval_loopclose.py on TPU)")
    rep = json.load(open(path))
    assert rep["loop_off"]["frames"] >= 300, rep
    assert rep["loop_on"]["loop_closures"] >= 1, rep
    assert rep["loop_off"]["loop_closures"] == 0, rep
    assert (rep["loop_on"]["ate_rmse_m"]
            < rep["loop_off"]["ate_rmse_m"]), rep


def test_detect_loop_db_path():
    """Keyframe-database detection (round-5 redesign): insert_keyframe must
    populate the per-keyframe feature db (kf_db_*), and detect_loop with a
    matcher + current-pose estimate must retrieve a pose-proximate OLD
    keyframe, frame-pair match against its stored features, and PnP-verify
    to the revisited frame's GT pose. GT-stable synthetic descriptors stand
    in for the learned matcher (the retrieval/match/verify machinery under
    test is matcher-agnostic)."""
    from gl_slam_tpu.config import (BAConfig, FrontendConfig, GeometryConfig,
                                    MapConfig, SLAMConfig)
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.slam import frontend
    from gl_slam_tpu.slam.pipeline import TrackingPipeline

    H, W, N, D = 240, 320, 256, 64
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D),
        geometry=GeometryConfig(essential_hypotheses=128,
                                triangulation_reproj_px=0.5),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_iters=10, pose_only_iters=15),
        map=MapConfig(max_keyframes=64, max_points=8192,
                      covis_max_points=256, covis_edge_threshold=10,
                      loop_db_keypoints=128),
    )
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=10,
                                 height=H, width=W, desc_dim=D, seed=42)
    obs = [synthetic.observe_frame(scene, i, max_keypoints=N, seed=9)
           for i in range(10)]
    pipe = TrackingPipeline(cfg, scene.K, enable_ba=False)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap((obs[0].keypoints, obs[0].descriptors, obs[0].valid, 0),
                   (obs[1].keypoints, obs[1].descriptors, obs[1].valid, 1),
                   gt_scale=float(np.linalg.norm(c1 - c0)))
    for i in range(2, 10):
        pipe.step(obs[i].keypoints, obs[i].descriptors, obs[i].valid, i)
    pipe.block()

    m = pipe.state.map
    # --- db write sanity ---------------------------------------------------
    nkf = int(m.num_kf)
    assert nkf >= 8
    dbv = np.asarray(m.kf_db_valid[:nkf])
    assert dbv.shape[1] == 128
    # kf 0 is inserted at bootstrap BEFORE any 3D points exist (its kp2mp
    # is backfilled by kf 1's insert), so its db is legitimately empty;
    # every later keyframe must store a healthy set.
    assert (dbv[1:].sum(axis=1) > 30).all(), dbv.sum(axis=1)
    # each valid db row's idx points at a keypoint with an associated point,
    # and the xyz snapshot is finite
    for k in (2, nkf - 1):
        idx = np.asarray(m.kf_db_idx[k])
        ok = idx >= 0
        assert (np.asarray(m.kf_kp2mp[k])[idx[ok]] >= 0).all()
        assert np.isfinite(np.asarray(m.kf_db_xyz[k])[ok]).all()

    # --- detection: revisit frame 1 with the current (frame-9) estimate ----
    def nn_matcher(kpts0, desc0, valid0, kpts1, desc1, valid1):
        return match_ops.mutual_nn_match(desc0, valid0, desc1, valid1,
                                         min_score=0.7)

    f = frontend.FrameFeatures(
        kpts=jnp.asarray(obs[1].keypoints),
        desc=jnp.asarray(obs[1].descriptors),
        valid=jnp.asarray(obs[1].valid),
        frame_idx=jnp.asarray(10, jnp.int32))
    # Pretend the tracker believes it is back at frame 1's pose (small
    # drift): retrieval must find an old keyframe near that pose.
    R_cur = jnp.asarray(scene.poses_R[1], jnp.float32)
    t_cur = jnp.asarray(scene.poses_t[1] + 0.3, jnp.float32)
    det = loopclose.detect_loop(cfg, jnp.asarray(scene.K, jnp.float32),
                                pipe.state.map, f, jax.random.PRNGKey(5),
                                min_gap=5, min_inliers=20,
                                matcher=nn_matcher,
                                R_cur=R_cur, t_cur=t_cur)
    assert int(det.n_vis) >= 1          # retrieval found old keyframes
    assert bool(det.ok), (int(det.num_inliers), int(det.n_good))
    assert int(det.loop_kf) < nkf - 5
    rot_err = float(se3.rotation_angle_deg(
        jnp.asarray(scene.poses_R[1], jnp.float32).T @ det.R))
    t_err = float(jnp.linalg.norm(
        det.t - jnp.asarray(scene.poses_t[1], jnp.float32)))
    assert rot_err < 0.5, rot_err
    assert t_err < 0.15, t_err
