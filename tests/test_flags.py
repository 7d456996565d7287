"""Flag-behavior tests: every runtime flag must observably change behavior
(VERDICT r1 "dead flags"), plus numerics fixes (log_so3 near pi, NMS plateau
tie-breaking)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gl_slam_tpu.config import RuntimeConfig
from gl_slam_tpu.geometry import se3
from gl_slam_tpu.ops import nms as nms_ops

from test_tracking import run_pipeline  # noqa: F401


# Flag tests only need OBSERVABLE behavior changes, not accuracy — tiny
# shapes keep the per-config jit compiles (the dominant cost) fast.
def make_cfg():
    from gl_slam_tpu.config import (BAConfig, FrontendConfig, GeometryConfig,
                                    MapConfig, SLAMConfig)
    return SLAMConfig(
        frontend=FrontendConfig(image_height=120, image_width=160,
                                max_keypoints=96, descriptor_dim=32),
        geometry=GeometryConfig(essential_hypotheses=64,
                                essential_refine_iters=3,
                                triangulation_reproj_px=0.5),
        ba=BAConfig(max_window_cameras=8, max_window_points=512,
                    full_ba_iters=8, pose_only_iters=8),
        map=MapConfig(max_keyframes=32, max_points=2048,
                      covis_max_points=128, covis_edge_threshold=10),
    )


@pytest.fixture(scope="module")
def scene():
    from gl_slam_tpu.io import synthetic
    return synthetic.make_scene(num_landmarks=1200, num_frames=12,
                                height=120, width=160, desc_dim=32, seed=42)


# ---------------------------------------------------------------- log_so3

def test_log_so3_near_pi():
    # Rotations within 1e-3 of pi must round-trip; the naive formula's
    # antisymmetric part vanishes there (ADVICE r1).
    rng = np.random.default_rng(3)
    for _ in range(10):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        for theta in (np.pi - 1e-3, np.pi - 1e-5, np.pi):
            w = jnp.asarray(axis * theta, jnp.float32)
            R = se3.exp_so3(w)
            w_back = se3.log_so3(R)
            R_back = se3.exp_so3(w_back)
            # Compare rotations (w and -w are the same rotation at pi)
            err = float(jnp.abs(R_back - R).max())
            assert err < 5e-3, (theta, err)


def test_log_so3_mid_range_unchanged():
    rng = np.random.default_rng(4)
    for _ in range(10):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        theta = rng.uniform(0.1, np.pi - 0.1)
        w = jnp.asarray(axis * theta, jnp.float32)
        R = se3.exp_so3(w)
        np.testing.assert_allclose(np.asarray(se3.log_so3(R)),
                                   np.asarray(w), atol=1e-4)


# ---------------------------------------------------------------- NMS ties

def test_nms_plateau_bounded():
    # A saturated plateau must yield at most one survivor per NMS window
    # (ADVICE r1: ties previously all survived and overflowed the per-row
    # top-K budget).
    H, W, r = 32, 64, 4
    heat = np.zeros((1, H, W), np.float32)
    heat[0, 8:16, 8:40] = 0.5                     # 8x32 plateau
    supp = np.asarray(nms_ops._nms_xla(jnp.asarray(heat), r))
    survivors = np.argwhere(supp[0] > 0)
    assert len(survivors) >= 1
    # Survivors pairwise Chebyshev-separated by > r
    for i in range(len(survivors)):
        for j in range(i + 1, len(survivors)):
            assert np.abs(survivors[i] - survivors[j]).max() > r
    # Pallas path (interpret mode on CPU) matches
    supp_p = np.asarray(nms_ops._nms_pallas(jnp.asarray(heat), r,
                                            interpret=True))
    np.testing.assert_array_equal(supp_p, supp)


def test_nms_strict_maxima_unchanged():
    rng = np.random.default_rng(0)
    heat = jnp.asarray(rng.random((2, 48, 64)).astype(np.float32))
    supp = np.asarray(nms_ops._nms_xla(heat, 2))
    # Every survivor is the strict max of its window
    for b in range(2):
        ys, xs = np.nonzero(supp[b])
        h = np.asarray(heat[b])
        for y, x in zip(ys, xs):
            win = h[max(0, y - 2):y + 3, max(0, x - 2):x + 3]
            assert h[y, x] == win.max()


# ---------------------------------------------------------------- flags

def test_run_pose_ba_flag_changes_pose(scene):  # noqa: F811
    cfg_on = make_cfg()
    cfg_off = dataclasses.replace(
        cfg_on, runtime=RuntimeConfig(run_pose_ba=False))
    p_on = run_pipeline(scene, cfg_on, 6, noise_px=0.5, enable_ba=False)
    p_off = run_pipeline(scene, cfg_off, 6, noise_px=0.5, enable_ba=False)
    t_on = np.asarray(p_on.state.t_cur)
    t_off = np.asarray(p_off.state.t_cur)
    # Without the pose-only LM polish the chained pose must differ
    assert not np.allclose(t_on, t_off, atol=1e-6)
    # And pose_cost is only reported when the LM runs
    assert float(p_off.outputs[-1].pose_cost) == 0.0
    assert float(p_on.outputs[-1].pose_cost) > 0.0


def test_run_full_ba_flag_gates_backend(scene):  # noqa: F811
    cfg = dataclasses.replace(
        make_cfg(), runtime=RuntimeConfig(run_full_ba=False,
                                          ba_trigger_keyframes=3))
    p = run_pipeline(scene, cfg, 10, enable_ba=True)
    assert p.map_stats()["num_ba_runs"] == 0
    cfg2 = dataclasses.replace(
        make_cfg(), runtime=RuntimeConfig(run_full_ba=True,
                                          ba_trigger_keyframes=3))
    p2 = run_pipeline(scene, cfg2, 10, enable_ba=True)
    assert p2.map_stats()["num_ba_runs"] >= 1


def test_pose_accept_gate_flag(scene):  # noqa: F811
    # Default inf = gate OFF (reference parity — thresholds are backend-
    # sensitive, so a finite default silently dropped frames on CPU,
    # VERDICT r1 failure 1a). An impossible finite threshold must reject
    # every steady-state frame.
    cfg_off = make_cfg()
    assert cfg_off.runtime.pose_accept_mean_cost == float("inf")
    p = run_pipeline(scene, cfg_off, 6, noise_px=0.5, enable_ba=False)
    assert p.map_stats()["num_keyframes"] == 6
    # With soft_reject_fallback (default, reference parity) an impossible
    # threshold demotes every steady-state frame to the odometry-fallback
    # pose but still inserts it (the reference inserts every frame,
    # thread_pool.cpp:237)...
    cfg_gate = dataclasses.replace(
        cfg_off, runtime=RuntimeConfig(pose_accept_mean_cost=0.0))
    p2 = run_pipeline(scene, cfg_gate, 6, noise_px=0.5, enable_ba=False)
    assert p2.map_stats()["num_keyframes"] == 6
    # ...and with the fallback disabled it must reject every one.
    cfg_hard = dataclasses.replace(
        cfg_off, runtime=RuntimeConfig(pose_accept_mean_cost=0.0,
                                       soft_reject_fallback=False))
    p3 = run_pipeline(scene, cfg_hard, 6, noise_px=0.5, enable_ba=False)
    assert p3.map_stats()["num_keyframes"] == 2  # only the bootstrap pair


def test_every_frame_keyframe_flag(scene):  # noqa: F811
    # With the skip=false override disabled and an absurdly high motion
    # filter, no steady-state frame passes the keyframe gate.
    cfg = dataclasses.replace(
        make_cfg(), runtime=RuntimeConfig(every_frame_keyframe=False,
                                          gt_mag_filter=1e6,
                                          gt_rot_filter=1e6))
    p = run_pipeline(scene, cfg, 6, enable_ba=False)
    assert p.map_stats()["num_keyframes"] == 2   # only the bootstrap pair
    cfg2 = dataclasses.replace(
        make_cfg(), runtime=RuntimeConfig(every_frame_keyframe=False,
                                          gt_mag_filter=1e-6,
                                          gt_rot_filter=1e-6))
    p2 = run_pipeline(scene, cfg2, 6, enable_ba=False)
    assert p2.map_stats()["num_keyframes"] == 6  # real motion passes
