"""Async BA (C4) + rigid-delta reconciliation (C17): tracking proceeds while
a BA computed on a map snapshot is in flight; the result merges via the
anchor keyframe's rigid delta (reference `post_ba_map_update_for_new_
keyframes` slam_core.cpp:916-973 + condvar handoff thread_pool.cpp:334-349).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from gl_slam_tpu.config import RuntimeConfig
from gl_slam_tpu import metrics
from gl_slam_tpu.slam import ba as ba_mod

from test_tracking import make_cfg, run_pipeline, scene  # noqa: F401


def _ate(pipe, scene, n):  # noqa: F811
    R, t, fidx = pipe.trajectory()
    c_est = metrics.camera_centers(R, t)
    c_gt = metrics.camera_centers(scene.poses_R[:n], scene.poses_t[:n])
    return metrics.ate_rmse(c_est, c_gt, align=False)


def test_async_ba_tracks_during_flight(scene):  # noqa: F811
    cfg = dataclasses.replace(
        make_cfg(), runtime=RuntimeConfig(async_ba=True,
                                          ba_trigger_keyframes=4))
    pipe = run_pipeline(scene, cfg, 14, noise_px=0.25, enable_ba=True)
    # A BA was dispatched async and tracking continued: keyframes were
    # inserted after the snapshot count of the in-flight BA.
    assert pipe.map_stats()["num_ba_runs"] >= 2
    assert pipe.map_stats()["num_keyframes"] == 14
    assert _ate(pipe, scene, 14) < 0.15


def test_async_matches_sync_quality(scene):  # noqa: F811
    base = make_cfg()
    cfg_a = dataclasses.replace(
        base, runtime=RuntimeConfig(async_ba=True, ba_trigger_keyframes=4))
    cfg_s = dataclasses.replace(
        base, runtime=RuntimeConfig(async_ba=False, ba_trigger_keyframes=4))
    p_a = run_pipeline(scene, cfg_a, 14, noise_px=0.25, enable_ba=True)
    p_s = run_pipeline(scene, cfg_s, 14, noise_px=0.25, enable_ba=True)
    ate_a, ate_s = _ate(p_a, scene, 14), _ate(p_s, scene, 14)
    # The deferred reconciliation may lag one window but must stay in the
    # same quality class as the synchronous write-back.
    assert ate_a < max(2.0 * ate_s, 0.15), (ate_a, ate_s)


def test_reconcile_consistency(scene):  # noqa: F811
    """Post-reconcile map must be projectively consistent: mean reprojection
    of good points over their observations stays bounded."""
    cfg = dataclasses.replace(
        make_cfg(), runtime=RuntimeConfig(async_ba=True,
                                          ba_trigger_keyframes=4))
    pipe = run_pipeline(scene, cfg, 14, noise_px=0.25, enable_ba=True)
    pipe.finish()
    m = pipe.state.map
    K = np.asarray(scene.K, np.float32)
    n_pts = int(m.num_pts)
    good = np.asarray(m.pts_valid[:n_pts]) & ~np.asarray(m.pts_bad[:n_pts])
    X = np.asarray(m.pts_xyz[:n_pts])
    obs_kf = np.asarray(m.pts_obs_kf[:n_pts])
    obs_kp = np.asarray(m.pts_obs_kp[:n_pts])
    kf_R = np.asarray(m.kf_R)
    kf_t = np.asarray(m.kf_t)
    kf_kpts = np.asarray(m.kf_kpts)
    errs = []
    for p in range(0, n_pts, 5):
        if not good[p]:
            continue
        for o in range(obs_kf.shape[1]):
            k = obs_kf[p, o]
            if k < 0:
                continue
            pc = kf_R[k] @ X[p] + kf_t[k]
            if pc[2] <= 0:
                continue
            u = K[0, 0] * pc[0] / pc[2] + K[0, 2]
            v = K[1, 1] * pc[1] / pc[2] + K[1, 2]
            uv = kf_kpts[k, obs_kp[p, o]]
            errs.append(np.hypot(u - uv[0], v - uv[1]))
    assert np.mean(errs) < 1.5, np.mean(errs)


def test_health_check_recovers_from_nan(scene):  # noqa: F811
    """Failure recovery (SURVEY 5.3): a non-finite pose rolls the pipeline
    back to the last healthy snapshot at the next BA-trigger sync point."""
    import jax.numpy as jnp
    cfg = dataclasses.replace(
        make_cfg(), runtime=RuntimeConfig(ba_trigger_keyframes=3))
    pipe = run_pipeline(scene, cfg, 8, noise_px=0.2, enable_ba=True)
    assert pipe._last_good is not None
    snapshot_t = np.asarray(pipe._last_good.t_cur)
    # Poison the pose
    pipe.state = pipe.state._replace(
        t_cur=jnp.full((3,), jnp.nan, jnp.float32))
    pipe._steps_since_check = cfg.runtime.ba_trigger_keyframes
    pipe._maybe_ba()
    assert pipe.num_recoveries == 1
    assert np.isfinite(np.asarray(pipe.state.t_cur)).all()
    np.testing.assert_allclose(np.asarray(pipe.state.t_cur), snapshot_t)
