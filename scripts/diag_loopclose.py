"""Calibration run for the loop-closure e2e test: track a noisy circular
(oracle-observation) sequence with loop closing on vs off and report ATE +
closure count. Thresholds chosen here back tests/test_loopclose.py."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def run(loop_on: bool, frames: int = 80, noise_px: float = 0.3):
    import dataclasses

    import jax.numpy as jnp

    from gl_slam_tpu.config import (BAConfig, FrontendConfig, GeometryConfig,
                                    MapConfig, RuntimeConfig, SLAMConfig)
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam.pipeline import TrackingPipeline

    H, W, N, D = 240, 320, 384, 64
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=N, descriptor_dim=D),
        geometry=GeometryConfig(essential_hypotheses=128,
                                essential_threshold_px=1.0,
                                triangulation_reproj_px=3.0,
                                triangulation_reproj_bootstrap_px=2.0,
                                max_depth=80.0),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_iters=10, pose_only_iters=15),
        map=MapConfig(max_keyframes=128, max_points=16384,
                      covis_max_points=256, covis_edge_threshold=10),
        runtime=RuntimeConfig(loop_closing=loop_on, loop_check_interval=5,
                              loop_min_gap=20, async_ba=False,
                              ba_trigger_keyframes=5, tracker="pnp"),
    )
    scene = synthetic.make_scene(num_landmarks=1200, num_frames=frames,
                                 height=H, width=W, desc_dim=D, seed=13,
                                 motion="loop")
    obs = [synthetic.observe_frame(scene, i, max_keypoints=N, seed=4,
                                   noise_px=noise_px) for i in range(frames)]
    pipe = TrackingPipeline(cfg, scene.K, enable_ba=True)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap((obs[0].keypoints, obs[0].descriptors, obs[0].valid, 0),
                   (obs[1].keypoints, obs[1].descriptors, obs[1].valid, 1),
                   gt_scale=float(np.linalg.norm(c1 - c0)))
    for i in range(2, frames):
        pipe.step(obs[i].keypoints, obs[i].descriptors, obs[i].valid, i)
    pipe.finish()
    oks = [bool(o.frame_ok) for o in pipe.outputs]
    n3d = [int(o.num_map_matches) for o in pipe.outputs]
    new = [int(o.num_new_points) for o in pipe.outputs]
    print("ok:", "".join("1" if o else "0" for o in oks))
    print("n3d:", n3d[::4])
    print("new:", new[::4])
    R_est, t_est, fidx = pipe.trajectory()
    c_est = np.einsum('kij,kj->ki', R_est.transpose(0, 2, 1), -t_est)
    c_gt = np.stack([-scene.poses_R[i].T @ scene.poses_t[i] for i in fidx])
    ate = float(np.sqrt(((c_est - c_gt) ** 2).sum(1).mean()))
    end_err = float(np.linalg.norm(c_est[-1] - c_gt[-1]))
    return ate, end_err, getattr(pipe, "loop_closures", 0), len(fidx)


if __name__ == "__main__":
    for on in (False, True):
        ate, end_err, ncl, nkf = run(on)
        print(f"loop_closing={on}: ATE={ate:.3f} m end_err={end_err:.3f} m "
              f"closures={ncl} keyframes={nkf}", flush=True)
