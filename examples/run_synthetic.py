"""Demo: full SLAM pipeline on a synthetic KITTI-like sequence.

Usage:  python examples/run_synthetic.py [--frames N] [--noise PX] [--no-ba]

Runs bootstrap + per-frame tracking + sliding-window BA with the oracle
front-end (projected landmarks with descriptor identities) and reports
per-frame GT errors, ATE-RMSE, and map statistics — the programmatic
equivalent of the reference's printed GT diagnostics
(/root/reference/src/threading/thread_pool.cpp:278-295).
"""

import argparse
import time

import numpy as np

from gl_slam_tpu import metrics
from gl_slam_tpu.config import (BAConfig, FrontendConfig, GeometryConfig,
                                MapConfig, SLAMConfig)
from gl_slam_tpu.io import synthetic
from gl_slam_tpu.slam.pipeline import TrackingPipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--noise", type=float, default=0.2)
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--kpts", type=int, default=256)
    args = ap.parse_args()

    H, W, D = 240, 320, 64
    # Geometric gates scale with the injected detection noise: the
    # reference-parity thresholds (0.5/0.1 px) assume its sub-pixel-refined
    # front-end; feeding noisier detections through them starves
    # triangulation and kills tracking rather than degrading it.
    nz = max(args.noise, 0.25)
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=H, image_width=W,
                                max_keypoints=args.kpts, descriptor_dim=D),
        geometry=GeometryConfig(essential_hypotheses=128,
                                essential_threshold_px=max(0.5, nz),
                                triangulation_reproj_px=2.0 * nz,
                                triangulation_reproj_bootstrap_px=2.0 * nz,
                                min_parallax_deg=0.5),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_iters=15, pose_only_iters=15),
        map=MapConfig(max_keyframes=max(64, args.frames + 2),
                      max_points=16384, covis_max_points=256,
                      covis_edge_threshold=10),
    )
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=args.frames,
                                 height=H, width=W, desc_dim=D, seed=7)
    obs = [synthetic.observe_frame(scene, i, max_keypoints=args.kpts,
                                   noise_px=args.noise, seed=11)
           for i in range(args.frames)]

    pipe = TrackingPipeline(cfg, scene.K, enable_ba=not args.no_ba)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    t_start = time.time()
    pipe.bootstrap((obs[0].keypoints, obs[0].descriptors, obs[0].valid, 0),
                   (obs[1].keypoints, obs[1].descriptors, obs[1].valid, 1),
                   gt_scale=float(np.linalg.norm(c1 - c0)))
    for i in range(2, args.frames):
        pipe.step(obs[i].keypoints, obs[i].descriptors, obs[i].valid, i)
    pipe.block()
    elapsed = time.time() - t_start

    R, t, fidx = pipe.trajectory()
    errs = metrics.per_frame_pose_errors(R, t, scene.poses_R[:len(R)],
                                         scene.poses_t[:len(R)])
    print(f"{'frame':>5} {'rot(deg)':>9} {'t-dir(deg)':>10} {'t-mag(m)':>9}"
          f" {'matches':>8} {'map':>6} {'new':>5}")
    for i in range(len(R)):
        # keyframe 0 has no tracking output; outputs[k] covers keyframe k+1
        o = pipe.outputs[i - 1] if i >= 1 else None
        cols = (f"{int(o.num_matches):>8} {int(o.num_map_matches):>6} "
                f"{int(o.num_new_points):>5}") if o else f"{'-':>8} {'-':>6} {'-':>5}"
        print(f"{int(fidx[i]):>5} {errs.rot_deg[i]:>9.4f} "
              f"{errs.t_dir_deg[i]:>10.4f} {errs.t_mag[i]:>9.4f} " + cols)

    c_est = metrics.camera_centers(R, t)
    c_gt = metrics.camera_centers(scene.poses_R[:len(R)],
                                  scene.poses_t[:len(R)])
    ate = metrics.ate_rmse(c_est, c_gt, align=False)
    stats = pipe.map_stats()
    print(f"\nATE-RMSE (no alignment): {ate:.4f} m over {len(R)} frames")
    print(f"map: {stats}")
    print(f"wall: {elapsed:.1f}s ({len(R) / elapsed:.1f} fps incl. compile)")


if __name__ == "__main__":
    main()
