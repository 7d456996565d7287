"""Command-line entry point (C2 equivalent).

The reference's `main()` (`/root/reference/src/main.cpp:126-140`) hardcodes
everything and spawns three threads; here `gl-slam-tpu run` drives the host
pipeline over a dataset (KITTI directory, or the built-in synthetic
sequence), with the reference's tuning constants exposed as flags
(SURVEY.md §5.6) and artifacts written to an output directory: KITTI-format
trajectory, metrics JSONL, map JSON, and a top-down trajectory plot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _build_config(args):
    from .config import (BAConfig, FrontendConfig, GeometryConfig, MapConfig,
                         RuntimeConfig, SLAMConfig)
    return SLAMConfig(
        frontend=FrontendConfig(
            image_height=args.height, image_width=args.width,
            max_keypoints=args.kpts, descriptor_dim=args.desc_dim,
            match_threshold=args.match_thr,
            map_match_threshold=args.match_thr),
        geometry=GeometryConfig(
            essential_hypotheses=args.hypotheses,
            essential_threshold_px=args.essential_thr,
            triangulation_reproj_px=args.tri_thr),
        ba=BAConfig(max_window_cameras=16,
                    max_window_points=args.ba_points,
                    full_ba_iters=args.ba_iters,
                    pose_only_iters=args.pose_iters),
        map=MapConfig(max_keyframes=args.max_keyframes,
                      max_points=args.max_points,
                      covis_max_points=min(args.kpts, 2048),
                      covis_edge_threshold=args.covis_thr,
                      cull_enabled=not args.no_cull),
        runtime=RuntimeConfig(use_gt_scale=not args.no_gt_scale,
                              use_gt_motion_gate=not args.no_gt_gate,
                              ba_trigger_keyframes=args.ba_trigger),
    )


def cmd_run(args) -> int:
    import jax.numpy as jnp

    from . import metrics as metrics_mod
    from .checkpoint import export_kitti_trajectory, save_state
    from .slam.pipeline import TrackingPipeline
    from .tracing import MetricsRecorder, StageTimer
    from .viz.viewer import MapSnapshot, render_topdown

    os.makedirs(args.out, exist_ok=True)
    cfg = _build_config(args)

    if args.dataset == "synthetic":
        from .io import synthetic
        scene = synthetic.make_scene(
            num_landmarks=4000, num_frames=args.last_frame + 1,
            height=args.height, width=args.width,
            desc_dim=args.desc_dim, seed=7)
        K = scene.K
        gt_R, gt_t = scene.poses_R, scene.poses_t

        def features(i):
            o = synthetic.observe_frame(scene, i, max_keypoints=args.kpts,
                                        noise_px=args.noise, seed=13)
            return o.keypoints, o.descriptors, o.valid
    else:
        from .io.kitti import KittiSequence
        from .models.classical import HarrisExtractor
        seq = KittiSequence(args.dataset, args.sequence)
        K = seq.K
        gt_R, gt_t = seq.gt_R, seq.gt_t
        ex = HarrisExtractor(args.height, args.width,
                             max_keypoints=args.kpts)

        def features(i):
            img = seq.frame(i)[:args.height, :args.width]
            kpts, scores, desc, valid = ex(jnp.asarray(img[None]))
            return (np.asarray(kpts[0]), np.asarray(desc[0]),
                    np.asarray(valid[0]))

    pipe = TrackingPipeline(cfg, K)
    rec = MetricsRecorder()
    timer = StageTimer()

    first, last = args.first_frame, args.last_frame
    gt_scale = 1.0
    if gt_R is not None and cfg.runtime.use_gt_scale:
        c0 = -gt_R[first].T @ gt_t[first]
        c1 = -gt_R[first + 1].T @ gt_t[first + 1]
        gt_scale = float(np.linalg.norm(c1 - c0))

    t_start = time.time()
    f0, f1 = features(first), features(first + 1)
    with timer.stage("bootstrap"):
        pipe.bootstrap((*f0, first), (*f1, first + 1), gt_scale=gt_scale)
    for i in range(first + 2, last + 1):
        with timer.stage("features"):
            f = features(i)
        with timer.stage("track"):
            out = pipe.step(*f, i)
        rec.record(i, num_matches=out.num_matches,
                   num_map_matches=out.num_map_matches,
                   num_new_points=out.num_new_points)
    pipe.block()
    elapsed = time.time() - t_start

    R, t, fidx = pipe.trajectory()
    export_kitti_trajectory(os.path.join(args.out, "trajectory.txt"), R, t)
    rec.to_jsonl(os.path.join(args.out, "metrics.jsonl"))
    snap = MapSnapshot(pipe.state.map)
    snap.to_json(os.path.join(args.out, "map.json"))

    report = {
        "frames_tracked": int(len(R)),
        "fps_incl_features": round(len(R) / elapsed, 2),
        "map": pipe.map_stats(),
        "stages": timer.summary(),
    }
    if gt_R is not None:
        errs = metrics_mod.per_frame_pose_errors(
            R, t, gt_R[fidx], gt_t[fidx])
        c_est = metrics_mod.camera_centers(R, t)
        c_gt = metrics_mod.camera_centers(gt_R[fidx], gt_t[fidx])
        report["ate_rmse_m"] = round(
            metrics_mod.ate_rmse(c_est, c_gt, align=False), 4)
        report["rot_err_deg_max"] = round(float(errs.rot_deg.max()), 4)
        render_topdown(snap, os.path.join(args.out, "trajectory.png"),
                       gt_centers=c_gt)
    else:
        render_topdown(snap, os.path.join(args.out, "trajectory.png"))

    if args.checkpoint:
        save_state(os.path.join(args.out, "ckpt"), pipe.state)
    print(json.dumps(report, indent=2))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gl-slam-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run SLAM over a sequence")
    run.add_argument("--dataset", default="synthetic",
                     help="'synthetic' or a KITTI odometry root directory")
    run.add_argument("--sequence", default="00")
    run.add_argument("--out", default="out")
    run.add_argument("--first-frame", type=int, default=0)
    run.add_argument("--last-frame", type=int, default=40)
    run.add_argument("--height", type=int, default=240)
    run.add_argument("--width", type=int, default=320)
    run.add_argument("--kpts", type=int, default=512)
    run.add_argument("--desc-dim", type=int, default=64)
    run.add_argument("--noise", type=float, default=0.2)
    run.add_argument("--match-thr", type=float, default=0.7)
    run.add_argument("--essential-thr", type=float, default=0.5)
    run.add_argument("--tri-thr", type=float, default=0.5)
    run.add_argument("--hypotheses", type=int, default=256)
    run.add_argument("--ba-iters", type=int, default=30)
    run.add_argument("--pose-iters", type=int, default=30)
    run.add_argument("--ba-points", type=int, default=4096)
    run.add_argument("--ba-trigger", type=int, default=7)
    run.add_argument("--covis-thr", type=int, default=50)
    run.add_argument("--max-keyframes", type=int, default=256)
    run.add_argument("--max-points", type=int, default=65536)
    run.add_argument("--no-cull", action="store_true")
    run.add_argument("--no-gt-scale", action="store_true")
    run.add_argument("--no-gt-gate", action="store_true")
    run.add_argument("--checkpoint", action="store_true")
    run.set_defaults(fn=cmd_run)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
