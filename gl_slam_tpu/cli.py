"""Command-line entry point (C2 equivalent).

The reference's `main()` (`/root/reference/src/main.cpp:126-140`) hardcodes
everything and spawns three threads; here `gl-slam-tpu run` drives the host
pipeline over a dataset (KITTI directory, or the built-in rendered synthetic
sequence), with the reference's tuning constants exposed as flags
(SURVEY.md §5.6) and artifacts written to an output directory: KITTI-format
trajectory, metrics JSONL, map JSON, and a top-down trajectory plot. The
final report is ONE JSON object carrying ATE-RMSE, fps, and BA count.

Front-ends (--frontend):
  oracle      projected ground-truth keypoints (synthetic dataset only)
  harris      classical Harris + patch descriptors on real images
  superpoint  the learned pipeline: SuperPoint-style extraction + LightGlue
              matching on all three per-frame passes (weights from
              --weights, trained by scripts/train_frontend.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _build_config(args, reobs_matcher: str):
    from .config import (BAConfig, FrontendConfig, GeometryConfig, MapConfig,
                         RuntimeConfig, SLAMConfig)
    return SLAMConfig(
        frontend=FrontendConfig(
            image_height=args.height, image_width=args.width,
            max_keypoints=args.kpts, descriptor_dim=args.desc_dim,
            match_threshold=args.match_thr,
            map_match_threshold=args.match_thr,
            score_threshold=args.score_thr,
            nms_radius=args.nms_radius,
            reobs_matcher=reobs_matcher),
        geometry=GeometryConfig(
            essential_hypotheses=args.hypotheses,
            essential_threshold_px=args.essential_thr,
            triangulation_reproj_px=args.tri_thr,
            triangulation_reproj_bootstrap_px=max(args.tri_thr, 0.5),
            max_depth=args.max_depth),
        ba=BAConfig(max_window_cameras=16,
                    max_window_points=args.ba_points,
                    full_ba_iters=args.ba_iters,
                    pose_only_iters=args.pose_iters,
                    full_ba_overlap=4),
        map=MapConfig(max_keyframes=args.max_keyframes,
                      max_points=args.max_points,
                      covis_max_points=min(args.kpts, 2048),
                      covis_edge_threshold=args.covis_thr,
                      cull_enabled=not args.no_cull),
        runtime=RuntimeConfig(use_gt_scale=not args.no_gt_scale,
                              use_gt_motion_gate=not args.no_gt_gate,
                              ba_trigger_keyframes=args.ba_trigger,
                              async_ba=not args.sync_ba),
    )


def _load_learned_frontend(args):
    """SuperPoint + LightGlue nets with trained weights (tiny/flagship)."""
    import jax
    import jax.numpy as jnp

    from .checkpoint import load_params, params_path
    from .models.lightglue import LightGlueNet
    from .models.superpoint import SuperPointNet
    from .train.e2e import (FLAGSHIP_LG, FLAGSHIP_SP_CHANNELS, TINY_LG,
                            TINY_SP_CHANNELS)

    D = args.desc_dim
    if args.preset == "tiny":
        sp = SuperPointNet(descriptor_dim=D, channels=TINY_SP_CHANNELS)
        lg = LightGlueNet(input_dim=D, **TINY_LG)
    else:
        sp = SuperPointNet(descriptor_dim=D, channels=FLAGSHIP_SP_CHANNELS)
        lg = LightGlueNet(input_dim=D, **FLAGSHIP_LG)
    H8 = args.height + (-args.height) % 8
    W8 = args.width + (-args.width) % 8
    sp_like = sp.init(jax.random.PRNGKey(0), jnp.zeros((1, H8, W8, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_like = lg.init(jax.random.PRNGKey(0), d8, d8, k8, k8, m8, m8)
    sp_params = load_params(params_path(args.weights,
                                        f"sp_{args.preset}"), sp_like)
    lg_params = load_params(params_path(args.weights,
                                        f"lg_{args.preset}"), lg_like)
    return sp, sp_params, lg, lg_params


def _open_dataset(args):
    """Returns (K, gt_R, gt_t, frame_fn, gt_motion_small_fn)."""
    if args.dataset == "synthetic":
        from .io import synthetic
        scene = synthetic.make_scene(
            num_landmarks=args.landmarks, num_frames=args.last_frame + 1,
            height=args.height, width=args.width,
            desc_dim=args.desc_dim, seed=args.scene_seed)

        def frame(i):
            return synthetic.render_frame(scene, i, max_keypoints=args.kpts)

        return scene, scene.K, scene.poses_R, scene.poses_t, frame, None

    if os.path.isdir(os.path.join(args.dataset, "mav0")):
        # EuRoC ASL layout (BASELINE configs[3])
        from .io.euroc import EurocSequence
        seq = EurocSequence(args.dataset)

        def frame(i):
            return seq.frame(i)[:args.height, :args.width]

        def gate(i_prev, i, mag, rot):
            return seq.gt_motion_small(i_prev, i, mag, rot)

        return seq, seq.K, seq.gt_R, seq.gt_t, frame, gate

    from .io.kitti import KittiSequence, frame_path, load_frame
    seq = KittiSequence(args.dataset, args.sequence)
    loader = None
    try:
        # Native threaded libpng prefetch loader (runtime/native): decodes
        # ahead of the tracker off the hot path; PIL fallback below.
        from .runtime.native_lib import NativeLoader, available
        if available():
            paths = [frame_path(seq.seq_dir, i)
                     for i in range(args.first_frame, args.last_frame + 1)]
            native = NativeLoader(paths, args.height, args.width,
                                  depth=4, threads=2)
            cache = {}
            it = iter(native)

            def frame(i, _it=it, _cache=cache):
                while i not in _cache:
                    j, img = next(_it)
                    _cache[args.first_frame + j] = img
                return _cache.pop(i)
            loader = frame
    except Exception:
        loader = None
    if loader is None:
        def loader(i):
            img = load_frame(seq.seq_dir, i)
            return img[:args.height, :args.width]

    def gate(i_prev, i, mag, rot):
        return seq.gt_motion_small(i_prev, i, mag, rot)

    return seq, seq.K, seq.gt_R, seq.gt_t, loader, gate


def _run_chunked(args) -> int:
    """The learned route: fused chunked hot path (slam/chunk_driver.py) —
    the SAME pipeline shape bench.py and the flagship eval run, so
    `gl-slam-tpu run --frontend superpoint --preset flagship` reproduces the
    eval configuration end-to-end (VERDICT r2 item 6)."""
    import jax
    import jax.numpy as jnp

    from . import metrics as metrics_mod
    from .checkpoint import export_kitti_trajectory
    from .slam import fused
    from .slam.chunk_driver import ChunkedPipeline
    from .train import e2e
    from .viz.viewer import MapSnapshot, render_topdown

    os.makedirs(args.out, exist_ok=True)
    flag = args.preset == "flagship"
    if flag:
        sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
            args.weights)
        cfg = e2e.flagship_config(args.height, args.width)
    else:
        sp, sp_params, lg, lg_params = e2e.load_tiny_frontend(args.weights)
        cfg = e2e.micro_config(args.height, args.width, args.kpts,
                               args.desc_dim)
    subpix_mode = args.subpix or "pair"
    subpix = None
    if subpix_mode != "centroid":
        loader = e2e.load_flagship_subpix if flag else e2e.load_tiny_subpix
        subpix = loader(args.weights, pair=(subpix_mode == "pair"))
        if subpix is None:
            subpix_mode = "centroid"
    ks_head, ks_params = subpix if subpix is not None else (None, None)

    src, K, gt_R, gt_t, frame_fn, _gate_fn = _open_dataset(args)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    pipe = ChunkedPipeline(cfg, K, sp, lg, params, chunk=args.chunk,
                           ba_every=args.ba_every, subpix_head=ks_head)

    first, last = args.first_frame, args.last_frame
    gt_scale = 1.0
    if gt_R is not None and cfg.runtime.use_gt_scale:
        c0 = -gt_R[first].T @ gt_t[first]
        c1 = -gt_R[first + 1].T @ gt_t[first + 1]
        gt_scale = float(np.linalg.norm(c1 - c0))

    pipe.bootstrap_from_images(frame_fn(first), frame_fn(first + 1),
                               gt_scale, frame_idx0=first)

    def chunk_images(i0, n=None):
        # n < chunk: final partial chunk — pad by repeating the last real
        # frame (those rows are force-rejected via frame_gate below).
        # Each real frame is fetched exactly ONCE (the native prefetch
        # loader pops frames from its ring).
        n = args.chunk if n is None else n
        real = [np.asarray(frame_fn(i0 + t), dtype=np.float32)
                for t in range(n)]
        return jnp.asarray(np.stack(
            real + [real[-1]] * (args.chunk - n)))

    i = first + 2
    warm = None
    if i + args.chunk <= last + 1:
        warm = chunk_images(i)
        pipe.warmup(warm)          # compile outside the timed region
    t_start = time.time()
    while i + args.chunk <= last + 1:
        imgs = warm if (warm is not None and i == first + 2) \
            else chunk_images(i)
        pipe.track_chunk(imgs, i)
        i += args.chunk
    n_tail = last + 1 - i
    if n_tail > 0:
        # Partial tail chunk: pad + gate so no frame of the sequence is
        # dropped when (last+1-first-2) is not a chunk multiple
        gate = np.arange(args.chunk) < n_tail
        pipe.track_chunk(chunk_images(i, n_tail), i, frame_gate=gate)
        i += n_tail
    pipe.finish()
    elapsed = time.time() - t_start

    R, t, fidx = pipe.trajectory()
    export_kitti_trajectory(os.path.join(args.out, "trajectory.txt"), R, t)
    snap = MapSnapshot(pipe.state.map)
    snap.to_json(os.path.join(args.out, "map.json"))
    outs = pipe.stacked_outputs()
    report = {
        "frontend": "superpoint-chunked",
        "preset": args.preset,
        "subpix": subpix_mode,
        "frames_fed": i - first,
        "frames_tracked": int(len(R)),
        "frames_rejected": int((~outs.frame_ok).sum()) if outs is not None
        else 0,
        "fps_incl_io": round((i - first) / elapsed, 2),
        "ba_runs": pipe.num_ba_runs,
        "loop_closures": pipe.num_loop_closures,
        "mean_matches": float(np.mean(outs.num_matches)) if outs is not None
        else 0.0,
    }
    if gt_R is not None:
        c_est = metrics_mod.camera_centers(R, t)
        c_gt = metrics_mod.camera_centers(gt_R[fidx], gt_t[fidx])
        report["ate_rmse_m"] = round(
            metrics_mod.ate_rmse(c_est, c_gt, align=False), 4)
        render_topdown(snap, os.path.join(args.out, "trajectory.png"),
                       gt_centers=c_gt)
    else:
        render_topdown(snap, os.path.join(args.out, "trajectory.png"))
    print(json.dumps(report, indent=2))
    return 0


def cmd_run(args) -> int:
    if args.frontend == "superpoint" and not args.per_frame:
        return _run_chunked(args)
    import jax.numpy as jnp

    from . import metrics as metrics_mod
    from .checkpoint import export_kitti_trajectory, save_state
    from .slam.pipeline import TrackingPipeline
    from .tracing import MetricsRecorder, StageTimer
    from .viz.viewer import MapSnapshot, render_topdown

    os.makedirs(args.out, exist_ok=True)
    reobs = "lightglue" if args.frontend == "superpoint" else "mutual_nn"
    cfg = _build_config(args, reobs)
    src, K, gt_R, gt_t, frame_fn, gate_fn = _open_dataset(args)

    # ---- front-end ---------------------------------------------------------
    matcher = None
    if args.frontend == "oracle":
        if args.dataset != "synthetic":
            raise SystemExit("--frontend oracle needs --dataset synthetic")
        from .io import synthetic

        def features(i):
            o = synthetic.observe_frame(src, i, max_keypoints=args.kpts,
                                        noise_px=args.noise, seed=13)
            return o.keypoints, o.descriptors, o.valid
    elif args.frontend == "harris":
        from .models.classical import HarrisExtractor
        ex = HarrisExtractor(args.height, args.width,
                             max_keypoints=args.kpts)

        def features(i):
            kpts, scores, desc, valid = ex(jnp.asarray(frame_fn(i)[None]))
            return (np.asarray(kpts[0]), np.asarray(desc[0]),
                    np.asarray(valid[0]))
    else:  # superpoint
        import jax

        from .models.lightglue import normalize_keypoints
        from .ops.assignment import fused_assignment
        from .models.subpix import centroid_refine
        from .models.superpoint import sample_descriptors
        from .ops import match as match_ops
        from .ops import nms as nms_ops
        sp, sp_params, lg, lg_params = _load_learned_frontend(args)
        H, W = args.height, args.width
        pad_h, pad_w = (-H) % 8, (-W) % 8

        @jax.jit
        def _extract(img):
            x = jnp.pad(img[None], ((0, 0), (0, pad_h), (0, pad_w)))
            heat, grid = sp.apply(sp_params, x[..., None])
            heat = heat[:, :H, :W]
            kp, sc, v = nms_ops.detect_keypoints(
                heat, args.kpts, args.score_thr, args.nms_radius)
            src_img = img if cfg.frontend.subpix_source == "image" \
                else heat[0]
            kp = centroid_refine(src_img, kp[0].astype(jnp.float32),
                                 cfg.frontend.subpix_patch)
            return kp, sample_descriptors(grid[0], kp), v[0]

        def features(i):
            return _extract(jnp.asarray(frame_fn(i), jnp.float32))

        def matcher(kpts0, desc0, valid0, kpts1, desc1, valid1):
            kn0 = normalize_keypoints(kpts0, H, W)
            kn1 = normalize_keypoints(kpts1, H, W)
            f0, f1, z0, z1 = lg.apply(lg_params, desc0, desc1, kn0, kn1,
                                      valid0, valid1, return_features=True)
            mo = fused_assignment(f0, f1, z0, z1, valid0, valid1,
                                  1.0 / float(lg.dim) ** 0.5, 0.0)
            return match_ops.MatchResult(matches0=mo.matches0,
                                         mscores0=mo.mscores0)

    pipe = TrackingPipeline(cfg, K, matcher=matcher)
    rec = MetricsRecorder()
    timer = StageTimer()
    live = None
    if args.live_viz > 0:
        # During-run map streaming (the reference's live viewer thread,
        # `visualization.cpp:27-165`): poll <out>/live/live.{json,png}
        from .viz.viewer import LiveViewer
        live = LiveViewer(os.path.join(args.out, "live"),
                          every=args.live_viz)

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
    prev_idx = first + 1
    n_gated = 0
    for i in range(first + 2, last + 1):
        # GT motion gate (`thread_pool.cpp:78-96`): skip near-static frames
        if (cfg.runtime.use_gt_motion_gate and gate_fn is not None
                and gt_R is not None
                and gate_fn(prev_idx, i, cfg.runtime.gt_mag_filter,
                            cfg.runtime.gt_rot_filter)):
            n_gated += 1
            continue
        prev_idx = i
        with timer.stage("features"):
            f = features(i)
        with timer.stage("track"):
            out = pipe.step(*f, i)
        rec.record(i, num_matches=out.num_matches,
                   num_map_matches=out.num_map_matches,
                   num_new_points=out.num_new_points)
        if live is not None:
            live.update(pipe.state.map, i)
    pipe.finish()
    if live is not None:
        live.close()
    elapsed = time.time() - t_start

    R, t, fidx = pipe.trajectory()
    export_kitti_trajectory(os.path.join(args.out, "trajectory.txt"), R, t)
    rec.to_jsonl(os.path.join(args.out, "metrics.jsonl"))
    snap = MapSnapshot(pipe.state.map)
    snap.to_json(os.path.join(args.out, "map.json"))

    report = {
        "frontend": args.frontend,
        "frames_tracked": int(len(R)),
        "frames_gated": n_gated,
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
        report["ate_rmse_aligned_m"] = round(
            metrics_mod.ate_rmse(c_est, c_gt, align=True), 4)
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
    run.add_argument("--frontend", default="oracle",
                     choices=["oracle", "harris", "superpoint"])
    run.add_argument("--weights", default="checkpoints",
                     help="directory with sp_/lg_ .npz (superpoint mode)")
    run.add_argument("--preset", default="tiny",
                     choices=["tiny", "flagship"])
    run.add_argument("--out", default="out")
    run.add_argument("--first-frame", type=int, default=0)
    run.add_argument("--last-frame", type=int, default=40)
    # None = resolved from --preset (tiny: 240x320 N=512 D=64; flagship:
    # the reference's deployed 376x1241 N=2048 D=256) so ONE command
    # reproduces the flagship eval configuration (VERDICT r2 item 6)
    run.add_argument("--height", type=int, default=None)
    run.add_argument("--width", type=int, default=None)
    run.add_argument("--kpts", type=int, default=None)
    run.add_argument("--desc-dim", type=int, default=None)
    run.add_argument("--landmarks", type=int, default=4000)
    run.add_argument("--scene-seed", type=int, default=7)
    run.add_argument("--noise", type=float, default=0.2)
    run.add_argument("--match-thr", type=float, default=0.7)
    run.add_argument("--score-thr", type=float, default=0.02)
    run.add_argument("--nms-radius", type=int, default=3)
    run.add_argument("--essential-thr", type=float, default=0.5)
    run.add_argument("--tri-thr", type=float, default=0.5)
    run.add_argument("--max-depth", type=float, default=100.0)
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
    run.add_argument("--sync-ba", action="store_true")
    run.add_argument("--checkpoint", action="store_true")
    run.add_argument("--live-viz", type=int, default=0, metavar="N",
                     help="stream live.{json,png} to <out>/live every N "
                          "frames (0 = off)")
    run.add_argument("--per-frame", action="store_true",
                     help="superpoint front-end: use the per-frame "
                          "TrackingPipeline instead of the fused chunked "
                          "hot path (the default learned route)")
    run.add_argument("--chunk", type=int, default=8,
                     help="frames per fused-chunk dispatch (chunked route)")
    run.add_argument("--ba-every", type=int, default=8,
                     help="frames between window-BA dispatches (chunked "
                          "route; ~reference cadence 7, thread_pool.cpp:248)")
    run.add_argument("--subpix", default=None,
                     choices=["pair", "single", "centroid"],
                     help="sub-pixel refinement for the chunked route "
                          "(default: pair when a kspair checkpoint exists)")
    run.set_defaults(fn=cmd_run)

    args = ap.parse_args(argv)
    if hasattr(args, "preset"):
        flag = args.preset == "flagship"
        for name, tiny_v, flag_v in (("height", 240, 376),
                                     ("width", 320, 1241),
                                     ("kpts", 512, 2048),
                                     ("desc_dim", 64, 256)):
            if getattr(args, name, 0) is None:
                setattr(args, name, flag_v if flag else tiny_v)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
