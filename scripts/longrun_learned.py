"""Long-run learned-pipeline harness: ATE + fps + BA count in one JSON.

Tracks a LONG rendered synthetic sequence (default 300 frames; use
--frames 1000+ for the full soak) through the chunked learned pipeline —
SuperPoint extraction, LightGlue on all three matching passes, essential
RANSAC, pose-only LM, triangulation, fused map insertion, periodic windowed
BA — with the tiny trained checkpoints. One command, one JSON scoreboard
(VERDICT r1 item 7).

  python scripts/longrun_learned.py --frames 1000
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import argparse
import dataclasses
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--kpts", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ba-every", type=int, default=5)
    ap.add_argument("--weights", default="checkpoints")
    ap.add_argument("--scene-seed", type=int, default=11)
    ap.add_argument("--reobs", choices=["lightglue", "nn"],
                    default="lightglue",
                    help="matcher for the 2nd/3rd per-frame passes "
                    "(reference parity = lightglue; nn = mutual-NN)")
    ap.add_argument("--max-points", type=int, default=0,
                    help="pin the point-table capacity (0 = grow with the "
                    "sequence). Pinning it on a long run exercises slot "
                    "recycling: the table must turn over many times "
                    "(state.recycle_free_slots) without starving")
    ap.add_argument("--out", default="",
                    help="also write the JSON report to this path")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.config import MapConfig
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.train import e2e

    sp, sp_params, lg, lg_params = e2e.load_tiny_frontend(args.weights)
    H, W, N = args.height, args.width, args.kpts
    D = e2e.TINY_DESC_DIM
    n = args.frames
    # Landmark DENSITY PER METRE of corridor must stay at the level the
    # 32-frame e2e scene validated (~8/m): the corridor grows with n, and a
    # constant total landmark count starves the map as the camera advances
    # (re-observations decay, triangulation dries up, drift compounds —
    # scripts/diag_longrun.py). Raised near-plane keeps 1 m/frame motion
    # matchable.
    scene = synthetic.make_scene(
        num_landmarks=max(900, (n + 120) * 8), num_frames=n,
        height=H, width=W, desc_dim=D, seed=args.scene_seed,
        min_depth=6.0)
    cfg = e2e.micro_config(H, W, N, D)
    cfg = dataclasses.replace(cfg, map=MapConfig(
        max_keyframes=max(128, 1 << (n - 1).bit_length()),
        max_points=args.max_points or max(16384, n * 96),
        covis_max_points=256, covis_edge_threshold=10))
    if args.reobs == "nn":
        cfg = dataclasses.replace(cfg, frontend=dataclasses.replace(
            cfg.frontend, reobs_matcher="mutual_nn"))
    res = e2e.run_learned_e2e(sp, sp_params, lg, lg_params, scene, cfg,
                              n_frames=n, chunk=args.chunk,
                              ba_every=args.ba_every)
    report = {
        "frames": res.num_frames,
        "keyframes": res.num_keyframes,
        "ate_rmse_m": round(res.ate_m, 4),
        "trajectory_len_m": float(res.num_frames),  # 1 m/frame scene speed
        "drift_pct": round(100.0 * res.ate_m / max(res.num_frames, 1), 3),
        "fps_steady": round(res.fps, 2),
        "ba_runs": res.num_ba_runs,
        "mean_matches": round(res.mean_matches, 1),
        "max_points_capacity": cfg.map.max_points,
        "total_new_points": res.total_new_points,
        "reobs": args.reobs,
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
