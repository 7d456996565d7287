"""Flagship quality + perf from ONE configuration (VERDICT r1 item 2).

Runs the FULL learned pipeline with the trained flagship weights
(checkpoints/{sp,lg}_flagship.npz) at reference shapes — 376x1241, N=2048,
D=256, 9-layer matcher, LightGlue on all three per-frame passes — over a
>=100-frame held-out rendered sequence (trajectory/landmarks unseen in
training), and reports ATE-RMSE *and* tracked fps from the same run as one
JSON line (also written to FLAGSHIP_EVAL.json at the repo root;
tests/test_flagship_e2e.py asserts the committed bounds).

Run on the real TPU: python scripts/eval_flagship.py [--frames 120]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import argparse
import json

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--seed", type=int, default=101,
                    help="held-out scene seed (training uses 7,17,27)")
    ap.add_argument("--landmarks", type=int, default=20000)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ckpt", default=_os.path.join(ROOT, "checkpoints"))
    ap.add_argument("--out", default=_os.path.join(ROOT,
                                                   "FLAGSHIP_EVAL.json"))
    ap.add_argument("--motion", default="forward_turn")
    ap.add_argument("--subpix", default="pair",
                    choices=["pair", "single", "centroid"],
                    help="sub-pixel refinement: pair-conditioned learned "
                         "head (Keypt2Subpx parity), single-view learned "
                         "head, or the training-free centroid")
    ap.add_argument("--reobs-mode", default=None,
                    choices=["separate", "merged", "batched"],
                    help="override cfg.map.reobs_mode (separate = "
                         "reference-parity LightGlue x3; merged = one "
                         "union synthetic pass, LightGlue x2)")
    ap.add_argument("--domain", default="clean", choices=["clean", "hard"],
                    help="'hard' adds photometric nuisance: repetitive "
                         "structure (aliased appearances), illumination "
                         "drift, sweeping occluders, sensor noise "
                         "(io/synthetic.render_frame)")
    ap.add_argument("--render-cache", default=None)
    args = ap.parse_args()
    if args.domain == "hard" and args.out.endswith("FLAGSHIP_EVAL.json"):
        args.out = args.out.replace("FLAGSHIP_EVAL.json",
                                    "FLAGSHIP_EVAL_HARD.json")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.train import e2e

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(args.ckpt)
    subpix = None
    if args.subpix != "centroid":
        subpix = e2e.load_flagship_subpix(args.ckpt,
                                          pair=(args.subpix == "pair"))
    cfg = e2e.flagship_config()
    if args.reobs_mode is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, map=dataclasses.replace(
            cfg.map, reobs_mode=args.reobs_mode))
    scene = synthetic.make_scene(
        num_landmarks=args.landmarks, num_frames=args.frames,
        height=cfg.frontend.image_height, width=cfg.frontend.image_width,
        desc_dim=cfg.frontend.descriptor_dim, seed=args.seed,
        motion=args.motion)
    res = e2e.run_learned_e2e(sp, sp_params, lg, lg_params, scene, cfg,
                              n_frames=args.frames, chunk=args.chunk,
                              ba_every=8, warmup=True, subpix=subpix,
                              render_cache=args.render_cache,
                              domain=args.domain)
    traj_len = float(args.frames)      # ~1 m/frame synthetic speed
    report = {
        "config": ("flagship: 376x1241, N=2048, D=256, 9-layer matcher, "
                   "LightGlue x3 passes, trained flagship weights, "
                   f"subpix={args.subpix}, "
                   f"reobs={args.reobs_mode or 'separate'}, "
                   f"domain={args.domain}, "
                   f"{args.frames}-frame held-out sequence "
                   f"(seed {args.seed}, {args.motion})"),
        "backend": jax.default_backend(),
        "ate_rmse_m": round(res.ate_m, 4),
        "ate_pct_of_trajectory": round(100.0 * res.ate_m / traj_len, 3),
        "num_keyframes": res.num_keyframes,
        "num_frames": res.num_frames,
        "num_ba_runs": res.num_ba_runs,
        "mean_matches": round(res.mean_matches, 1),
        "mean_inliers": round(res.mean_inliers, 1),
        "num_rejected_frames": res.num_rejected,
        "mean_pose_cost": round(res.mean_pose_cost, 3),
        "fps_same_run": round(res.fps, 2),
    }
    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
