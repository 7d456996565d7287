"""Loop-closure ATE evidence on the chunked path (VERDICT r2 item 5).

Tracks a closed-circle revisit trajectory (io/synthetic.py motion="loop")
with the learned tiny front-end through the SAME fused chunked driver bench
uses (slam/chunk_driver.py), twice: loop closing OFF vs ON. A real closure
must fire on the revisit and reduce the final-trajectory ATE. Commits the
comparison to LOOPCLOSE_EVAL.json; tests/test_loopclose.py asserts the
committed bounds.

Run on the TPU:  python scripts/eval_loopclose.py --frames 360
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def run_once(loop_on: bool, args, scene, cfg_base, cache):
    import dataclasses as _dc

    from gl_slam_tpu.train import e2e

    cfg = _dc.replace(cfg_base, runtime=_dc.replace(
        cfg_base.runtime, loop_closing=loop_on))
    if args.preset == "flagship":
        sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
            _os.path.join(ROOT, "checkpoints"))
        subpix = e2e.load_flagship_subpix(
            _os.path.join(ROOT, "checkpoints"), pair=True)
    else:
        sp, sp_params, lg, lg_params = e2e.load_tiny_frontend(
            _os.path.join(ROOT, "checkpoints"))
        subpix = None
    res = e2e.run_learned_e2e(sp, sp_params, lg, lg_params, scene, cfg,
                              n_frames=args.frames, chunk=args.chunk,
                              ba_every=args.ba_every, warmup=True,
                              subpix=subpix, render_cache=cache,
                              domain=args.domain)
    return dict(ate_rmse_m=round(res.ate_m, 4), keyframes=res.num_keyframes,
                frames=res.num_frames, loop_closures=res.loop_closures,
                ba_runs=res.num_ba_runs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=360)
    ap.add_argument("--preset", choices=["tiny", "flagship"],
                    default="flagship")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ba-every", type=int, default=8)
    ap.add_argument("--period", type=int, default=None,
                    help="circle period < frames gives a re-traversal tail")
    ap.add_argument("--domain", default="clean", choices=["clean", "hard"])
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--kpts", type=int, default=128)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--out", default=_os.path.join(ROOT,
                                                   "LOOPCLOSE_EVAL.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.config import MapConfig
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.train import e2e

    n = args.frames
    if args.preset == "flagship":
        cfg = e2e.flagship_config()
        H, W = cfg.frontend.image_height, cfg.frontend.image_width
        D = cfg.frontend.descriptor_dim
        scene = synthetic.make_scene(
            num_landmarks=max(20000, n * 170), num_frames=n,
            height=H, width=W, desc_dim=D, seed=args.seed, motion="loop",
            loop_period=args.period)
        cfg = dataclasses.replace(cfg, map=dataclasses.replace(
            cfg.map, max_keyframes=max(512, 1 << (n - 1).bit_length())))
        dom = "" if args.domain == "clean" else f"_{args.domain}"
        per = "" if args.period is None else f"_p{args.period}"
        cache = _os.path.join(
            "/tmp", f"render_loop{dom}{per}_{args.seed}_{n}_{H}x{W}.npy")
    else:
        scene = synthetic.make_scene(
            num_landmarks=max(2000, n * 10), num_frames=n,
            height=args.height, width=args.width,
            desc_dim=e2e.TINY_DESC_DIM, seed=args.seed, motion="loop")
        cfg = e2e.micro_config(args.height, args.width, args.kpts,
                               e2e.TINY_DESC_DIM)
        cfg = dataclasses.replace(cfg, map=MapConfig(
            max_keyframes=max(128, 1 << (n - 1).bit_length()),
            max_points=max(16384, n * 64),
            covis_max_points=256, covis_edge_threshold=10))
        cache = None

    off = run_once(False, args, scene, cfg, cache)
    on = run_once(True, args, scene, cfg, cache)
    period = args.period or n
    report = {
        "config": (f"loop-closure A/B: {n}-frame closed-circle, period "
                   f"{period} (re-traversal tail {n - period} frames), "
                   f"domain {args.domain} "
                   f"(radius ~{period / (2 * np.pi):.0f} m), learned "
                   f"{args.preset} front-end, fused chunked driver (the "
                   f"bench path), chunk={args.chunk}"),
        "backend": jax.default_backend(),
        "loop_off": off,
        "loop_on": on,
        "ate_improvement_pct": round(
            100.0 * (off["ate_rmse_m"] - on["ate_rmse_m"])
            / max(off["ate_rmse_m"], 1e-9), 2),
    }
    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
