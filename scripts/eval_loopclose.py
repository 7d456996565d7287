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


def run_once(loop_on: bool, args, scene, cfg_base):
    import jax
    import jax.numpy as jnp

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam import fused
    from gl_slam_tpu.slam.chunk_driver import ChunkedPipeline
    from gl_slam_tpu.train import e2e

    cfg = dataclasses.replace(cfg_base, runtime=dataclasses.replace(
        cfg_base.runtime, loop_closing=loop_on))
    sp, sp_params, lg, lg_params = e2e.load_tiny_frontend(
        _os.path.join(ROOT, "checkpoints"))
    params = fused.FusedParams(sp=sp_params, lg=lg_params)
    N = cfg.frontend.max_keypoints
    pipe = ChunkedPipeline(cfg, scene.K, sp, lg, params, chunk=args.chunk,
                           ba_every=args.ba_every)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap_from_images(
        synthetic.render_frame(scene, 0, max_keypoints=N),
        synthetic.render_frame(scene, 1, max_keypoints=N),
        float(np.linalg.norm(c1 - c0)))
    i = 2
    while i + args.chunk <= args.frames:
        imgs = jnp.asarray(np.stack([
            synthetic.render_frame(scene, i + t, max_keypoints=N)
            for t in range(args.chunk)]).astype(np.float32))
        pipe.track_chunk(imgs, i)
        i += args.chunk
    pipe.finish()
    R, t, fidx = pipe.trajectory()
    c_est = np.einsum('kij,kj->ki', R.transpose(0, 2, 1), -t)
    c_gt = np.stack([-scene.poses_R[j].T @ scene.poses_t[j] for j in fidx])
    ate = float(np.sqrt(((c_est - c_gt) ** 2).sum(1).mean()))
    return dict(ate_rmse_m=round(ate, 4), keyframes=int(len(R)),
                frames=i, loop_closures=pipe.num_loop_closures,
                ba_runs=pipe.num_ba_runs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=360)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--ba-every", type=int, default=8)
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
    scene = synthetic.make_scene(
        num_landmarks=max(2000, n * 10), num_frames=n,
        height=args.height, width=args.width, desc_dim=e2e.TINY_DESC_DIM,
        seed=args.seed, motion="loop")
    cfg = e2e.micro_config(args.height, args.width, args.kpts,
                           e2e.TINY_DESC_DIM)
    cfg = dataclasses.replace(cfg, map=MapConfig(
        max_keyframes=max(128, 1 << (n - 1).bit_length()),
        max_points=max(16384, n * 64),
        covis_max_points=256, covis_edge_threshold=10))

    off = run_once(False, args, scene, cfg)
    on = run_once(True, args, scene, cfg)
    report = {
        "config": (f"loop-closure A/B: {n}-frame closed-circle revisit "
                   f"(radius ~{n / (2 * np.pi):.0f} m), learned tiny "
                   "front-end, fused chunked driver (the bench path), "
                   f"chunk={args.chunk}"),
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
