"""Train the learned front-end (SuperPoint + LightGlue) on synthetic data.

The reference ships pre-trained ONNX engines; this framework trains its own
weights — the synthetic renderer provides infinite labeled correspondence
(train/frontend_train.py). Run on TPU for speed; checkpoints are written as
.npz under checkpoints/ (not committed — regenerate with this script).

Usage:
  python scripts/train_frontend.py --preset tiny   # CI-scale weights
  python scripts/train_frontend.py --preset flagship
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import argparse
import os
import time

import numpy as np

PRESETS = {
    # (H, W, N, D, sp_channels, lg_dim, lg_heads, lg_layers,
    #  sp_steps, lg_steps, landmarks)
    "tiny": (160, 240, 96, 64, (16, 16, 32, 32, 32, 32, 64, 64),
             64, 2, 2, 1500, 800, 700),
    "flagship": (376, 1240, 2048, 256, (64, 64, 64, 64, 128, 128, 128, 128),
                 256, 2, 9, 3000, 1500, 20000),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=sorted(PRESETS))
    ap.add_argument("--sp-steps", type=int, default=None)
    ap.add_argument("--lg-steps", type=int, default=None)
    ap.add_argument("--out", default="checkpoints")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--eval", action="store_true",
                    help="report detection/matching quality on held-out data")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import LightGlueNet
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.train import frontend_train as ft
    from gl_slam_tpu.checkpoint import save_params, params_path

    (H, W, N, D, ch, lgd, lgh, lgl, sp_steps, lg_steps,
     landmarks) = PRESETS[args.preset]
    sp_steps = args.sp_steps or sp_steps
    lg_steps = args.lg_steps or lg_steps

    scenes = [synthetic.make_scene(num_landmarks=landmarks, num_frames=36,
                                   height=H, width=W, desc_dim=D,
                                   seed=args.seed + 10 * s)
              for s in range(6 if args.preset == "tiny" else 3)]
    sp = SuperPointNet(descriptor_dim=D, channels=ch)
    lg = LightGlueNet(dim=lgd, heads=lgh, layers=lgl, input_dim=D)

    t0 = time.time()
    sp_params = ft.train_superpoint(sp, scenes, 30, N, steps=sp_steps,
                                    batch_size=4, log_every=200)
    print(f"SP trained in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    from gl_slam_tpu.models.subpix import SubpixHead
    ks = SubpixHead(patch=7, offset_range=1.5)
    ks_params = ft.train_subpix(ks, sp, sp_params, scenes, 20, N,
                                steps=500, log_every=200)
    print(f"Subpix trained in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    lg_params = ft.train_lightglue(lg, sp, sp_params, scenes, 30, N,
                                   steps=lg_steps, batch_size=2,
                                   jitter_px=1.0, log_every=200)
    print(f"LG trained in {time.time() - t0:.1f}s", flush=True)

    os.makedirs(args.out, exist_ok=True)
    save_params(params_path(args.out, f"sp_{args.preset}"), sp_params)
    save_params(params_path(args.out, f"lg_{args.preset}"), lg_params)
    save_params(params_path(args.out, f"ks_{args.preset}"), ks_params)
    print(f"saved sp_/lg_/ks_{args.preset}.npz to {args.out}")

    if args.eval:
        from gl_slam_tpu.models.subpix import centroid_refine, gather_patches
        from gl_slam_tpu.models.superpoint import sample_descriptors
        from gl_slam_tpu.ops import nms as nms_ops
        test = synthetic.make_scene(num_landmarks=landmarks, num_frames=6,
                                    height=H, width=W, desc_dim=D, seed=11)
        nm = ng = 0
        errs_c, errs_k = [], []
        for i in range(6):
            obs = synthetic.observe_frame(test, i, max_keypoints=N)
            img = jnp.asarray(synthetic.render_frame(test, i,
                                                     max_keypoints=N),
                              jnp.float32)
            heat, grid = sp.apply(sp_params, img[None, ..., None])
            kp, sc, v = nms_ops.detect_keypoints(heat, N, 1e-3, 3)
            kpi = kp[0].astype(jnp.float32)
            kpr_c = np.asarray(centroid_refine(img, kpi, 7))
            d_int = sample_descriptors(grid[0], kpi)
            kpr_k = np.asarray(kpi + ks.apply(
                ks_params, gather_patches(img, kpi, ks.patch), d_int))
            vv = np.asarray(v[0])
            gt = obs.keypoints[obs.valid]
            ng += len(gt)
            for kpr, errs in ((kpr_c, errs_c), (kpr_k, errs_k)):
                dr = np.linalg.norm(kpr[vv][:, None, :] - gt[None, :, :],
                                    axis=2).min(axis=1)
                errs.extend(dr[dr < 2])
            nm += (np.linalg.norm(kpr_c[vv][:, None, :] - gt[None, :, :],
                                  axis=2).min(axis=1) < 2).sum()
        print(f"detection: recall@2px {nm}/{ng}; refined median err: "
              f"centroid {np.median(errs_c):.3f}px, "
              f"learned-subpix {np.median(errs_k):.3f}px")


if __name__ == "__main__":
    main()
