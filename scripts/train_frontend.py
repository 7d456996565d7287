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
    # Model shapes must match train/e2e.py's TINY_*/FLAGSHIP_* constants
    # (the loaders) — tests/test_flagship_e2e.py asserts the equality.
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
    ap.add_argument("--lg-only", action="store_true",
                    help="retrain ONLY the matcher, loading the existing "
                         "sp_<preset>.npz (detector + subpix heads reused)")
    ap.add_argument("--desc-age-max", type=int, default=6,
                    help="descriptor-age augmentation bound for the "
                         "matcher (see train_lightglue)")
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

    if args.lg_only:
        from gl_slam_tpu.checkpoint import load_params
        sp_like = sp.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)))
        sp_params = load_params(
            params_path(args.out, f"sp_{args.preset}"), sp_like)
        ks_params = kp_params = None
    else:
        t0 = time.time()
        sp_params = ft.train_superpoint(sp, scenes, 30, N, steps=sp_steps,
                                        batch_size=4, log_every=200)
        print(f"SP trained in {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        from gl_slam_tpu.models.subpix import PairSubpixHead, SubpixHead
        ks = SubpixHead(patch=7, offset_range=1.5)
        ks_params = ft.train_subpix(ks, sp, sp_params, scenes, 20, N,
                                    steps=500, log_every=200)
        print(f"Subpix trained in {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        kp = PairSubpixHead(patch=7, offset_range=1.5)
        kp_params = ft.train_pair_subpix(kp, sp, sp_params, scenes, 20, N,
                                         steps=600, log_every=200)
        print(f"Pair-subpix trained in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    lg_params = ft.train_lightglue(lg, sp, sp_params, scenes, 30, N,
                                   steps=lg_steps, batch_size=2,
                                   jitter_px=1.0, log_every=200,
                                   desc_age_max=args.desc_age_max)
    print(f"LG trained in {time.time() - t0:.1f}s", flush=True)

    os.makedirs(args.out, exist_ok=True)
    save_params(params_path(args.out, f"lg_{args.preset}"), lg_params)
    if not args.lg_only:
        save_params(params_path(args.out, f"sp_{args.preset}"), sp_params)
        save_params(params_path(args.out, f"ks_{args.preset}"), ks_params)
        save_params(params_path(args.out, f"kspair_{args.preset}"),
                    kp_params)
    print(f"saved checkpoints for preset {args.preset} to {args.out}")

    if args.eval:
        from gl_slam_tpu.models.subpix import centroid_refine, gather_patches
        from gl_slam_tpu.models.superpoint import sample_descriptors
        from gl_slam_tpu.ops import nms as nms_ops
        test = synthetic.make_scene(num_landmarks=landmarks, num_frames=6,
                                    height=H, width=W, desc_dim=D, seed=11)
        nm = ng = 0
        errs_c, errs_k, errs_p = [], [], []
        prev = None     # (anchor, patches, desc, lids) of previous frame
        for i in range(6):
            obs = synthetic.observe_frame(test, i, max_keypoints=N)
            img = jnp.asarray(synthetic.render_frame(test, i,
                                                     max_keypoints=N),
                              jnp.float32)
            heat, grid = sp.apply(sp_params, img[None, ..., None])
            kp_det, sc, v = nms_ops.detect_keypoints(heat, N, 1e-3, 3)
            kpi = kp_det[0].astype(jnp.float32)
            kpr_c = np.asarray(centroid_refine(img, kpi, 7))
            d_int = sample_descriptors(grid[0], kpi)
            kpr_k = np.asarray(kpi + ks.apply(
                ks_params, gather_patches(img, kpi, ks.patch), d_int))
            vv = np.asarray(v[0])
            gt = obs.keypoints[obs.valid]
            gt_lid = obs.landmark_ids[obs.valid]
            ng += len(gt)
            for kpr, errs in ((kpr_c, errs_c), (kpr_k, errs_k)):
                dr = np.linalg.norm(kpr[vv][:, None, :] - gt[None, :, :],
                                    axis=2).min(axis=1)
                errs.extend(dr[dr < 2])
            nm += (np.linalg.norm(kpr_c[vv][:, None, :] - gt[None, :, :],
                                  axis=2).min(axis=1) < 2).sum()

            # pair-conditioned: oracle-match detections against prev frame
            anchor = np.round(kpr_c)
            patches = np.asarray(gather_patches(img, jnp.asarray(anchor),
                                                kp.patch))
            desc = np.asarray(sample_descriptors(grid[0],
                                                 jnp.asarray(kpr_c)))
            dmat = np.linalg.norm(kpr_c[:, None, :] - gt[None, :, :], axis=2)
            jn = dmat.argmin(axis=1) if len(gt) else np.zeros(N, int)
            det_ok = vv & (dmat.min(axis=1) < 2.0) if len(gt) \
                else np.zeros(N, bool)
            lids = np.where(det_ok, gt_lid[jn], -1)
            gt_of = {int(l): g for l, g in zip(gt_lid, gt)}
            if prev is not None:
                lut = {int(l): k for k, l in enumerate(lids) if l >= 0}
                r0 = [k for k, l in enumerate(prev[3])
                      if l >= 0 and int(l) in lut]
                r1 = [lut[int(prev[3][k])] for k in r0]
                if r0:
                    r0, r1 = np.asarray(r0), np.asarray(r1)
                    score = np.clip(np.sum(prev[2][r0] * desc[r1], 1), 0, 1)
                    off = np.asarray(kp.apply(
                        kp_params, jnp.asarray(prev[1][r0]),
                        jnp.asarray(patches[r1]), jnp.asarray(prev[2][r0]),
                        jnp.asarray(desc[r1]),
                        jnp.asarray(score.astype(np.float32))))
                    ref = anchor[r1] + off
                    gtt = np.stack([gt_of[int(l)] for l in lids[r1]])
                    errs_p.extend(np.linalg.norm(ref - gtt, axis=1))
            prev = (anchor, patches, desc, lids)
        print(f"detection: recall@2px {nm}/{ng}; refined median err: "
              f"centroid {np.median(errs_c):.3f}px, "
              f"learned-subpix {np.median(errs_k):.3f}px, "
              f"pair-subpix {np.median(errs_p):.3f}px")


if __name__ == "__main__":
    main()
