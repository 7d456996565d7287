"""Train ONLY the pair-conditioned Keypt2Subpx head at the tiny preset,
against the frozen committed sp_tiny weights (the SP/LG checkpoints back
committed e2e expectations and are not retrained here). Writes
checkpoints/kspair_tiny.npz and prints the eval comparison vs centroid and
the single-view head.

Usage: python scripts/train_pair_subpix_tiny.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.checkpoint import save_params, params_path
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.subpix import (PairSubpixHead, SubpixHead,
                                           centroid_refine, gather_patches)
    from gl_slam_tpu.models.superpoint import sample_descriptors
    from gl_slam_tpu.ops import nms as nms_ops
    from gl_slam_tpu.train import frontend_train as ft
    from gl_slam_tpu.train.e2e import load_tiny_frontend, load_tiny_subpix

    # Same scene recipe as scripts/train_frontend.py --preset tiny
    H, W, N, D = 160, 240, 96, 64
    seed = 7
    scenes = [synthetic.make_scene(num_landmarks=700, num_frames=36,
                                   height=H, width=W, desc_dim=D,
                                   seed=seed + 10 * s) for s in range(6)]
    sp, sp_params, _, _ = load_tiny_frontend("checkpoints")

    head = PairSubpixHead(patch=7, offset_range=1.5)
    params = ft.train_pair_subpix(head, sp, sp_params, scenes, 20, N,
                                  steps=600, log_every=100)
    save_params(params_path("checkpoints", "kspair_tiny"), params)
    print("saved checkpoints/kspair_tiny.npz")

    # ---- eval: held-out scene, refined keypoint error ---------------------
    ks = load_tiny_subpix("checkpoints")
    test = synthetic.make_scene(num_landmarks=700, num_frames=6,
                                height=H, width=W, desc_dim=D, seed=11)
    errs_c, errs_k, errs_p = [], [], []
    prev = None
    for i in range(6):
        obs = synthetic.observe_frame(test, i, max_keypoints=N)
        img = jnp.asarray(synthetic.render_frame(test, i, max_keypoints=N),
                          jnp.float32)
        heat, grid = sp.apply(sp_params, img[None, ..., None])
        kp_det, sc, v = nms_ops.detect_keypoints(heat, N, 1e-3, 3)
        kpi = kp_det[0].astype(jnp.float32)
        kpr_c = np.asarray(centroid_refine(img, kpi, 7))
        vv = np.asarray(v[0])
        gt = obs.keypoints[obs.valid]
        gt_lid = obs.landmark_ids[obs.valid]

        d_int = sample_descriptors(grid[0], kpi)
        if ks is not None:
            ks_head, ks_params = ks
            kpr_k = np.asarray(kpi + ks_head.apply(
                ks_params, gather_patches(img, kpi, ks_head.patch), d_int))
        else:
            kpr_k = kpr_c
        for kpr, errs in ((kpr_c, errs_c), (kpr_k, errs_k)):
            dr = np.linalg.norm(kpr[vv][:, None, :] - gt[None, :, :],
                                axis=2).min(axis=1)
            errs.extend(dr[dr < 2])

        anchor = np.round(kpr_c)
        patches = np.asarray(gather_patches(img, jnp.asarray(anchor), 7))
        desc = np.asarray(sample_descriptors(grid[0], jnp.asarray(kpr_c)))
        dmat = np.linalg.norm(kpr_c[:, None, :] - gt[None, :, :], axis=2)
        jn = dmat.argmin(axis=1)
        det_ok = vv & (dmat.min(axis=1) < 2.0)
        lids = np.where(det_ok, gt_lid[jn], -1)
        gt_of = {int(l): g for l, g in zip(gt_lid, gt)}
        if prev is not None:
            lut = {int(l): k for k, l in enumerate(lids) if l >= 0}
            r0 = [k for k, l in enumerate(prev[3])
                  if l >= 0 and int(l) in lut]
            r1 = [lut[int(prev[3][k])] for k in r0]
            if r0:
                r0a, r1a = np.asarray(r0), np.asarray(r1)
                score = np.clip(np.sum(prev[2][r0a] * desc[r1a], 1), 0, 1)
                off = np.asarray(head.apply(
                    params, jnp.asarray(prev[1][r0a]),
                    jnp.asarray(patches[r1a]), jnp.asarray(prev[2][r0a]),
                    jnp.asarray(desc[r1a]),
                    jnp.asarray(score.astype(np.float32))))
                ref = anchor[r1a] + off
                gtt = np.stack([gt_of[int(l)] for l in lids[r1a]])
                errs_p.extend(np.linalg.norm(ref - gtt, axis=1))
        prev = (anchor, patches, desc, lids)
    print(f"refined median err: centroid {np.median(errs_c):.3f}px, "
          f"single-view {np.median(errs_k):.3f}px, "
          f"pair-conditioned {np.median(errs_p):.3f}px "
          f"(n={len(errs_p)} matched)")


if __name__ == "__main__":
    main()
