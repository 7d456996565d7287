"""Front-end accuracy decomposition at flagship shapes (TPU).

The flagship eval's pose-LM residuals sit at ~0.65 px right after bootstrap
(diag_flagship runs) — far above the pair-subpix head's 0.074 px training
error — so EVERYTHING downstream (triangulation gate, pose quality, BA)
inherits a noise floor the reference pipeline does not have
(`/root/reference/src/core/keypt2subpx.cpp` refines to ~0.1 px on real
images). This probe isolates where that error enters:

  1. raw SuperPoint detections vs the nearest GT landmark projection
  2. + centroid refinement
  3. + pair-conditioned learned refinement (as the chunk prologue applies it)
  4. matcher identity correctness (fraction of LightGlue matches that join
     detections of the SAME landmark)

Each stage reports error percentiles over the first F frames of the
held-out flagship scene.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import argparse

import numpy as np


def nearest_gt(kpts, valid, gt_uv, gt_valid):
    """For each detection, distance to + id of the nearest GT projection."""
    gt = gt_uv[gt_valid]
    ids = np.nonzero(gt_valid)[0]
    d = np.linalg.norm(kpts[:, None, :] - gt[None, :, :], axis=-1)  # (N,G)
    j = np.argmin(d, axis=1)
    dist = d[np.arange(len(kpts)), j]
    lid = ids[j]
    dist = np.where(valid, dist, np.inf)
    return dist, lid


def pct(x, mask):
    x = x[mask & np.isfinite(x)]
    if len(x) == 0:
        return "n/a"
    return ("n=%4d  p50=%.3f  p90=%.3f  mean=%.3f"
            % (len(x), np.percentile(x, 50), np.percentile(x, 90),
               x.mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--seed", type=int, default=101)
    ap.add_argument("--landmarks", type=int, default=20000)
    ap.add_argument("--motion", default="forward_turn")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models import subpix as subpix_mod
    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.ops.assignment import fused_assignment
    from gl_slam_tpu.slam import fused
    from gl_slam_tpu.train import e2e

    ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    ck = _os.path.join(ROOT, "checkpoints")
    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(ck)
    ks_pair, ks_pair_params = e2e.load_flagship_subpix(ck, pair=True)
    cfg = e2e.flagship_config()
    N = cfg.frontend.max_keypoints
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    scene = synthetic.make_scene(
        num_landmarks=args.landmarks, num_frames=args.frames,
        height=H, width=W, desc_dim=cfg.frontend.descriptor_dim,
        seed=args.seed, motion=args.motion)

    params = fused.FusedParams(sp=sp_params, lg=lg_params,
                               ks=ks_pair_params)
    # raw: no refinement at all (centroid disabled via subpix_source trick
    # is intrusive; instead extract with centroid and also recompute raw
    # via the net's integer peaks — approximate raw by rounding)
    ex = jax.jit(fused.build_extract_fn(cfg, sp, subpix_head=ks_pair))

    def lg_match(kp0, d0, v0, kp1, d1, v1):
        kn0 = normalize_keypoints(kp0, H, W)
        kn1 = normalize_keypoints(kp1, H, W)
        f0, f1, z0, z1 = lg.apply(lg_params, d0, d1, kn0, kn1, v0, v1,
                                  return_features=True)
        mo = fused_assignment(f0, f1, z0, z1, v0, v1,
                              1.0 / float(lg.dim) ** 0.5, 0.0)
        return mo.matches0, mo.mscores0

    lg_match = jax.jit(lg_match)

    imgs = np.stack([synthetic.render_frame(scene, i, max_keypoints=N)
                     for i in range(args.frames)]).astype(np.float32)
    kp_b, d_b, v_b, pat_b = ex(params, jnp.asarray(imgs))
    kp_b, v_b = np.asarray(kp_b), np.asarray(v_b)

    obs = [synthetic.observe_frame(scene, i, max_keypoints=N)
           for i in range(args.frames)]
    # full (unpadded) GT projections for nearest-neighbour truth
    gt_all = []
    for i in range(args.frames):
        R, t = scene.poses_R[i], scene.poses_t[i]
        pc = scene.landmarks @ R.T + t
        z = pc[:, 2]
        uv = np.where(z[:, None] > 0.5, pc[:, :2] / np.maximum(
            z[:, None], 0.5), -1e6)
        uv = uv * [scene.K[0, 0], scene.K[1, 1]] + [scene.K[0, 2],
                                                    scene.K[1, 2]]
        okz = (z > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        gt_all.append((uv, okz))

    print("== per-frame detection error (centroid-prologue extract) ==")
    lids = []
    for i in range(args.frames):
        uv, okz = gt_all[i]
        dist, lid = nearest_gt(kp_b[i], v_b[i], uv, okz)
        lids.append(np.where(dist < 2.0, lid, -1))
        print(f"f{i}: {pct(dist, v_b[i])}   "
              f"(>1px: {np.mean(dist[v_b[i]] > 1.0):.1%}, "
              f">2px: {np.mean(dist[v_b[i]] > 2.0):.1%})")

    print("== pair-refined error + matcher identity, consecutive pairs ==")
    for i in range(args.frames - 1):
        m0, ms0 = lg_match(jnp.asarray(kp_b[i]), d_b[i],
                           jnp.asarray(v_b[i]),
                           jnp.asarray(kp_b[i + 1]), d_b[i + 1],
                           jnp.asarray(v_b[i + 1]))
        m0, ms0 = np.asarray(m0), np.asarray(ms0)
        # identity correctness vs score threshold (the reference gates at
        # 0.7, slam_types.cpp match_thr)
        l0 = lids[i]
        l1 = lids[i + 1]
        line = f"pair {i}->{i+1}:"
        for thr in (0.4, 0.6, 0.7, 0.8, 0.9):
            g = (m0 >= 0) & (ms0 > thr) & v_b[i]
            mi = np.where(g, m0, 0)
            same = (l0 >= 0) & (l1[mi] == l0) & g
            line += (f"  thr{thr}: {g.sum():4d}m "
                     f"{same.sum()/max(g.sum(),1):.1%}")
        print(line)
        good = (m0 >= 0) & (ms0 > cfg.frontend.match_threshold) & v_b[i]
        # pair-refined current keypoints
        pairf = jnp.asarray(good)
        kref = subpix_mod.pair_refine_scatter(
            ks_pair, ks_pair_params, pat_b[i], pat_b[i + 1],
            d_b[i], d_b[i + 1], jnp.asarray(kp_b[i + 1]),
            jnp.asarray(m0), jnp.asarray(ms0), pairf)
        kref = np.asarray(kref)
        uv, okz = gt_all[i + 1]
        # error of the refined CURRENT keypoint of each good match
        rows = m0[good]
        dist_r, _ = nearest_gt(kref[rows], np.ones(len(rows), bool),
                               uv, okz)
        dist_u, _ = nearest_gt(kp_b[i + 1][rows],
                               np.ones(len(rows), bool), uv, okz)
        print(f"   matched-kp err: unref {pct(dist_u, dist_u < 3)}")
        print(f"                   pair  {pct(dist_r, dist_r < 3)}")

    print("== synthetic re-observation pass (stored desc age sweep) ==")
    # Mimic reobserve.match_map_window at age g: candidate set = frame-0
    # detections (stored descriptors!) whose GT landmark projects into
    # frame g-1's pose (the pass projects at the PREV pose), matched via
    # LightGlue against frame g's real extraction. Measures whether the
    # matcher's score distribution collapses on synthetic keypoint sets —
    # the hypothesis for the map-match decay in diag_flagship.
    l0 = lids[0]
    for g in range(1, args.frames):
        uvp, okp = gt_all[g - 1]          # projections at prev pose
        keep = v_b[0] & (l0 >= 0) & okp[np.clip(l0, 0, len(okp) - 1)]
        syn_kp = np.zeros_like(kp_b[0])
        syn_kp[keep] = uvp[l0[keep]]
        m0, ms0 = lg_match(jnp.asarray(syn_kp), d_b[0], jnp.asarray(keep),
                           jnp.asarray(kp_b[g]), d_b[g],
                           jnp.asarray(v_b[g]))
        m0, ms0 = np.asarray(m0), np.asarray(ms0)
        lg_ = lids[g]
        line = f"age {g}: cand={keep.sum():4d}"
        for thr in (0.4, 0.6, 0.7):
            gd = (m0 >= 0) & (ms0 > thr) & keep
            mi = np.where(gd, m0, 0)
            same = (l0 >= 0) & (lg_[mi] == l0) & gd
            line += (f"  thr{thr}: {gd.sum():4d}m "
                     f"{same.sum()/max(gd.sum(),1):.1%}")
        print(line)


if __name__ == "__main__":
    main()
