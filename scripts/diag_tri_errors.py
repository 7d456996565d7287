"""Isolate flagship triangulation-gate failures (VERDICT r2 item 2).

The flagship eval starves: ~zero new-point candidates survive the 0.5 px
triangulation reprojection gate (scripts/diag_flagship.py shows reprj=0
from frame ~5). This script separates the two possible causes on ONE
consecutive frame pair:

  * detection/sub-pixel noise — triangulate with GROUND-TRUTH poses, so the
    residual distribution reflects keypoint error only;
  * pose error — triangulate the same matches with the essential-estimated
    pose and compare.

Prints reprojection-error quantiles for subpix modes pair/centroid.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=101)
    ap.add_argument("--landmarks", type=int, default=20000)
    ap.add_argument("--frames", type=int, nargs=2, default=[10, 11])
    ap.add_argument("--motion", default="forward_turn")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.geometry import essential as ess_mod
    from gl_slam_tpu.geometry import triangulation
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models import subpix as subpix_mod
    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.ops.assignment import fused_assignment
    from gl_slam_tpu.slam import fused
    from gl_slam_tpu.train import e2e

    ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    ks_head, ks_params = e2e.load_flagship_subpix(
        _os.path.join(ROOT, "checkpoints"), pair=True)
    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    N = cfg.frontend.max_keypoints

    scene = synthetic.make_scene(
        num_landmarks=args.landmarks, num_frames=max(args.frames) + 1,
        height=H, width=W, desc_dim=cfg.frontend.descriptor_dim,
        seed=args.seed, motion=args.motion)
    K = jnp.asarray(scene.K, jnp.float32)
    i0, i1 = args.frames
    imgs = jnp.asarray(np.stack([
        synthetic.render_frame(scene, i0, max_keypoints=N),
        synthetic.render_frame(scene, i1, max_keypoints=N)]).astype(
            np.float32))

    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    extract = jax.jit(fused.build_extract_fn(cfg, sp, subpix_head=ks_head))
    kp_b, d_b, v_b, pat_b = extract(params, imgs)

    @jax.jit
    def match_pair(kp0, d0, v0, kp1, d1, v1):
        kn0 = normalize_keypoints(kp0, H, W)
        kn1 = normalize_keypoints(kp1, H, W)
        f0, f1, z0, z1 = lg.apply(lg_params, d0, d1, kn0, kn1, v0, v1,
                                  return_features=True)
        mo = fused_assignment(f0, f1, z0, z1, v0, v1,
                              1.0 / float(lg.dim) ** 0.5, 0.0)
        return match_ops.MatchResult(matches0=mo.matches0,
                                     mscores0=mo.mscores0)

    m = match_pair(kp_b[0], d_b[0], v_b[0], kp_b[1], d_b[1], v_b[1])
    pair = match_ops.score_filter(m.matches0, m.mscores0,
                                  cfg.frontend.match_threshold)

    @jax.jit
    def refine(kp1):
        pf = match_ops.score_filter(m.matches0, m.mscores0,
                                    cfg.frontend.match_threshold)
        return subpix_mod.pair_refine_scatter(
            ks_head, ks_params, pat_b[0], pat_b[1], d_b[0], d_b[1], kp1,
            m.matches0, m.mscores0, pf)

    R0 = jnp.asarray(scene.poses_R[i0], jnp.float32)
    t0 = jnp.asarray(scene.poses_t[i0], jnp.float32)
    R1 = jnp.asarray(scene.poses_R[i1], jnp.float32)
    t1 = jnp.asarray(scene.poses_t[i1], jnp.float32)

    def tri_stats(kp1, label):
        uv0, uv1, pf = match_ops.gather_matched(kp_b[0], kp1, m.matches0,
                                                pair)
        tri = triangulation.triangulate(
            K, R0, t0, R1, t1, uv0, uv1, mask=pf,
            max_depth=cfg.geometry.max_depth,
            max_reproj_px=1e9,
            min_parallax_deg=cfg.geometry.min_parallax_deg)
        errs = np.asarray(tri.errors)
        ok = np.asarray(pf) & np.isfinite(errs)
        e = errs[ok]
        q = np.percentile(e, [10, 25, 50, 75, 90, 99])
        print(f"{label}: n={ok.sum()} err q10/25/50/75/90/99 = "
              + "/".join(f"{v:.3f}" for v in q)
              + f"  <=0.5px: {(e <= 0.5).mean():.3f}"
              + f"  <=1.0px: {(e <= 1.0).mean():.3f}"
              + f"  <=2.0px: {(e <= 2.0).mean():.3f}")
        # survived tri.valid with the real gate for reference
        return tri

    print(f"pair {i0}->{i1}, matches={int(np.asarray(pair).sum())}")
    tri_stats(kp_b[1], "GT-pose, centroid-refined kpts")
    kp1r = refine(kp_b[1])
    tri_stats(kp1r, "GT-pose, pair-subpix kpts     ")

    # --- classify matches by GT identity + detection-tail membership ------
    def label(kps, valid, frame):
        o = synthetic.observe_frame(scene, frame, max_keypoints=N)
        gt = o.keypoints[o.valid]
        ids = o.landmark_ids[o.valid]
        d = np.linalg.norm(np.asarray(kps)[:, None, :] - gt[None], axis=-1)
        j = np.argmin(d, axis=1)
        return ids[j], d[np.arange(len(kps)), j]

    lid0, d0n = label(kp_b[0], v_b[0], i0)
    lid1, d1n = label(kp1r, v_b[1], i1)
    mi = np.asarray(m.matches0)
    pf = np.asarray(pair)
    j1 = np.clip(mi, 0, N - 1)
    same_id = pf & (lid0 == lid1[j1])
    clean = same_id & (d0n < 0.3) & (d1n[j1] < 0.3)
    tail = same_id & ~clean
    wrong = pf & ~same_id
    print(f"match classes: correct-id {same_id.sum()} "
          f"(clean {clean.sum()}, tail {tail.sum()}), wrong-id {wrong.sum()}")
    uv0, uv1, _ = match_ops.gather_matched(kp_b[0], kp1r, m.matches0, pair)
    tri = triangulation.triangulate(
        K, R0, t0, R1, t1, uv0, uv1, mask=jnp.asarray(pf),
        max_depth=cfg.geometry.max_depth, max_reproj_px=1e9,
        min_parallax_deg=0.0)
    errs = np.asarray(tri.errors)
    for name, msk in (("clean", clean), ("tail", tail), ("wrong", wrong)):
        e = errs[msk & np.isfinite(errs)]
        if len(e) == 0:
            print(f"  {name}: none")
            continue
        q = np.percentile(e, [25, 50, 90])
        print(f"  {name}: n={len(e)} tri-err q25/50/90 = "
              + "/".join(f"{v:.3f}" for v in q))

    # Essential-estimated pose on the refined keypoints
    uv0, uv1, pf = match_ops.gather_matched(kp_b[0], kp1r, m.matches0, pair)
    ess = ess_mod.estimate_essential(
        K, uv0, uv1, pf, jax.random.PRNGKey(0),
        threshold_px=cfg.geometry.essential_threshold_px,
        num_hypotheses=cfg.geometry.essential_hypotheses,
        refine_iters=cfg.geometry.essential_refine_iters)
    # chain onto GT pose of frame i0, translation scaled by GT magnitude
    c0 = -scene.poses_R[i0].T @ scene.poses_t[i0]
    c1 = -scene.poses_R[i1].T @ scene.poses_t[i1]
    scale = float(np.linalg.norm(c1 - c0))
    R1e = ess.R @ R0
    t1e = ess.R @ t0 + ess.t * scale
    # GT relative for comparison
    R_rel_gt = scene.poses_R[i1] @ scene.poses_R[i0].T
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(ess.R).T @ R_rel_gt) - 1) / 2, -1, 1)))
    t_rel_gt = np.asarray(scene.poses_t[i1] - R_rel_gt @ scene.poses_t[i0])
    t_dir_gt = t_rel_gt / np.linalg.norm(t_rel_gt)
    t_err = np.degrees(np.arccos(np.clip(
        np.abs(np.dot(np.asarray(ess.t), t_dir_gt)), -1, 1)))
    print(f"essential: inliers={int(ess.num_inliers)} rot_err={rot_err:.3f}deg "
          f"t_dir_err={t_err:.3f}deg")

    tri = triangulation.triangulate(
        K, R0, t0, R1e, t1e, uv0, uv1, mask=pf,
        max_depth=cfg.geometry.max_depth, max_reproj_px=1e9,
        min_parallax_deg=cfg.geometry.min_parallax_deg)
    errs = np.asarray(tri.errors)
    ok = np.asarray(pf) & np.isfinite(errs)
    e = errs[ok]
    q = np.percentile(e, [10, 25, 50, 75, 90, 99])
    print("est-pose, pair-subpix kpts     : n=%d err q10/25/50/75/90/99 = %s"
          "  <=0.5px: %.3f  <=1.0px: %.3f  <=2.0px: %.3f"
          % (ok.sum(), "/".join(f"{v:.3f}" for v in q),
             (e <= 0.5).mean(), (e <= 1.0).mean(), (e <= 2.0).mean()))


if __name__ == "__main__":
    main()
