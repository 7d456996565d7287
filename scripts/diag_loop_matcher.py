"""Does the learned matcher recover TRUE archive->frame pairs at the revisit?

diag_loopdetect_learned.py established the gate: visible archive healthy,
matcher hits ~0. This script isolates the matcher call: at the last frames of
the circle it (1) finds GROUND-TRUTH archive->current-keypoint pairs (project
archived points under the GT pose, nearest current keypoint within 3 px),
(2) runs the exact detection matcher on the synthetic archive set, and
(3) reports how many GT pairs exist, how many the matcher recovers, and the
score distribution — separating "no true pairs in frame" from "matcher
fails" from "scores below threshold".

  python scripts/diag_loop_matcher.py --frames 360
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=360)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--stop", type=int, default=352)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import assignment as assignment_ops
    from gl_slam_tpu.slam import fused
    from gl_slam_tpu.slam.chunk_driver import ChunkedPipeline
    from gl_slam_tpu.train import e2e

    n = args.frames
    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    D = cfg.frontend.descriptor_dim
    N = cfg.frontend.max_keypoints
    scene = synthetic.make_scene(num_landmarks=max(20000, n * 170),
                                 num_frames=n, height=H, width=W,
                                 desc_dim=D, seed=args.seed, motion="loop")
    cfg = dataclasses.replace(cfg, map=dataclasses.replace(
        cfg.map, max_keyframes=max(512, 1 << (n - 1).bit_length())))
    cache = _os.path.join("/tmp", f"render_loop_{args.seed}_{n}_{H}x{W}.npy")
    stack = np.load(cache)

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    ks_head, ks_params = e2e.load_flagship_subpix(
        _os.path.join(ROOT, "checkpoints"), pair=True)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    K = jnp.asarray(scene.K, jnp.float32)
    pipe = ChunkedPipeline(cfg, K, sp, lg, params, chunk=args.chunk,
                           ba_every=8, subpix_head=ks_head)
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap_from_images(stack[0], stack[1],
                               float(np.linalg.norm(c1 - c0)))
    all_imgs = jnp.asarray(stack[2:n])
    start = 2
    while start + args.chunk <= min(args.stop, n):
        imgs = jax.lax.dynamic_slice_in_dim(all_imgs, start - 2, args.chunk)
        pipe.track_chunk(imgs, start)
        start += args.chunk
    pipe.finish()
    fi = start - 1
    st = pipe.state
    m = st.map
    cur_kf = int(m.num_kf)
    rt = cfg.runtime
    print(f"stopped at frame {fi}, kf={cur_kf}")

    # ---- GT pairs: archived visible points -> current keypoints ---------
    valid = np.asarray(m.pts_valid)
    bad = np.asarray(m.pts_bad)
    last = np.asarray(m.pts_last_kf)
    old = valid & ~bad & (last < cur_kf - rt.loop_min_gap) & (last >= 0)
    pts = np.asarray(m.pts_xyz, np.float64)
    Km = scene.K

    def project(Rm, tm):
        pc = pts @ Rm.T + tm
        z = pc[:, 2]
        uv = np.zeros((len(z), 2))
        okz = z > 0.5
        uv[okz] = pc[okz, :2] / z[okz, None] * [Km[0, 0], Km[1, 1]] \
            + [Km[0, 2], Km[1, 2]]
        inim = okz & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        return uv, inim

    Rg, tg = scene.poses_R[fi], scene.poses_t[fi]
    uv_gt, in_gt = project(Rg, tg)
    R_est = np.asarray(st.R_cur, np.float64)
    t_est = np.asarray(st.t_cur, np.float64)
    uv_est, in_est = project(R_est, t_est)
    vis_gt = old & in_gt
    vis_est = old & in_est
    kp = np.asarray(st.prev_kpts, np.float64)
    kv = np.asarray(st.prev_valid)
    ids_vis = np.nonzero(vis_gt)[0]
    true_pair = {}
    for p in ids_vis:
        d = np.linalg.norm(kp[kv] - uv_gt[p], axis=1)
        j = int(d.argmin())
        if d[j] < 3.0:
            true_pair[p] = np.nonzero(kv)[0][j]
    print(f"archived={int(old.sum())} vis_gt={int(vis_gt.sum())} "
          f"vis_est={int(vis_est.sum())} "
          f"true_pairs_in_frame={len(true_pair)}")
    if not true_pair:
        print("NO true pairs — detection cannot succeed; visibility is "
              "the premise that fails")
        return

    # ---- run the exact detection matcher --------------------------------
    from gl_slam_tpu.ops import select as select_ops
    M = N
    ids, cmask = select_ops.select_newest_ids(
        jnp.asarray(vis_est), M)
    idc = np.asarray(jnp.clip(ids, 0, m.capacity_pts - 1))
    uv0 = jnp.asarray(uv_est[idc], jnp.float32)
    desc0 = jnp.asarray(np.asarray(m.pts_desc)[idc]).astype(
        st.prev_desc.dtype)
    kn0 = normalize_keypoints(uv0, H, W)
    kn1 = normalize_keypoints(st.prev_kpts, H, W)
    with jax.default_matmul_precision("default"):
        f0, f1, z0, z1 = lg.apply(lg_params, desc0, st.prev_desc,
                                  kn0, kn1, cmask, st.prev_valid,
                                  return_features=True)
        mo = assignment_ops.fused_assignment(
            f0, f1, z0, z1, cmask, st.prev_valid,
            1.0 / float(lg.dim) ** 0.5, 0.0)
    m0 = np.asarray(mo.matches0)
    sc = np.asarray(mo.mscores0, np.float64)
    cm = np.asarray(cmask)
    # how many selected candidates are GT-pairable, and what does the
    # matcher do on them?
    sel_true = []          # (slot_in_candidates, gt_kp_row)
    for ci, p in enumerate(idc):
        if cm[ci] and p in true_pair:
            sel_true.append((ci, true_pair[p]))
    agree = sum(1 for ci, j in sel_true if m0[ci] == j)
    matched = sum(1 for ci, j in sel_true if m0[ci] >= 0)
    thr = cfg.frontend.map_match_threshold
    sc_true = np.array([sc[ci] for ci, _ in sel_true])
    n_match_any = int((m0[cm] >= 0).sum())
    sc_any = sc[cm][m0[cm] >= 0]
    pr = lambda a: np.percentile(a, [10, 50, 90]).round(3) if len(a) \
        else "-"
    print(f"candidates={int(cm.sum())} with_true_pair={len(sel_true)} "
          f"matcher_matched_any={n_match_any} "
          f"true_matched={matched} true_AGREE={agree}")
    print(f"scores on true-pair rows [p10,p50,p90]={pr(sc_true)} "
          f"scores on any-match rows={pr(sc_any)} thr={thr}")
    # est-pose projection error on the true pairs (positional prior error)
    errs = [np.linalg.norm(uv_est[p] - uv_gt[p])
            for p in true_pair if in_est[p]]
    print(f"proj est-vs-gt err on true pairs [p10,p50,p90]="
          f"{pr(np.array(errs))} px  (n={len(errs)})")
    probe_restricted(lg, lg_params, m, st, cfg, vis_est, uv_est, true_pair,
                     restrict_to_true=True)
    probe_restricted(lg, lg_params, m, st, cfg, vis_est, uv_est, true_pair,
                     restrict_to_true=False, cap=512)




def probe_restricted(lg, lg_params, m, st, cfg, vis_est, uv_est, true_pair,
                     restrict_to_true=True, cap=None):
    """Re-run the matcher with a restricted/capped candidate set."""
    import jax
    import jax.numpy as jnp
    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import assignment as assignment_ops
    H = cfg.frontend.image_height
    W = cfg.frontend.image_width
    N = st.prev_kpts.shape[0]
    sel = np.zeros(m.capacity_pts, bool)
    if restrict_to_true:
        sel[list(true_pair.keys())] = True
    else:
        sel = vis_est.copy()
    ids = np.nonzero(sel)[0]
    if cap is not None:
        ids = ids[:cap]
    Mpad = N
    idc = np.zeros(Mpad, np.int64)
    idc[:len(ids)] = ids
    cm = np.zeros(Mpad, bool)
    cm[:len(ids)] = True
    uv0 = jnp.asarray(uv_est[idc], jnp.float32)
    desc0 = jnp.asarray(np.asarray(m.pts_desc)[idc]).astype(
        st.prev_desc.dtype)
    kn0 = normalize_keypoints(uv0, H, W)
    kn1 = normalize_keypoints(st.prev_kpts, H, W)
    with jax.default_matmul_precision("default"):
        f0, f1, z0, z1 = lg.apply(lg_params, desc0, st.prev_desc,
                                  kn0, kn1, jnp.asarray(cm), st.prev_valid,
                                  return_features=True)
        mo = assignment_ops.fused_assignment(
            f0, f1, z0, z1, jnp.asarray(cm), st.prev_valid,
            1.0 / float(lg.dim) ** 0.5, 0.0)
    m0 = np.asarray(mo.matches0)
    sc = np.asarray(mo.mscores0, np.float64)
    agree = sum(1 for ci in range(len(ids))
                if idc[ci] in true_pair and m0[ci] == true_pair[idc[ci]])
    matched = int((m0[:len(ids)] >= 0).sum())
    sc_t = np.array([sc[ci] for ci in range(len(ids))
                     if idc[ci] in true_pair])
    pr = lambda a: np.percentile(a, [10, 50, 90]).round(3) if len(a) \
        else "-"
    print(f"restricted probe: cands={len(ids)} matched_any={matched} "
          f"AGREE={agree} scores_true={pr(sc_t)}")


if __name__ == "__main__":
    main()
