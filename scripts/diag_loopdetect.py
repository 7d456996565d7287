"""Why doesn't loop detection fire on the circle revisit? (round 4)

Replays the loop-closure A/B scene through the chunked flagship pipeline
(loop closing OFF), then at each probe frame rebuilds detect_loop's
intermediate quantities — old-point pool size, descriptor hits, keyframe
vote histogram, consistency fraction, PnP inliers — so the failing gate is
visible directly.

  python scripts/diag_loopdetect.py --frames 360
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
    ap.add_argument("--probe-every", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.slam import frontend, fused, loopclose
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
    cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
        cfg.runtime, loop_closing=False))
    cache = _os.path.join("/tmp", f"render_loop_{args.seed}_{n}_{H}x{W}.npy")
    if _os.path.exists(cache):
        stack = np.load(cache)
    else:
        stack = np.stack([
            synthetic.render_frame(scene, i, max_keypoints=N)
            for i in range(n)]).astype(np.float32)
        np.save(cache, stack)

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    ks = e2e.load_flagship_subpix(_os.path.join(ROOT, "checkpoints"),
                                  pair=True)
    ks_head, ks_params = ks
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
    rt = cfg.runtime
    while start + args.chunk <= n:
        imgs = jax.lax.dynamic_slice_in_dim(all_imgs, start - 2, args.chunk)
        pipe.track_chunk(imgs, start)
        if (start + args.chunk) % args.probe_every < args.chunk:
            st = pipe.state
            m = st.map
            cur_kf = int(m.num_kf)
            f = frontend.FrameFeatures(
                kpts=st.prev_kpts, desc=st.prev_desc, valid=st.prev_valid,
                frame_idx=jnp.asarray(start + args.chunk - 1, jnp.int32))
            # --- detect_loop internals, on host ------------------------
            Pmax = m.capacity_pts
            valid = np.asarray(m.pts_valid)
            bad = np.asarray(m.pts_bad)
            last = np.asarray(m.pts_last_kf)
            old = valid & ~bad & (last < cur_kf - rt.loop_min_gap) \
                & (last >= 0)
            stride = max(Pmax // 8192, 1)
            cand = np.arange(0, Pmax, stride)[:8192]
            cmask = old[cand]
            desc = jnp.asarray(np.asarray(m.pts_desc)[cand]).astype(
                st.prev_desc.dtype)
            mm = match_ops.mutual_nn_match(
                desc, jnp.asarray(cmask), f.desc, f.valid,
                min_score=cfg.frontend.map_match_threshold)
            hit = np.asarray(mm.matches0) >= 0
            votes_kf = np.where(hit, last[cand], -1)
            hist = np.bincount(votes_kf[votes_kf >= 0],
                               minlength=m.capacity_kf)
            top_kf = int(hist.argmax()) if hist.sum() else -1
            # Region-vote internals (mirror of the new detect_loop)
            rr = rt.loop_region_radius
            ker = np.ones(2 * rr + 1)
            region = np.convolve(hist, ker, mode="same")
            pool_hist = np.bincount(last[cand][cmask],
                                    minlength=m.capacity_kf) \
                if cmask.any() else np.zeros(m.capacity_kf)
            pool_reg = np.convolve(pool_hist, ker, mode="same")
            rate = region / np.maximum(pool_reg, 16.0)
            elig = np.zeros_like(rate, dtype=bool)
            elig[:max(cur_kf - rt.loop_min_gap, 0)] = True
            rate = np.where(elig & (region >= rt.loop_min_votes),
                            rate, -1.0)
            reg_kf = int(rate.argmax())
            reg_votes = int(region[reg_kf])
            in_reg = hit & (np.abs(votes_kf - reg_kf) <= rr)
            v60 = int(hist[:60].sum())
            p60 = int(pool_hist[:60].sum())
            r60 = float(rate[:60].max()) if len(rate) > 60 else -1.0
            rbest = float(rate[reg_kf])
            # GT check: of the hits voting for kf<60 (the start region),
            # how many are geometrically genuine (reproject within 3 px
            # under the GROUND-TRUTH current pose)?
            fi_cur = start + args.chunk - 1
            Rg = scene.poses_R[fi_cur]
            tg = scene.poses_t[fi_cur]
            sel = hit & (votes_kf >= 0)
            n_gen3 = 0
            gen_q = "-"
            if sel.any():
                pts_sel = np.asarray(m.pts_xyz)[cand][sel].astype(
                    np.float64)
                uv_sel = np.asarray(st.prev_kpts)[
                    np.asarray(mm.matches0)[sel]].astype(np.float64)
                pc = pts_sel @ Rg.T + tg
                z = np.maximum(pc[:, 2], 1e-6)
                uvp = pc[:, :2] / z[:, None]
                Km = scene.K
                uvp = uvp * [Km[0, 0], Km[1, 1]] + [Km[0, 2], Km[1, 2]]
                err = np.linalg.norm(uvp - uv_sel, axis=1)
                gen = (pc[:, 2] > 0) & (err < 20.0)
                n_gen3 = int(((pc[:, 2] > 0) & (err < 5.0)).sum())
                n_gen20 = int(gen.sum())
                if n_gen20:
                    vk = votes_kf[sel][gen]
                    gen_q = (f"{n_gen20}"
                             f"[{int(np.percentile(vk, 5))},"
                             f"{int(np.median(vk))},"
                             f"{int(np.percentile(vk, 95))}]")
                # Visibility premise: how many POOL candidates project
                # in-image under the GT pose (are physically re-visible)?
                pts_pool = np.asarray(m.pts_xyz)[cand][cmask].astype(
                    np.float64)
                pcp = pts_pool @ Rg.T + tg
                zp = pcp[:, 2]
                okf = zp > 0.5
                uvq = np.zeros((len(zp), 2))
                uvq[okf] = pcp[okf, :2] / zp[okf, None] \
                    * [Km[0, 0], Km[1, 1]] + [Km[0, 2], Km[1, 2]]
                n_vis = int((okf & (uvq[:, 0] >= 0)
                             & (uvq[:, 0] < scene.width)
                             & (uvq[:, 1] >= 0)
                             & (uvq[:, 1] < scene.height)).sum())
                gen_q += f" vis={n_vis}"
            n_obs_start = int(((last >= 0) & (last < 60) & valid
                               & ~bad).sum())
            det = loopclose.detect_loop(cfg, K, m, f,
                                        jax.random.PRNGKey(start),
                                        min_gap=rt.loop_min_gap)
            print(f"f{start + args.chunk - 1:4d} kf={cur_kf:4d} "
                  f"old_pool={int(old.sum()):6d} "
                  f"hits={int(hit.sum()):4d} "
                  f"reg_kf={reg_kf:4d} reg_votes={reg_votes:4d} "
                  f"in_reg={int(in_reg.sum()):4d} "
                  f"start_alive={n_obs_start:5d} "
                  f"v60={v60:4d} p60={p60:5d} r60={r60:5.2f} "
                  f"rb={rbest:5.2f} gen3={n_gen3:4d} gq={gen_q:>24s} "
                  f"det_ok={int(np.asarray(det.ok))} "
                  f"lkf={int(np.asarray(det.loop_kf)):4d} "
                  f"pnp_inl={int(np.asarray(det.num_inliers)):4d} "
                  f"free={int(np.asarray(m.free_count)):6d}",
                  flush=True)
        start += args.chunk
    pipe.finish()

    # ---- Final deep dive: TRUE-PAIR descriptor similarity ----------------
    # For every VISIBLE archived candidate at the last frame, find the
    # nearest current keypoint to its projection (under the ESTIMATED
    # pose) and report the cosine between its stored descriptor and that
    # keypoint's descriptor. Junk-dominated matching with visible archives
    # means either (a) true-pair cosines are low (stored descriptors don't
    # transfer across the revisit gap) or (b) cosines are high but beaten
    # by crowding — this separates the two.
    st = pipe.state
    m = st.map
    cur_kf = int(m.num_kf)
    fi_cur = start + 1
    valid = np.asarray(m.pts_valid)
    bad = np.asarray(m.pts_bad)
    last = np.asarray(m.pts_last_kf)
    old = valid & ~bad & (last < cur_kf - rt.loop_min_gap) & (last >= 0)
    R_est = np.asarray(m.kf_R[cur_kf - 1], np.float64)
    t_est = np.asarray(m.kf_t[cur_kf - 1], np.float64)
    pts = np.asarray(m.pts_xyz, np.float64)
    pc = pts @ R_est.T + t_est
    z = pc[:, 2]
    okf = z > 0.5
    Km = scene.K
    uvp = np.zeros((len(z), 2))
    uvp[okf] = pc[okf, :2] / z[okf, None] * [Km[0, 0], Km[1, 1]] \
        + [Km[0, 2], Km[1, 2]]
    vis = old & okf & (uvp[:, 0] >= 0) & (uvp[:, 0] < scene.width) \
        & (uvp[:, 1] >= 0) & (uvp[:, 1] < scene.height)
    ids = np.nonzero(vis)[0]
    kp = np.asarray(st.prev_kpts, np.float64)
    kv = np.asarray(st.prev_valid)
    desc_cur = np.asarray(st.prev_desc, np.float64)
    desc_map = np.asarray(m.pts_desc, np.float64)
    sel = ids[:400]
    dm = desc_map[sel]
    dm = dm / np.maximum(np.linalg.norm(dm, axis=1, keepdims=True), 1e-9)
    dc = desc_cur.copy()
    dc[~kv] = 0.0
    dc = dc / np.maximum(np.linalg.norm(dc, axis=1, keepdims=True), 1e-9)
    simall = dm @ dc.T                                   # (S, N)
    maxcos = simall.max(axis=1)
    # Cosine against the co-located FRESH duplicate (nearest live
    # non-archived point within 1 m in 3D): tests whether the descriptor
    # pipeline is self-consistent over time for the same landmark.
    fresh = valid & ~bad & ~old
    fids = np.nonzero(fresh)[0]
    fpts = pts[fids]
    dup_cos = []
    for si, p in enumerate(sel):
        d3 = np.linalg.norm(fpts - pts[p], axis=1)
        q = int(d3.argmin())
        if d3[q] < 1.0:
            dq = desc_map[fids[q]]
            dq = dq / max(np.linalg.norm(dq), 1e-9)
            dup_cos.append(float(dm[si] @ dq))
    dup_cos = np.array(dup_cos)
    pr = lambda a: np.percentile(a, [10, 50, 90]).round(3) if len(a) else "-"
    print(f"deep-dive f{fi_cur}: visible_archived={len(ids)} "
          f"maxcos_vs_frame[p10,p50,p90]={pr(maxcos)} "
          f"n_maxcos>0.8={int((maxcos > 0.8).sum())} "
          f"dup3d_cos[p10,p50,p90]={pr(dup_cos)} n_dup={len(dup_cos)}",
          flush=True)


if __name__ == "__main__":
    main()
