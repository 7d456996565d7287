"""Diagnose long-run drift: per-frame tracking stats + GT error growth.

Runs the learned chunked pipeline over a long rendered sequence and dumps a
per-frame table (matches, map matches, new points, pose cost, frame_ok,
translation error vs GT) to find where drift sets in."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import argparse
import dataclasses
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--reobs", choices=["lightglue", "nn"],
                    default="lightglue")
    ap.add_argument("--every", type=int, default=10,
                    help="print every Nth frame")
    ap.add_argument("--ba-every", type=int, default=5)
    ap.add_argument("--tri-px", type=float, default=None,
                    help="override steady-state triangulation reproj gate")
    ap.add_argument("--max-depth", type=float, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gl_slam_tpu.config import MapConfig
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam import ba as ba_mod
    from gl_slam_tpu.slam import frontend, fused
    from gl_slam_tpu.train import e2e

    sp, sp_params, lg, lg_params = e2e.load_tiny_frontend("checkpoints")
    H, W, N = 240, 320, 128
    D = e2e.TINY_DESC_DIM
    n = args.frames
    scene = synthetic.make_scene(
        num_landmarks=max(900, (n + 120) * 8), num_frames=n,
        height=H, width=W, desc_dim=D, seed=11, min_depth=6.0)
    cfg = e2e.micro_config(H, W, N, D)
    cfg = dataclasses.replace(cfg, map=MapConfig(
        max_keyframes=max(128, 1 << (n - 1).bit_length()),
        max_points=max(16384, n * 96),
        covis_max_points=256, covis_edge_threshold=10))
    if args.reobs == "nn":
        cfg = dataclasses.replace(cfg, frontend=dataclasses.replace(
            cfg.frontend, reobs_matcher="mutual_nn"))
    g = cfg.geometry
    if args.tri_px is not None:
        g = dataclasses.replace(g, triangulation_reproj_px=args.tri_px)
    if args.max_depth is not None:
        g = dataclasses.replace(g, max_depth=args.max_depth)
    cfg = dataclasses.replace(cfg, geometry=g)

    K = jnp.asarray(scene.K, jnp.float32)
    chunk = 5
    params = fused.FusedParams(sp=sp_params, lg=lg_params)
    chunk_fn = fused.build_chunk_fn(cfg, sp, lg, K, chunk)

    # Bootstrap identical to e2e harness
    import gl_slam_tpu.train.e2e as _e
    from gl_slam_tpu.models.lightglue import assignment, normalize_keypoints
    from gl_slam_tpu.models.subpix import centroid_refine
    from gl_slam_tpu.models.superpoint import sample_descriptors
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.ops import nms as nms_ops

    def extract(i):
        img = jnp.asarray(synthetic.render_frame(scene, i, max_keypoints=N),
                          jnp.float32)
        heat, grid = sp.apply(sp_params, img[None, ..., None])
        kp, sc, v = nms_ops.detect_keypoints(
            heat, N, cfg.frontend.score_threshold, cfg.frontend.nms_radius)
        kp = kp[0].astype(jnp.float32)
        kp = centroid_refine(img, kp, cfg.frontend.subpix_patch)
        return frontend.FrameFeatures(
            kpts=kp, desc=sample_descriptors(grid[0], kp), valid=v[0],
            frame_idx=jnp.asarray(i, jnp.int32))

    def lg_match(f0, f1):
        kn0 = normalize_keypoints(f0.kpts, H, W)
        kn1 = normalize_keypoints(f1.kpts, H, W)
        sim, z0, z1 = lg.apply(lg_params, f0.desc, f1.desc, kn0, kn1,
                               f0.valid, f1.valid)
        mo = assignment(sim, z0, z1, f0.valid, f1.valid, 0.0)
        return match_ops.MatchResult(matches0=mo.matches0,
                                     mscores0=mo.mscores0)

    f0, f1 = extract(0), extract(1)
    st = frontend.init_track_state(cfg, jax.random.PRNGKey(0))
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    st, _ = frontend.bootstrap_step(
        cfg, K, st, f0, f1,
        jnp.asarray(float(np.linalg.norm(c1 - c0)), jnp.float32),
        matches=lg_match(f0, f1))

    all_imgs = np.stack([
        synthetic.render_frame(scene, i, max_keypoints=N)
        for i in range(2, n)]).astype(np.float32)

    print("frame  ok match map  new  cost   |t_err|  step_ratio",
          flush=True)
    prev_c = -np.asarray(st.R_cur).T @ np.asarray(st.t_cur)
    kf_at_last_ba = 2
    n_ba = 0
    start = 2
    rows = []
    while start + chunk <= n:
        imgs = jnp.asarray(all_imgs[start - 2:start - 2 + chunk])
        st, outs = chunk_fn(params, st, imgs, jnp.asarray(start, jnp.int32))
        R = np.asarray(outs.R); t = np.asarray(outs.t)
        ok = np.asarray(outs.frame_ok)
        nm = np.asarray(outs.num_matches)
        nmap = np.asarray(outs.num_map_matches)
        nnew = np.asarray(outs.num_new_points)
        cost = np.asarray(outs.pose_cost)
        for j in range(chunk):
            i = start + j
            c_est = -R[j].T @ t[j]
            c_prev = (-R[j - 1].T @ t[j - 1]) if j > 0 else prev_c
            c_gt = -scene.poses_R[i].T @ scene.poses_t[i]
            c_prev_gt = -scene.poses_R[i - 1].T @ scene.poses_t[i - 1]
            step_gt = np.linalg.norm(c_gt - c_prev_gt)
            step_est = np.linalg.norm(c_est - c_prev)
            rows.append((i, ok[j], nm[j], nmap[j], nnew[j], cost[j],
                         np.linalg.norm(c_est - c_gt), step_est / step_gt))
            if i % args.every == 0:
                print(f"{i:5d} {int(ok[j]):3d} {nm[j]:5d} {nmap[j]:4d} "
                      f"{nnew[j]:4d} {cost[j]:7.1f} "
                      f"{np.linalg.norm(c_est - c_gt):8.2f} "
                      f"{step_est / step_gt:6.3f}",
                      flush=True)
        prev_c = -R[-1].T @ t[-1]
        start += chunk
        num_kf = int(st.map.num_kf)
        if num_kf - kf_at_last_ba >= args.ba_every:
            first = max(kf_at_last_ba - cfg.ba.full_ba_overlap, 0)
            new_map = ba_mod.ba_step(cfg, K, st.map,
                                     jnp.asarray(first, jnp.int32),
                                     jnp.asarray(num_kf - first, jnp.int32))
            st = st._replace(map=new_map,
                             R_cur=new_map.kf_R[num_kf - 1],
                             t_cur=new_map.kf_t[num_kf - 1])
            kf_at_last_ba = num_kf
            n_ba += 1
    print("keyframes:", int(st.map.num_kf), "points:", int(st.map.num_pts),
          "ba:", n_ba, flush=True)


if __name__ == "__main__":
    sys.exit(main())
