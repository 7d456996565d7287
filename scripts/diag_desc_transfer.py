"""Do SuperPoint descriptors transfer across the circle revisit gap?

Loads the cached 360-frame loop render, extracts features on an early
frame and a revisit frame, geometrically pairs keypoints via GT landmark
projections (no matcher involved), and reports descriptor cosines for the
same physical landmark:
  * control pair (frame 5 vs 13): short temporal gap — should be ~1.0;
  * revisit pair (frame 5 vs 350): the loop-closure gap.
If revisit cosines are high, loop detection's failure is crowding/storage;
if low, the descriptor representation itself doesn't survive the revisit.

  python scripts/diag_desc_transfer.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.slam import fused
    from gl_slam_tpu.train import e2e

    n = 360
    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    D = cfg.frontend.descriptor_dim
    N = cfg.frontend.max_keypoints
    scene = synthetic.make_scene(num_landmarks=max(20000, n * 170),
                                 num_frames=n, height=H, width=W,
                                 desc_dim=D, seed=31, motion="loop")
    cache = f"/tmp/render_loop_31_{n}_{H}x{W}.npy"
    if _os.path.exists(cache):
        stack = np.load(cache)
    else:
        stack = np.stack([
            synthetic.render_frame(scene, i, max_keypoints=N)
            for i in range(n)]).astype(np.float32)
        np.save(cache, stack)

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=None)
    fn = jax.jit(fused.build_extract_fn(cfg, sp))
    frames = [5, 13, 340, 350, 353]
    out = fn(params, jnp.asarray(stack[frames]))
    kpts, desc, valid = out[0], out[1], out[2]
    kpts = np.asarray(kpts); desc = np.asarray(desc, np.float64)
    valid = np.asarray(valid)

    def gt_proj(fi):
        R, t = scene.poses_R[fi], scene.poses_t[fi]
        pc = scene.landmarks @ R.T + t
        z = pc[:, 2]
        uv = pc[:, :2] / np.maximum(z[:, None], 1e-6)
        Km = scene.K
        uv = uv * [Km[0, 0], Km[1, 1]] + [Km[0, 2], Km[1, 2]]
        vis = (z > 1.0) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        return uv, vis

    def nearest_kp(slot, uv, vis, tol=2.0):
        """landmark id -> detected keypoint idx within tol px (or -1)."""
        kp = kpts[slot][valid[slot]]
        idx = np.nonzero(valid[slot])[0]
        lm = np.full(len(uv), -1, np.int64)
        if len(kp) == 0:
            return lm
        # brute-force nearest neighbour (chunked): frames are small and it
        # keeps the script dependency-free (scipy is not a declared dep)
        for s0 in range(0, len(uv), 4096):
            blk = uv[s0:s0 + 4096]
            d2 = ((blk[:, None, :] - kp[None, :, :]) ** 2).sum(-1)
            j = d2.argmin(axis=1)
            d = np.sqrt(d2[np.arange(len(blk)), j])
            ok = vis[s0:s0 + 4096] & (d < tol)
            lm[s0:s0 + 4096][ok] = idx[j[ok]]
        return lm

    def pair_report(sa, fa, sb, fb):
        uva, visa = gt_proj(fa)
        uvb, visb = gt_proj(fb)
        la = nearest_kp(sa, uva, visa)
        lb = nearest_kp(sb, uvb, visb)
        both = (la >= 0) & (lb >= 0)
        da = desc[sa][la[both]]
        db = desc[sb][lb[both]]
        da /= np.maximum(np.linalg.norm(da, axis=1, keepdims=True), 1e-9)
        db /= np.maximum(np.linalg.norm(db, axis=1, keepdims=True), 1e-9)
        cos = (da * db).sum(1)
        # Crowding: for each true pair, how does the true cosine rank among
        # this landmark's cosines to ALL of frame b's keypoints?
        dbu = desc[sb][valid[sb]]
        dbu = dbu / np.maximum(np.linalg.norm(dbu, axis=1, keepdims=True),
                               1e-9)
        allcos = da @ dbu.T
        rank = (allcos > cos[:, None] + 1e-9).sum(1)
        p = lambda a, q: np.percentile(a, q).round(3) if len(a) else "-"
        print(f"frames {fa}->{fb}: pairs={both.sum()} "
              f"cos[p10,p50,p90]={p(cos,10)},{p(cos,50)},{p(cos,90)} "
              f"frac>0.8={float((cos>0.8).mean() if len(cos) else -1):.3f} "
              f"rank0_frac={float((rank==0).mean() if len(rank) else -1):.3f} "
              f"rank[p50,p90]={p(rank,50)},{p(rank,90)}", flush=True)

    pair_report(0, 5, 1, 13)     # short-gap control
    pair_report(0, 5, 2, 340)    # pre-revisit (should be low overlap)
    pair_report(0, 5, 3, 350)    # revisit
    pair_report(0, 5, 4, 353)    # closest revisit tracked
    pair_report(2, 340, 4, 353)  # late short-gap control


if __name__ == "__main__":
    main()
