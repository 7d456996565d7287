"""Offline iteration on detect_loop_db using a saved probe state.

Loads the state dumped by diag_loop_dbprobe.py --save-state and runs the
EXACT driver detection program (loopclose.detect_loop with the learned
frame-pair matcher) plus variants (Q=1, unvmapped per-candidate) to
localize the in-driver-vs-standalone PnP discrepancy.

  python scripts/diag_loop_dbiter.py --state /tmp/dbstate_361.npz
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default="/tmp/dbstate_361.npz")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import assignment as assignment_ops
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.slam import frontend, loopclose
    from gl_slam_tpu.slam.state import MapState
    from gl_slam_tpu.train import e2e

    d = np.load(args.state, allow_pickle=True)
    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width

    import ml_dtypes
    fields = {}
    for k in MapState._fields:
        a = d[f"map_{k}"]
        if a.dtype.kind == 'V':         # bf16 saved as void16
            a = a.view(ml_dtypes.bfloat16)
        fields[k] = jnp.asarray(a)
    m = MapState(**fields)
    cfg = dataclasses.replace(cfg, map=dataclasses.replace(
        cfg.map, max_keyframes=int(m.kf_R.shape[0])))
    prev_kpts = jnp.asarray(d["prev_kpts"])
    prev_desc = jnp.asarray(d["prev_desc"])
    prev_valid = jnp.asarray(d["prev_valid"])
    R_cur = jnp.asarray(d["R_cur"])
    t_cur = jnp.asarray(d["t_cur"])
    fi = int(d["fi"])
    print(f"loaded state at f{fi}, kf={int(m.num_kf)}")

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    K = jnp.asarray(
        np.array([[720.0, 0, W / 2], [0, 720.0, H / 2], [0, 0, 1]],
                 np.float32))
    # NOTE: K must match the scene intrinsics; kitti_like_intrinsics uses
    # f=0.58*W... recompute properly below.
    from gl_slam_tpu.io.synthetic import kitti_like_intrinsics
    K = jnp.asarray(kitti_like_intrinsics(H, W), jnp.float32)

    def lg_match(kpts0, desc0, valid0, kpts1, desc1, valid1):
        kn0 = normalize_keypoints(kpts0, H, W)
        kn1 = normalize_keypoints(kpts1, H, W)
        f0, f1, z0, z1 = lg.apply(lg_params, desc0, desc1, kn0, kn1,
                                  valid0, valid1, return_features=True)
        mo = assignment_ops.fused_assignment(
            f0, f1, z0, z1, valid0, valid1,
            1.0 / float(lg.dim) ** 0.5, 0.0)
        return match_ops.MatchResult(matches0=mo.matches0,
                                     mscores0=mo.mscores0)

    f = frontend.FrameFeatures(kpts=prev_kpts, desc=prev_desc,
                               valid=prev_valid,
                               frame_idx=jnp.asarray(fi, jnp.int32))

    def show(tag, det):
        print(f"{tag}: ok={int(np.asarray(det.ok))} "
              f"lkf={int(np.asarray(det.loop_kf))} "
              f"inl={int(np.asarray(det.num_inliers))} "
              f"vis={int(np.asarray(det.n_vis))} "
              f"good={int(np.asarray(det.n_good))} "
              f"cands={int(np.asarray(det.region_votes))} "
              f"pnp_ok={int(np.asarray(det.pnp_raw_ok))}")

    # 1. exact driver call (jitted detect_loop, Q from config)
    det = loopclose.detect_loop(cfg, K, m, f, jax.random.PRNGKey(fi),
                                min_gap=cfg.runtime.loop_min_gap,
                                matcher=lg_match, R_cur=R_cur, t_cur=t_cur)
    show("driver-exact (jit, vmap Q=2)", det)

    # 2. Q=1
    cfg1 = dataclasses.replace(cfg, runtime=dataclasses.replace(
        cfg.runtime, loop_candidates=1))
    det = loopclose.detect_loop(cfg1, K, m, f, jax.random.PRNGKey(fi),
                                min_gap=cfg.runtime.loop_min_gap,
                                matcher=lg_match, R_cur=R_cur, t_cur=t_cur)
    show("Q=1 (jit, vmap 1)", det)

    # 3. per-candidate dissection: retrieval + UNVMAPPED per-candidate
    # matcher/PnP, jitted, with all intermediates out
    from functools import partial
    from gl_slam_tpu.geometry import pnp as pnp_mod

    @partial(jax.jit, static_argnames=("cand_static",))
    def dissect(mstate, key, cand_static):
        Kmax = mstate.capacity_kf
        Nk = mstate.kf_kpts.shape[1]
        cc = jnp.asarray(cand_static, jnp.int32)
        rows = jnp.clip(mstate.kf_db_idx[cc], 0, Nk - 1)
        uv0 = mstate.kf_kpts[cc][rows]
        desc0 = mstate.kf_db_desc[cc].astype(f.desc.dtype)
        v0 = mstate.kf_db_valid[cc]
        with jax.default_matmul_precision("default"):
            mm = lg_match(uv0, desc0, v0, f.kpts, f.desc, f.valid)
        good = v0 & match_ops.score_filter(
            mm.matches0, mm.mscores0, cfg.frontend.map_match_threshold)
        uv_cur = f.kpts[jnp.clip(mm.matches0, 0, f.kpts.shape[0] - 1)]
        res = pnp_mod.solve_pnp_ransac(
            K, mstate.kf_db_xyz[cc], uv_cur, good, key,
            threshold_px=cfg.geometry.pnp_threshold_px,
            num_hypotheses=cfg.geometry.pnp_hypotheses,
            min_inliers=30)
        return good, res.num_inliers, res.ok, res.R, res.t

    with jax.default_matmul_precision("float32"):
        for c in (1, 2):
            good, inl, ok, Rp, tp = dissect(m, jax.random.PRNGKey(fi), c)
            print(f"dissect kf{c}: good={int(np.asarray(good).sum())} "
                  f"inl={int(np.asarray(inl))} ok={bool(np.asarray(ok))}")


if __name__ == "__main__" and "--bisect" not in _sys.argv:
    main()


def vmap_pnp_bisect(state_path="/tmp/dbstate_361.npz"):
    """Minimal repro: same PnP inputs, vmapped vs not, on this backend."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ml_dtypes
    from functools import partial

    from gl_slam_tpu.geometry import pnp as pnp_mod
    from gl_slam_tpu.io.synthetic import kitti_like_intrinsics
    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import assignment as assignment_ops
    from gl_slam_tpu.ops import match as match_ops
    from gl_slam_tpu.slam.state import MapState
    from gl_slam_tpu.train import e2e
    import numpy as np
    import os as _os

    d = np.load(state_path, allow_pickle=True)
    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    fields = {}
    for k in MapState._fields:
        a = d[f"map_{k}"]
        if a.dtype.kind == 'V':
            a = a.view(ml_dtypes.bfloat16)
        fields[k] = jnp.asarray(a)
    m = MapState(**fields)
    prev_kpts = jnp.asarray(d["prev_kpts"])
    prev_desc = jnp.asarray(d["prev_desc"])
    prev_valid = jnp.asarray(d["prev_valid"])
    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    K = jnp.asarray(kitti_like_intrinsics(H, W), jnp.float32)
    N = prev_kpts.shape[0]

    # Build the kf1 match set ONCE (jitted), pull to host, feed to PnP
    @jax.jit
    def build(mstate):
        Nk = mstate.kf_kpts.shape[1]
        cc = jnp.asarray(1, jnp.int32)
        rows = jnp.clip(mstate.kf_db_idx[cc], 0, Nk - 1)
        uv0 = mstate.kf_kpts[cc][rows]
        desc0 = mstate.kf_db_desc[cc].astype(prev_desc.dtype)
        v0 = mstate.kf_db_valid[cc]
        kn0 = normalize_keypoints(uv0, H, W)
        kn1 = normalize_keypoints(prev_kpts, H, W)
        f0, f1, z0, z1 = lg.apply(lg_params, desc0, prev_desc, kn0, kn1,
                                  v0, prev_valid, return_features=True)
        mo = assignment_ops.fused_assignment(
            f0, f1, z0, z1, v0, prev_valid,
            1.0 / float(lg.dim) ** 0.5, 0.0)
        good = v0 & match_ops.score_filter(
            mo.matches0, mo.mscores0, cfg.frontend.map_match_threshold)
        uv_cur = prev_kpts[jnp.clip(mo.matches0, 0, N - 1)]
        return mstate.kf_db_xyz[cc], uv_cur, good

    xyz, uv_cur, good = build(m)
    key = jax.random.PRNGKey(361)

    solve = partial(pnp_mod.solve_pnp_ransac, threshold_px=1.8,
                    num_hypotheses=512, min_inliers=30)

    r1 = jax.jit(lambda: solve(K, xyz, uv_cur, good, key))()
    print("plain jit:", int(r1.num_inliers), bool(r1.ok))

    vm = jax.jit(jax.vmap(lambda k: solve(K, xyz, uv_cur, good, k)))
    r2 = vm(key[None])
    print("vmap over key (B=1):", np.asarray(r2.num_inliers),
          np.asarray(r2.ok))

    vm2 = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0, 0)))
    r3 = vm2(K, xyz[None], uv_cur[None], good[None], key[None])
    print("vmap over data (B=1):", np.asarray(r3.num_inliers))

    vm3 = jax.jit(jax.vmap(lambda k: solve(K, xyz, uv_cur, good, k)))
    r4 = vm3(jax.random.split(key, 2))
    print("vmap over 2 keys:", np.asarray(r4.num_inliers))


if __name__ == "__main__" and "--bisect" in _sys.argv:
    vmap_pnp_bisect()
    _sys.exit(0)
