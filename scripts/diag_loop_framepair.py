"""Does FRAME-to-FRAME LightGlue fire across the revisit gap?

diag_loop_matcher.py proved the map-descriptor synthetic-set path cannot
match the 300-frame-old archive (0 GT agreements even on a true-pairs-only
candidate set). This script tests the alternative detection regime: extract
features from an early frame and a late (revisit) frame with the SAME
batched extractor and run the standard frame-pair LightGlue on them — the
exact distribution the matcher is trained on (train/frontend_train.py
gap_choices=(1,2); appearance at the revisit is near-identical because the
renderer is viewpoint-independent). GT agreement is checked by landmark id
(io/synthetic.observe_frame).

  python scripts/diag_loop_framepair.py --fa 10 --fb 350
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np

ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=360)
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--fa", type=int, default=10)
    ap.add_argument("--fb", type=int, default=350)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import normalize_keypoints
    from gl_slam_tpu.ops import assignment as assignment_ops
    from gl_slam_tpu.slam import fused
    from gl_slam_tpu.train import e2e

    n = args.frames
    cfg = e2e.flagship_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    D = cfg.frontend.descriptor_dim
    N = cfg.frontend.max_keypoints
    scene = synthetic.make_scene(num_landmarks=max(20000, n * 170),
                                 num_frames=n, height=H, width=W,
                                 desc_dim=D, seed=args.seed, motion="loop")
    cache = _os.path.join("/tmp", f"render_loop_{args.seed}_{n}_{H}x{W}.npy")
    stack = np.load(cache)

    sp, sp_params, lg, lg_params = e2e.load_flagship_frontend(
        _os.path.join(ROOT, "checkpoints"))
    ks_head, ks_params = e2e.load_flagship_subpix(
        _os.path.join(ROOT, "checkpoints"), pair=True)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    extract = jax.jit(fused.build_extract_fn(cfg, sp, subpix_head=ks_head))

    imgs = jnp.asarray(np.stack([stack[args.fa], stack[args.fb]]),
                       jnp.float32)
    feats = extract(params, imgs)
    kp_b, d_b, v_b = feats[:3]

    kn0 = normalize_keypoints(kp_b[0], H, W)
    kn1 = normalize_keypoints(kp_b[1], H, W)
    with jax.default_matmul_precision("default"):
        f0, f1, z0, z1 = lg.apply(lg_params, d_b[0], d_b[1], kn0, kn1,
                                  v_b[0], v_b[1], return_features=True)
        mo = assignment_ops.fused_assignment(
            f0, f1, z0, z1, v_b[0], v_b[1],
            1.0 / float(lg.dim) ** 0.5, 0.0)
    m0 = np.asarray(mo.matches0)
    sc = np.asarray(mo.mscores0, np.float64)

    # GT landmark-id pairing via nearest observed keypoint
    oa = synthetic.observe_frame(scene, args.fa, N)
    ob = synthetic.observe_frame(scene, args.fb, N)
    kpa = np.asarray(kp_b[0], np.float64)
    kpb = np.asarray(kp_b[1], np.float64)
    va = np.asarray(v_b[0])
    vb = np.asarray(v_b[1])

    def lid_of(kp, valid, obs):
        """nearest GT keypoint within 2 px -> landmark id, else -1"""
        out = np.full(len(kp), -1, np.int64)
        gk = obs.keypoints[obs.valid]
        gl = obs.landmark_ids[obs.valid]
        for i in range(len(kp)):
            if not valid[i]:
                continue
            d = np.linalg.norm(gk - kp[i], axis=1)
            j = int(d.argmin())
            if d[j] < 2.0:
                out[i] = gl[j]
        return out

    la = lid_of(kpa, va, oa)
    lb = lid_of(kpb, vb, ob)
    shared = set(la[la >= 0]) & set(lb[lb >= 0])
    matched = m0 >= 0
    agree = sum(1 for i in range(len(m0))
                if matched[i] and la[i] >= 0 and la[i] == lb[m0[i]])
    wrong = sum(1 for i in range(len(m0))
                if matched[i] and la[i] >= 0 and lb[m0[i]] >= 0
                and la[i] != lb[m0[i]])
    thr = cfg.frontend.map_match_threshold
    n_above = int((sc[matched] >= thr).sum())
    agree_above = sum(1 for i in range(len(m0))
                      if matched[i] and sc[i] >= thr and la[i] >= 0
                      and la[i] == lb[m0[i]])
    pr = lambda a: np.percentile(a, [10, 50, 90]).round(3) if len(a) \
        else "-"
    print(f"pair f{args.fa} vs f{args.fb}: shared_landmarks={len(shared)} "
          f"matched_any={int(matched.sum())} agree={agree} wrong={wrong} "
          f"scores={pr(sc[matched])} above_thr({thr})={n_above} "
          f"agree_above_thr={agree_above}")


if __name__ == "__main__":
    main()
