"""End-to-end learned-pipeline harness: train-lite -> track -> ATE.

Proves the LEARNED path tracks (VERDICT r1 item 3): SuperPoint-style
extraction -> LightGlue matching (all 3 per-frame passes) -> essential RANSAC
-> pose-only LM -> triangulation -> map insertion -> sliding-window BA, on a
rendered scene NOT seen in training, scored as ATE-RMSE against ground truth.
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple, Optional

import numpy as np


class E2EResult(NamedTuple):
    ate_m: float
    num_keyframes: int
    num_frames: int
    num_ba_runs: int
    fps: float
    mean_matches: float
    num_rejected: int = 0        # frames the acceptance gate dropped
    mean_inliers: float = 0.0
    mean_pose_cost: float = 0.0


def micro_config(H: int, W: int, N: int, D: int):
    """Pipeline config tuned for the small rendered scenes: learned
    detections carry ~0.5-1 px error, so thresholds are proportionally wider
    than the reference's sub-pixel-refined settings."""
    from ..config import (BAConfig, FrontendConfig, GeometryConfig,
                          MapConfig, SLAMConfig)
    return SLAMConfig(
        frontend=FrontendConfig(
            image_height=H, image_width=W, max_keypoints=N,
            descriptor_dim=D, score_threshold=0.02, nms_radius=3,
            match_threshold=0.4, map_match_threshold=0.4,
            reobs_matcher="lightglue"),
        geometry=GeometryConfig(
            essential_hypotheses=128, essential_refine_iters=5,
            essential_threshold_px=0.75, max_depth=35.0,
            triangulation_reproj_px=0.5,
            triangulation_reproj_bootstrap_px=1.0),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_iters=30, pose_only_iters=30,
                    full_ba_overlap=4),
        map=MapConfig(max_keyframes=64, max_points=8192,
                      covis_max_points=256, covis_edge_threshold=10),
    )


# The tiny-preset model shapes the committed checkpoints were trained with
# (scripts/train_frontend.py --preset tiny). Train res 160x240; the nets are
# fully convolutional, so tracking runs at any /8-divisible resolution.
TINY_SP_CHANNELS = (16, 16, 32, 32, 32, 32, 64, 64)
TINY_DESC_DIM = 64
TINY_LG = dict(dim=64, heads=2, layers=2)

# Flagship-preset shapes = the reference's deployed models: 2048 keypoints,
# 256-d descriptors at 376x1241 (`superpoint.cpp:29-43`), 9 attention
# layers (`lightglue.cpp:64-92`). Trained at 376x1240 (/8-divisible);
# inference pads 1241 -> 1248. One source of truth for trainer
# (scripts/train_frontend.py), CLI preset, and bench.py.
FLAGSHIP_SP_CHANNELS = (64, 64, 64, 64, 128, 128, 128, 128)
FLAGSHIP_DESC_DIM = 256
FLAGSHIP_LG = dict(dim=256, heads=2, layers=9)


def flagship_config(H: int = 376, W: int = 1241):
    """Pipeline config at the reference's deployed shapes (N=2048, D=256,
    `superpoint.cpp:29-43`) with windows/cadence at reference defaults
    (`slam_types.cpp:5-31`). Geometry thresholds follow micro_config's
    reasoning: learned detections carry ~0.3-1 px error on the synthetic
    renderer, so acceptance thresholds sit wider than the reference's
    sub-pixel-engine settings; the e2e ATE bound is what pins quality."""
    from ..config import (BAConfig, FrontendConfig, GeometryConfig,
                          MapConfig, SLAMConfig)
    return SLAMConfig(
        frontend=FrontendConfig(
            image_height=H, image_width=W, max_keypoints=2048,
            descriptor_dim=FLAGSHIP_DESC_DIM, score_threshold=5e-4,
            # 0.6 on this matcher's score distribution: ~92.5% of passing
            # matches join the correct landmark vs ~89% at 0.4 (sweep in
            # scripts/diag_frontend_accuracy.py); the remaining wrong
            # associations are removed by the reprojection gate below.
            nms_radius=4, match_threshold=0.6, map_match_threshold=0.6,
            reobs_matcher="lightglue"),
        geometry=GeometryConfig(
            essential_hypotheses=256, essential_refine_iters=6,
            essential_threshold_px=0.75,
            triangulation_reproj_px=0.5,
            triangulation_reproj_bootstrap_px=1.0,
            reobs_max_reproj_px=3.0),
        ba=BAConfig(max_window_cameras=12, max_window_points=2048,
                    full_ba_iters=30, pose_only_iters=30,
                    full_ba_overlap=3),
        map=MapConfig(max_keyframes=512, max_points=65536,
                      covis_max_points=1024),
    )


def load_flagship_frontend(ckpt_dir: str = "checkpoints"):
    """Build flagship SP/LG nets and load trained weights; returns
    (sp, sp_params, lg, lg_params). Regenerate the checkpoints with
    `python scripts/train_frontend.py --preset flagship` (~25 min on one
    TPU chip)."""
    import jax
    import jax.numpy as jnp

    from ..checkpoint import load_params, params_path
    from ..models.lightglue import LightGlueNet
    from ..models.superpoint import SuperPointNet

    D = FLAGSHIP_DESC_DIM
    sp = SuperPointNet(descriptor_dim=D, channels=FLAGSHIP_SP_CHANNELS)
    lg = LightGlueNet(input_dim=D, **FLAGSHIP_LG)
    sp_like = sp.init(jax.random.PRNGKey(0), jnp.zeros((1, 376, 1240, 1)))
    d8 = jnp.zeros((8, D))
    k8 = jnp.zeros((8, 2))
    m8 = jnp.ones((8,), bool)
    lg_like = lg.init(jax.random.PRNGKey(0), d8, d8, k8, k8, m8, m8)
    sp_params = load_params(params_path(ckpt_dir, "sp_flagship"), sp_like)
    lg_params = load_params(params_path(ckpt_dir, "lg_flagship"), lg_like)
    return sp, sp_params, lg, lg_params


def load_tiny_frontend(ckpt_dir: str = "checkpoints"):
    """Build tiny SP/LG nets and load the committed trained weights.

    Returns (sp, sp_params, lg, lg_params). Weights are regenerable with
    `python scripts/train_frontend.py --preset tiny` (~10 min on one TPU
    chip)."""
    import jax
    import jax.numpy as jnp

    from ..checkpoint import load_params, params_path
    from ..models.lightglue import LightGlueNet
    from ..models.superpoint import SuperPointNet

    D = TINY_DESC_DIM
    sp = SuperPointNet(descriptor_dim=D, channels=TINY_SP_CHANNELS)
    lg = LightGlueNet(input_dim=D, **TINY_LG)
    sp_like = sp.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 240, 1)))
    d8 = jnp.zeros((8, D))
    k8 = jnp.zeros((8, 2))
    m8 = jnp.ones((8,), bool)
    lg_like = lg.init(jax.random.PRNGKey(0), d8, d8, k8, k8, m8, m8)
    sp_params = load_params(params_path(ckpt_dir, "sp_tiny"), sp_like)
    lg_params = load_params(params_path(ckpt_dir, "lg_tiny"), lg_like)
    return sp, sp_params, lg, lg_params


def load_flagship_subpix(ckpt_dir: str = "checkpoints", pair: bool = True):
    """Load the trained flagship Keypt2Subpx head; None if no checkpoint.

    pair=True loads the pair-conditioned head (kspair_flagship.npz — full
    Keypt2Subpx parity, both matched patches + descriptors + match score,
    `keypt2subpx.cpp:283-340`); False loads the single-view head
    (ks_flagship.npz). Returns (head, params)."""
    import os

    import jax
    import jax.numpy as jnp

    from ..checkpoint import load_params, params_path
    from ..models.subpix import PairSubpixHead, SubpixHead

    name = "kspair_flagship" if pair else "ks_flagship"
    path = params_path(ckpt_dir, name)
    if not os.path.exists(path):
        return None
    D = FLAGSHIP_DESC_DIM
    if pair:
        ks = PairSubpixHead(patch=7, offset_range=1.5)
        like = ks.init(jax.random.PRNGKey(0),
                       jnp.zeros((4, 7, 7), jnp.float32),
                       jnp.zeros((4, 7, 7), jnp.float32),
                       jnp.zeros((4, D), jnp.float32),
                       jnp.zeros((4, D), jnp.float32),
                       jnp.zeros((4,), jnp.float32))
    else:
        ks = SubpixHead(patch=7, offset_range=1.5)
        like = ks.init(jax.random.PRNGKey(0),
                       jnp.zeros((4, 7, 7), jnp.float32),
                       jnp.zeros((4, D), jnp.float32))
    return ks, load_params(path, like)


def load_tiny_subpix(ckpt_dir: str = "checkpoints"):
    """Load the trained Keypt2Subpx-style head; None if no checkpoint."""
    import os

    import jax
    import jax.numpy as jnp

    from ..checkpoint import load_params, params_path
    from ..models.subpix import SubpixHead

    path = params_path(ckpt_dir, "ks_tiny")
    if not os.path.exists(path):
        return None
    ks = SubpixHead(patch=7, offset_range=1.5)
    like = ks.init(jax.random.PRNGKey(0),
                   jnp.zeros((4, 7, 7), jnp.float32),
                   jnp.zeros((4, TINY_DESC_DIM), jnp.float32))
    return ks, load_params(path, like)


def run_learned_e2e(sp, sp_params, lg, lg_params, scene, cfg,
                    n_frames: int, chunk: int = 5,
                    ba_every: int = 3, subpix=None,
                    diag_out: dict | None = None,
                    warmup: bool = False) -> E2EResult:
    """Track `n_frames` rendered frames of `scene` with the learned
    front-end through the fused chunked pipeline + periodic window BA.

    `subpix`: optional (SubpixHead, params) — the learned Keypt2Subpx
    refinement; None falls back to the training-free centroid."""
    import jax
    import jax.numpy as jnp

    from ..models.lightglue import assignment, normalize_keypoints
    from ..models.subpix import centroid_refine, gather_patches
    from ..models.superpoint import sample_descriptors
    from ..ops import match as match_ops
    from ..ops import nms as nms_ops
    from ..slam import ba as ba_mod
    from ..slam import frontend, fused
    from ..io import synthetic

    from ..models.subpix import PairSubpixHead

    N = cfg.frontend.max_keypoints
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    K = jnp.asarray(scene.K, jnp.float32)
    ks_head, ks_params = subpix if subpix is not None else (None, None)
    pair_mode = isinstance(ks_head, PairSubpixHead)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    chunk_fn = fused.build_chunk_fn(cfg, sp, lg, K, chunk,
                                    subpix_head=ks_head)

    pad_h, pad_w = (-H) % 8, (-W) % 8

    def extract(i):
        img = jnp.asarray(synthetic.render_frame(scene, i, max_keypoints=N),
                          jnp.float32)
        x = jnp.pad(img[None], ((0, 0), (0, pad_h), (0, pad_w)))[..., None]
        heat, grid = sp.apply(sp_params, x)
        heat = heat[:, :H, :W]
        kp, sc, v = nms_ops.detect_keypoints(
            heat, N, cfg.frontend.score_threshold, cfg.frontend.nms_radius)
        kp = kp[0].astype(jnp.float32)
        if ks_head is not None:
            d_int = sample_descriptors(grid[0], kp)
            kp = kp + ks_head.apply(
                ks_params, gather_patches(img, kp, ks_head.patch), d_int)
        else:
            ref_src = img if cfg.frontend.subpix_source == "image" \
                else heat[0]
            kp = centroid_refine(ref_src, kp, cfg.frontend.subpix_patch)
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

    # Bootstrap with the learned matcher (reference: LG at bootstrap too,
    # thread_pool.cpp:27)
    patches1 = None
    if pair_mode:
        # Pair-conditioned refinement needs the carried prev-frame patches;
        # extract via the same batched path the chunk uses (per-frame
        # refinement there is the centroid fallback — the learned
        # refinement runs on MATCHED keypoints inside the chunk prologue)
        ex2 = jax.jit(fused.build_extract_fn(cfg, sp, subpix_head=ks_head))
        imgs01 = jnp.asarray(np.stack([
            synthetic.render_frame(scene, i, max_keypoints=N)
            for i in range(2)]).astype(np.float32))
        kp_b, d_b, v_b, pat_b = ex2(params, imgs01)
        f0 = frontend.FrameFeatures(kpts=kp_b[0], desc=d_b[0], valid=v_b[0],
                                    frame_idx=jnp.asarray(0, jnp.int32))
        f1 = frontend.FrameFeatures(kpts=kp_b[1], desc=d_b[1], valid=v_b[1],
                                    frame_idx=jnp.asarray(1, jnp.int32))
        patches1 = pat_b[1]
        st = frontend.init_track_state(cfg, jax.random.PRNGKey(0),
                                       patch=ks_head.patch)
    else:
        f0, f1 = extract(0), extract(1)
        st = frontend.init_track_state(cfg, jax.random.PRNGKey(0))
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    st, out = frontend.bootstrap_step(
        cfg, K, st, f0, f1,
        jnp.asarray(float(np.linalg.norm(c1 - c0)), jnp.float32),
        matches=lg_match(f0, f1), patches1=patches1)

    # Pre-render all frames OUTSIDE the timed loop and stage them in HBM
    # ONCE: host-side rendering is test-fixture work, not pipeline work (a
    # real deployment feeds decoded camera frames through the native
    # prefetcher), and per-chunk H2D uploads through the axon tunnel
    # (~100 MB/s) would otherwise dominate the measured fps.
    all_imgs = jnp.asarray(np.stack([
        synthetic.render_frame(scene, i, max_keypoints=N)
        for i in range(2, n_frames)]).astype(np.float32))
    jax.block_until_ready(all_imgs)

    # BA window derived ON DEVICE from num_kf: the host loop never reads
    # device state back (a single int(num_kf) read over the tunnel costs
    # whole seconds of pipeline stall; the reference's mapping thread
    # likewise never blocks tracking, thread_pool.cpp:343-357). Cadence is
    # every `ba_every` ACCEPTED keyframes, tracked by num_kf deltas inside
    # the jitted step.
    from ..slam.state import recycle_free_slots

    ba_every_chunks = max(ba_every // chunk, 1)
    win_kf = ba_every_chunks * chunk     # max keyframes added between BAs

    @jax.jit
    def ba_fn(st):
        m = st.map
        first = jnp.maximum(m.num_kf - (win_kf + cfg.ba.full_ba_overlap),
                            0).astype(jnp.int32)
        win = m.num_kf - first
        new_map = ba_mod.ba_step(cfg, K, m, first, win)
        last = jnp.maximum(new_map.num_kf - 1, 0)
        st = st._replace(map=new_map, R_cur=new_map.kf_R[last],
                         t_cur=new_map.kf_t[last])
        if cfg.map.recycle_enabled:
            st = st._replace(map=recycle_free_slots(
                st.map, cfg.map.recycle_min_age,
                min(cfg.map.recycle_budget, cfg.map.max_points)))
        return st

    if warmup:
        # Compile both programs OUTSIDE the timed loop on a throwaway copy
        # of the state (fps then measures steady-state device throughput,
        # not the one-time XLA compile — which at flagship shapes over the
        # remote-compile tunnel costs minutes)
        st_w = jax.tree_util.tree_map(jnp.copy, st)
        st_w, _ = chunk_fn(params, st_w,
                           jax.lax.dynamic_slice_in_dim(all_imgs, 0, chunk),
                           jnp.asarray(2, jnp.int32))
        st_w = ba_fn(st_w)
        jax.block_until_ready(st_w.map.num_kf)
        del st_w

    t0 = time.time()
    n_ba = 0
    outs_all = []
    start = 2
    chunks_since_ba = 0
    while start + chunk <= n_frames:
        imgs = jax.lax.dynamic_slice_in_dim(all_imgs, start - 2, chunk)
        st, outs = chunk_fn(params, st, imgs, jnp.asarray(start, jnp.int32))
        outs_all.append(outs)
        start += chunk
        chunks_since_ba += 1
        if chunks_since_ba >= ba_every_chunks:
            st = ba_fn(st)
            chunks_since_ba = 0
            n_ba += 1
    nk = int(st.map.num_kf)          # the single end-of-run sync
    wall = time.time() - t0
    matches = np.concatenate([np.asarray(o.num_matches) for o in outs_all])
    inliers = np.concatenate([np.asarray(o.num_inliers) for o in outs_all])
    oks = np.concatenate([np.asarray(o.frame_ok) for o in outs_all])
    costs = np.concatenate([np.asarray(o.pose_cost) for o in outs_all])

    if diag_out is not None:
        diag_out.update(
            frame_ok=oks, num_matches=matches, num_inliers=inliers,
            pose_cost=costs,
            num_map_matches=np.concatenate(
                [np.asarray(o.num_map_matches) for o in outs_all]),
            num_new_points=np.concatenate(
                [np.asarray(o.num_new_points) for o in outs_all]),
            num_rest=np.concatenate(
                [np.asarray(o.num_rest) for o in outs_all]),
            num_tri_cheir=np.concatenate(
                [np.asarray(o.num_tri_cheir) for o in outs_all]),
            num_tri_reproj=np.concatenate(
                [np.asarray(o.num_tri_reproj) for o in outs_all]))

    R_est = np.asarray(st.map.kf_R[:nk])
    t_est = np.asarray(st.map.kf_t[:nk])
    fidx = np.asarray(st.map.kf_frame_idx[:nk])
    c_est = np.einsum('kij,kj->ki', R_est.transpose(0, 2, 1), -t_est)
    c_gt = np.stack([-scene.poses_R[i].T @ scene.poses_t[i] for i in fidx])
    ate = float(np.sqrt(((c_est - c_gt) ** 2).sum(1).mean()))
    return E2EResult(ate_m=ate, num_keyframes=nk, num_frames=start,
                     num_ba_runs=n_ba, fps=(start - 2) / max(wall, 1e-9),
                     mean_matches=float(matches.mean()) if len(matches)
                     else 0.0,
                     num_rejected=int((~oks).sum()),
                     mean_inliers=float(inliers.mean()) if len(inliers)
                     else 0.0,
                     mean_pose_cost=float(costs[oks].mean())
                     if oks.any() else 0.0)
