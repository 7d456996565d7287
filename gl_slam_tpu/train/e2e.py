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
    # Sum of num_new_points over accepted frames: when this exceeds the
    # point-table capacity the run can only have survived by recycling
    # culled slots (state.recycle_free_slots) — the soak-test turnover
    # evidence (tests/test_longrun.py).
    total_new_points: int = 0
    loop_closures: int = 0


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
            # 1.5 px: the triangulation residual reflects the consistency of
            # the LM-solved pose chain with the fresh pair's epipolar
            # geometry — under near-forward motion the map-anchored pose can
            # wiggle ~0.1-0.3 deg (rotation/translation ambiguity) without
            # hurting the map fit, which alone is ~1-2 px at f=720. A 0.5 px
            # gate starves new-point creation (round-3 diag: reprj -> 0 from
            # frame ~13); 1.5 px admits the candidates and the window BA
            # refines their depths. Detection noise itself is ~0.1-0.2 px on
            # matched keypoints (diag_frontend_accuracy).
            triangulation_reproj_px=1.5,
            triangulation_reproj_bootstrap_px=1.5,
            reobs_max_reproj_px=3.0),
        # Window-point capacity 4096: every-frame keyframing at flagship
        # creates ~200 points/frame, so an 11-camera window holds >2048
        # active points — a 2048 cap silently excluded part of the window
        # from refinement. Culling at 2.0 px: the reference's 1.0 px
        # (slam_types.cpp:42) is tuned for its ~0.1 px front-end noise;
        # freshly triangulated depths here legitimately carry ~1 px
        # residuals until a couple of BA passes refine them, and culling
        # during a transient pose excursion permanently destroyed the map
        # (round-3 diag).
        ba=BAConfig(max_window_cameras=12, max_window_points=4096,
                    full_ba_iters=30, pose_only_iters=30,
                    full_ba_overlap=3),
        map=MapConfig(max_keyframes=512, max_points=65536,
                      covis_max_points=1024, cull_max_reproj_px=2.0),
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


def load_tiny_subpix(ckpt_dir: str = "checkpoints", pair: bool = False):
    """Load the trained Keypt2Subpx-style head; None if no checkpoint.

    pair=True loads the pair-conditioned head (kspair_tiny.npz)."""
    import os

    import jax
    import jax.numpy as jnp

    from ..checkpoint import load_params, params_path
    from ..models.subpix import PairSubpixHead, SubpixHead

    D = TINY_DESC_DIM
    path = params_path(ckpt_dir, "kspair_tiny" if pair else "ks_tiny")
    if not os.path.exists(path):
        return None
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


def run_learned_e2e(sp, sp_params, lg, lg_params, scene, cfg,
                    n_frames: int, chunk: int = 5,
                    ba_every: int = 3, subpix=None,
                    diag_out: dict | None = None,
                    warmup: bool = False,
                    render_cache: str | None = None,
                    domain: str = "clean") -> E2EResult:
    """Track `n_frames` rendered frames of `scene` with the learned
    front-end through the fused chunked pipeline + periodic window BA.

    `subpix`: optional (SubpixHead, params) — the learned Keypt2Subpx
    refinement; None falls back to the training-free centroid.

    `render_cache`: optional .npy path caching the rendered frame stack —
    host-side blob rendering costs ~2-3 s/frame at flagship resolution, so
    a 1000-frame soak otherwise spends ~45 min re-rendering fixture images
    on every iteration."""
    import jax
    import jax.numpy as jnp

    from ..io import synthetic
    from ..slam import fused
    from ..slam.chunk_driver import ChunkedPipeline

    N = cfg.frontend.max_keypoints
    K = jnp.asarray(scene.K, jnp.float32)
    ks_head, ks_params = subpix if subpix is not None else (None, None)
    params = fused.FusedParams(sp=sp_params, lg=lg_params, ks=ks_params)
    pipe = ChunkedPipeline(cfg, K, sp, lg, params, chunk=chunk,
                           ba_every=ba_every, subpix_head=ks_head)

    # Pre-render all frames OUTSIDE the timed loop and stage them in HBM
    # ONCE: host-side rendering is test-fixture work, not pipeline work (a
    # real deployment feeds decoded camera frames through the native
    # prefetcher), and per-chunk H2D uploads through the axon tunnel
    # (~100 MB/s) would otherwise dominate the measured fps.
    import os
    if render_cache is not None and os.path.exists(render_cache):
        stack = np.load(render_cache)
        assert stack.shape[0] >= n_frames, (stack.shape, n_frames)
    else:
        stack = np.stack([
            synthetic.render_frame(scene, i, max_keypoints=N,
                                   domain=domain)
            for i in range(n_frames)]).astype(np.float32)
        if render_cache is not None:
            np.save(render_cache, stack)

    # Bootstrap with the learned matcher (reference: LG at bootstrap too,
    # thread_pool.cpp:27), through the same batched extractor the chunk uses
    c0 = -scene.poses_R[0].T @ scene.poses_t[0]
    c1 = -scene.poses_R[1].T @ scene.poses_t[1]
    pipe.bootstrap_from_images(stack[0], stack[1],
                               float(np.linalg.norm(c1 - c0)))

    all_imgs = jnp.asarray(stack[2:n_frames])
    jax.block_until_ready(all_imgs)
    del stack

    if warmup:
        # Compile both programs OUTSIDE the timed loop on a throwaway copy
        # of the state (fps then measures steady-state device throughput,
        # not the one-time XLA compile — which at flagship shapes over the
        # remote-compile tunnel costs minutes)
        pipe.warmup(jax.lax.dynamic_slice_in_dim(all_imgs, 0, chunk))

    t0 = time.time()
    start = 2
    while start + chunk <= n_frames:
        imgs = jax.lax.dynamic_slice_in_dim(all_imgs, start - 2, chunk)
        pipe.track_chunk(imgs, start)
        start += chunk
    st = pipe.state
    nk = int(st.map.num_kf)          # the single end-of-run sync
    wall = time.time() - t0
    n_ba = pipe.num_ba_runs
    outs_all = pipe.outputs
    matches = np.concatenate([np.asarray(o.num_matches) for o in outs_all])
    inliers = np.concatenate([np.asarray(o.num_inliers) for o in outs_all])
    oks = np.concatenate([np.asarray(o.frame_ok) for o in outs_all])
    costs = np.concatenate([np.asarray(o.pose_cost) for o in outs_all])
    new_pts = np.concatenate([np.asarray(o.num_new_points)
                              for o in outs_all])

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
                [np.asarray(o.num_tri_reproj) for o in outs_all]),
            num_assoc_prev=np.concatenate(
                [np.asarray(o.num_assoc_prev) for o in outs_all]),
            num_assoc_window=np.concatenate(
                [np.asarray(o.num_assoc_window) for o in outs_all]),
            num_assoc_covis=np.concatenate(
                [np.asarray(o.num_assoc_covis) for o in outs_all]),
            num_assoc_gated=np.concatenate(
                [np.asarray(o.num_assoc_gated) for o in outs_all]),
            R=np.concatenate([np.asarray(o.R) for o in outs_all]),
            t=np.concatenate([np.asarray(o.t) for o in outs_all]))

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
                     if oks.any() else 0.0,
                     total_new_points=int(new_pts.sum()),
                     loop_closures=pipe.num_loop_closures)
