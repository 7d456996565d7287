"""Fused multi-frame pipeline: batched extraction + scanned tracking.

Throughput shape for TPU (SURVEY.md §7 "double-buffered host loop feeding
fixed-shape frame batches into one jitted step"): dispatching one XLA program
per frame pays a fixed multi-millisecond host->device round trip (measured
~2 ms/dispatch through the axon relay — scripts/profile_stages.py), so the
hot path processes a CHUNK of T frames per dispatch:

  1. the extractor runs BATCHED over all T images (convs at batch T keep the
     MXU busy far better than batch 1);
  2. a `lax.scan` threads the tracker state through the T frames (matching
     and geometry are sequential by nature — each frame matches against the
     previous one);
  3. one state, one dispatch, T tracked frames out.

This is the TPU answer to the reference's per-frame synchronous
H2D->execute->D2H TensorRT calls with per-call cudaMalloc
(`/root/reference/src/core/superpoint.cpp:97-157`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..ops import match as match_ops
from . import frontend


class FusedParams(NamedTuple):
    sp: Any        # SuperPointNet params
    lg: Any        # LightGlueNet params
    ks: Any = None  # SubpixHead params (learned Keypt2Subpx; None = centroid)


def build_chunk_fn(cfg: SLAMConfig, sp_net, lg_net, K: jnp.ndarray,
                   chunk: int, use_pallas_nms: bool | None = None,
                   match_with_lightglue: bool = True,
                   reobs_with_lightglue: bool | None = None,
                   subpix_head=None,
                   jit: bool = True):
    """Returns a jitted fn (params, state, images (T,H,W), frame_idx0) ->
    (state, TrackOutputs stacked over T).

    `reobs_with_lightglue` selects the matcher of the 2nd and 3rd per-frame
    matching passes (map-window + covisibility synthetic keypoint sets): the
    reference runs LightGlue 3x per frame (`thread_pool.cpp:110,140` +
    `slam_core.cpp:527`); mutual-NN is the cheap approximation. None =
    follow cfg.frontend.reobs_matcher."""
    from ..models.lightglue import assignment, normalize_keypoints
    from ..models.subpix import centroid_refine, gather_patches
    from ..models.superpoint import sample_descriptors
    from ..ops import nms as nms_ops

    H = cfg.frontend.image_height
    W = cfg.frontend.image_width
    N = cfg.frontend.max_keypoints
    pad_h, pad_w = (-H) % 8, (-W) % 8
    if reobs_with_lightglue is None:
        reobs_with_lightglue = cfg.frontend.reobs_matcher == "lightglue"

    def extract_batch(params, images):
        x = jnp.pad(images, ((0, 0), (0, pad_h), (0, pad_w)))[..., None]
        heat, grid = sp_net.apply(params.sp, x)
        row_ok = jnp.arange(heat.shape[1]) < H
        col_ok = jnp.arange(heat.shape[2]) < W
        heat = heat * row_ok[None, :, None] * col_ok[None, None, :]
        kpts, scores, valid = nms_ops.detect_keypoints(
            heat, N, cfg.frontend.score_threshold,
            cfg.frontend.nms_radius, use_pallas=use_pallas_nms)
        kpts = kpts.astype(jnp.float32)
        if subpix_head is not None and params.ks is not None:
            # Learned Keypt2Subpx refinement (C7): offset regressed from the
            # image patch + descriptor at the integer detection
            def refine_one(img, g, kp):
                d_int = sample_descriptors(g, kp)
                patches = gather_patches(img, kp, subpix_head.patch)
                return kp + subpix_head.apply(params.ks, patches, d_int)
            kpts = jax.vmap(refine_one)(images, grid, kpts)
        else:
            ref_src = images if cfg.frontend.subpix_source == "image" \
                else heat
            kpts = jax.vmap(lambda h, k: centroid_refine(
                h, k, cfg.frontend.subpix_patch))(ref_src, kpts)
        desc = jax.vmap(sample_descriptors)(grid, kpts)
        return kpts, desc, valid

    def chunk_fn(params: FusedParams, state: frontend.TrackState,
                 images: jnp.ndarray, frame_idx0: jnp.ndarray):
        kpts_b, desc_b, valid_b = extract_batch(params, images)

        def lg_match(kpts0, desc0, valid0, kpts1, desc1, valid1):
            kn0 = normalize_keypoints(kpts0, H, W)
            kn1 = normalize_keypoints(kpts1, H, W)
            sim, z0, z1 = lg_net.apply(params.lg, desc0, desc1,
                                       kn0, kn1, valid0, valid1)
            mo = assignment(sim, z0, z1, valid0, valid1, 0.0)
            return match_ops.MatchResult(matches0=mo.matches0,
                                         mscores0=mo.mscores0)

        def body(s, inputs):
            kpts, desc, valid, idx = inputs
            f = frontend.FrameFeatures(kpts=kpts, desc=desc, valid=valid,
                                       frame_idx=idx)
            if match_with_lightglue:
                m = lg_match(s.prev_kpts, s.prev_desc, s.prev_valid,
                             kpts, desc, valid)
            else:
                m = None
            matcher = lg_match if reobs_with_lightglue else None
            s, out = frontend.track_step_impl(cfg, K, s, f, matches=m,
                                              matcher=matcher)
            return s, out

        idxs = frame_idx0 + jnp.arange(chunk, dtype=jnp.int32)
        state, outs = jax.lax.scan(body, state,
                                   (kpts_b, desc_b, valid_b, idxs))
        return state, outs

    if not jit:
        return chunk_fn
    return jax.jit(chunk_fn, donate_argnums=(1,))


def build_multistream_chunk_fn(cfg: SLAMConfig, sp_net, lg_net,
                               K: jnp.ndarray, chunk: int, num_streams: int,
                               mesh=None, **kw):
    """S concurrent sequences through the fused chunk in lock step.

    The scale-out shape of BASELINE configs[4]: `jax.vmap` over the stream
    axis (states, images and intrinsics batched; model params shared), jitted
    with the state donated. On a multi-chip mesh the stream axis is sharded
    over the `data` dimension (parallel/mesh.py) and the program is
    communication-free — per-chip throughput is S x frames/sec of one chunk
    dispatch. Extraction vmaps into one (S*T) conv batch, which is exactly
    the large-batch regime the MXU wants.

    K: (3,3) shared or (S,3,3) per stream.
    """
    Kb = jnp.broadcast_to(jnp.asarray(K, jnp.float32), (num_streams, 3, 3))

    def one_stream(params, state, images, frame_idx0, K_s):
        fn = build_chunk_fn(cfg, sp_net, lg_net, K_s, chunk, jit=False, **kw)
        return fn(params, state, images, frame_idx0)

    fn = jax.vmap(one_stream, in_axes=(None, 0, 0, None, 0))

    def ms_chunk(params, states, images, frame_idx0):
        return fn(params, states, images, frame_idx0, Kb)

    if mesh is not None:
        from ..parallel import mesh as mesh_lib
        in_shardings = (None, mesh_lib.stream_sharding(mesh),
                        mesh_lib.stream_sharding(mesh), None)
        return jax.jit(ms_chunk, donate_argnums=(1,),
                       in_shardings=in_shardings)
    return jax.jit(ms_chunk, donate_argnums=(1,))
