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


def build_extract_fn(cfg: SLAMConfig, sp_net,
                     use_pallas_nms: bool | None = None,
                     subpix_head=None,
                     return_patches: bool = False):
    """Returns fn (params, images (B,H,W)) -> (kpts (B,N,2), desc, valid):
    batched CNN forward + fused NMS/top-K + sub-pixel refinement + descriptor
    sampling. Un-jitted — compose inside a jitted caller.

    If `subpix_head` is a PairSubpixHead, per-frame refinement here is the
    centroid fallback only — the learned refinement is PAIR-conditioned and
    runs on matched keypoints inside build_chunk_fn's prologue (the
    reference's Keypt2Subpx also runs on the MATCH result, not per frame:
    `keypt2subpx.cpp:283-340`). `return_patches=True` (implied by a pair
    head) additionally returns the (B,N,P,P) image patches around
    round(kpts) that the pair head consumes."""
    from ..models.subpix import (PairSubpixHead, centroid_refine,
                                 gather_patches)
    from ..models.superpoint import sample_descriptors
    from ..ops import nms as nms_ops

    H = cfg.frontend.image_height
    W = cfg.frontend.image_width
    N = cfg.frontend.max_keypoints
    pad_h, pad_w = (-H) % 8, (-W) % 8
    pair_mode = isinstance(subpix_head, PairSubpixHead)
    return_patches = return_patches or pair_mode

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
        if subpix_head is not None and params.ks is not None \
                and not pair_mode:
            # Learned single-view Keypt2Subpx refinement (C7): offset
            # regressed from the image patch + descriptor at the integer
            # detection
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
        if return_patches:
            P = subpix_head.patch if subpix_head is not None \
                else cfg.frontend.subpix_patch
            patches = jax.vmap(lambda im, kp: gather_patches(
                im, jnp.round(kp), P))(images, kpts)
            return kpts, desc, valid, patches
        return kpts, desc, valid

    return extract_batch


def build_chunk_fn(cfg: SLAMConfig, sp_net, lg_net, K: jnp.ndarray,
                   chunk: int, use_pallas_nms: bool | None = None,
                   match_with_lightglue: bool = True,
                   reobs_with_lightglue: bool | None = None,
                   subpix_head=None,
                   prologue: bool = True,
                   prologue_recovery: bool | None = None,
                   jit: bool = True):
    """Returns a jitted fn (params, state, images (T,H,W), frame_idx0) ->
    (state, TrackOutputs stacked over T).

    `reobs_with_lightglue` selects the matcher of the 2nd and 3rd per-frame
    matching passes (map-window + covisibility synthetic keypoint sets): the
    reference runs LightGlue 3x per frame (`thread_pool.cpp:110,140` +
    `slam_core.cpp:527`); mutual-NN is the cheap approximation. None =
    follow cfg.frontend.reobs_matcher.

    The returned fn also accepts `features=(kpts (T,N,2), desc, valid)` in
    place of images (pass images=None) — the multi-stream path extracts
    separately to bound activation memory.

    Pass-1 matching AND the essential RANSAC run as a BATCHED PROLOGUE over
    all T consecutive pairs before the sequential scan: both depend only on
    the raw extracted features of frames t-1 and t, not on the map, so
    hoisting them turns T serial matcher+RANSAC dispatches into one
    batch-T program (batched attention fills the MXU; T*hypotheses RANSAC
    hypotheses score in parallel). The scan keeps only the map-dependent
    work (re-observation passes, pose LM, triangulation, insertion). If
    frame t-1 was REJECTED by the acceptance gate, the precomputed pair-t
    results (matched against the rejected frame) are invalid. Two recovery
    policies (`prologue_recovery`):
      True  — a lax.cond recomputes match+essential against the stored
              last-accepted features on that path (mutual-NN, not a second
              LightGlue instantiation: the branch fires only on the frame
              right after a rejection, and duplicating the matcher graph
              inside the scan's cond multiplies compile time);
      False — the stale frame is force-rejected too (accept_gate). Since
              the state then still hasn't advanced, every later pair in the
              chunk is equally stale: one rejection drops the REMAINDER of
              the chunk (the host health-check handles re-entry). Measured
              ~0.65 ms/frame faster than the serial layout and ~1.2 ms
              faster than the cond (scripts/ablate_prologue.py) — the right
              trade when rejections are exceptional.
    None (default) resolves by keyframe policy: every-frame keyframing
    (reference parity, rejection = tracking failure) -> False; motion-gated
    keyframing (rejection = routine low-motion skip) -> True.
    `prologue=False` keeps match+essential inside the scan (the round-1
    serial layout, kept for ablation).

    If `subpix_head` is a PairSubpixHead, the prologue additionally runs
    PAIR-conditioned sub-pixel refinement between pass-1 matching and the
    essential RANSAC (full Keypt2Subpx parity, `keypt2subpx.cpp:283-340`):
    each matched current keypoint is refined from BOTH endpoint patches +
    descriptors + the match score, and the refined coordinates feed the
    essential estimate, the pose solve and the map. Requires prologue=True
    (the refinement is inherently a batched between-pass stage)."""
    from ..geometry import essential as essential_mod
    from ..models import subpix as subpix_mod
    from ..models.lightglue import normalize_keypoints
    from ..ops import assignment as assignment_ops

    H = cfg.frontend.image_height
    W = cfg.frontend.image_width
    N = cfg.frontend.max_keypoints
    g = cfg.geometry
    use_pnp = cfg.runtime.tracker == "pnp"
    pair_mode = isinstance(subpix_head, subpix_mod.PairSubpixHead)
    if pair_mode and not prologue:
        raise ValueError("PairSubpixHead requires prologue=True")
    if reobs_with_lightglue is None:
        reobs_with_lightglue = cfg.frontend.reobs_matcher == "lightglue"
    if prologue_recovery is None:
        prologue_recovery = not cfg.runtime.every_frame_keyframe
    extract_batch = build_extract_fn(cfg, sp_net,
                                     use_pallas_nms=use_pallas_nms,
                                     subpix_head=subpix_head)

    def chunk_fn(params: FusedParams, state: frontend.TrackState,
                 images: jnp.ndarray, frame_idx0: jnp.ndarray,
                 features=None, frame_gate: jnp.ndarray | None = None):
        # `frame_gate` (T,) bool: optional per-frame force-reject, ANDed
        # into the acceptance gate — lets a driver feed a PARTIAL tail
        # chunk (pad with copies of the last real frame, gate the padding
        # off) so sequences whose length is not a chunk multiple lose no
        # frames. None compiles the gate away (no extra inputs).
        patches_b = None
        if features is None:
            feats = extract_batch(params, images)
        else:
            feats = features
        if pair_mode:
            kpts_b, desc_b, valid_b, patches_b = feats
        else:
            kpts_b, desc_b, valid_b = feats[:3]

        def lg_match(kpts0, desc0, valid0, kpts1, desc1, valid1):
            kn0 = normalize_keypoints(kpts0, H, W)
            kn1 = normalize_keypoints(kpts1, H, W)
            # Fused assignment: the hot path only consumes matches0/mscores0,
            # so the (N,M) dual-softmax matrix never touches HBM on TPU
            # (ops/assignment.py; falls back to the XLA path on CPU).
            f0, f1, z0, z1 = lg_net.apply(params.lg, desc0, desc1,
                                          kn0, kn1, valid0, valid1,
                                          return_features=True)
            mo = assignment_ops.fused_assignment(
                f0, f1, z0, z1, valid0, valid1,
                1.0 / float(lg_net.dim) ** 0.5, 0.0)
            return match_ops.MatchResult(matches0=mo.matches0,
                                         mscores0=mo.mscores0)

        def pair_geom(kp0, d0, v0, kp1, d1, v1, key,
                      with_lightglue=match_with_lightglue):
            """Pass-1 match + essential for one consecutive pair."""
            if with_lightglue:
                m = lg_match(kp0, d0, v0, kp1, d1, v1)
            else:
                m = match_ops.mutual_nn_match(d0, v0, d1, v1)
            if use_pnp:
                return m, None
            pairf = match_ops.score_filter(m.matches0, m.mscores0,
                                           cfg.frontend.match_threshold)
            uv0, uv1, pairf = match_ops.gather_matched(kp0, kp1,
                                                       m.matches0, pairf)
            ess = essential_mod.estimate_essential(
                K, uv0, uv1, pairf, key,
                threshold_px=g.essential_threshold_px,
                num_hypotheses=g.essential_hypotheses,
                refine_iters=g.essential_refine_iters)
            return m, ess

        matcher = lg_match if reobs_with_lightglue else None
        idxs = frame_idx0 + jnp.arange(chunk, dtype=jnp.int32)

        if not prologue:
            def body_serial(s, inputs):
                kpts, desc, valid, idx, fg = inputs
                f = frontend.FrameFeatures(kpts=kpts, desc=desc,
                                           valid=valid, frame_idx=idx)
                m = lg_match(s.prev_kpts, s.prev_desc, s.prev_valid,
                             kpts, desc, valid) \
                    if match_with_lightglue else None
                s, out = frontend.track_step_impl(cfg, K, s, f, matches=m,
                                                  matcher=matcher,
                                                  accept_gate=fg)
                return s, out
            fg_b = jnp.ones((chunk,), bool) if frame_gate is None \
                else frame_gate
            state, outs = jax.lax.scan(body_serial, state,
                                       (kpts_b, desc_b, valid_b, idxs, fg_b))
            return state, outs

        # Batched prologue: pair t = (frame t-1, frame t); pair 0 uses the
        # stored last-accepted features (always the correct partner).
        # Reproduce track_step_impl's exact per-frame k_ess sequence (its
        # `key, k_ess, k_pnp = split(state.key, 3)` recurrence) so the
        # hoisted RANSAC is bit-identical to the in-scan version.
        def keygen(k, _):
            k_next, k_ess, _ = jax.random.split(k, 3)
            return k_next, k_ess
        _, keys = jax.lax.scan(keygen, state.key, None, length=chunk)
        kp0_b = jnp.concatenate([state.prev_kpts[None], kpts_b[:-1]])
        d0_b = jnp.concatenate([state.prev_desc[None], desc_b[:-1]])
        v0_b = jnp.concatenate([state.prev_valid[None], valid_b[:-1]])
        if pair_mode:
            # 1. match all consecutive pairs (batched)
            def match_one(kp0, d0, v0, kp1, d1, v1):
                if match_with_lightglue:
                    return lg_match(kp0, d0, v0, kp1, d1, v1)
                return match_ops.mutual_nn_match(d0, v0, d1, v1)
            m_b = jax.vmap(match_one)(kp0_b, d0_b, v0_b,
                                      kpts_b, desc_b, valid_b)
            # 2. pair-conditioned sub-pixel refinement of matched CURRENT
            #    keypoints: both endpoint patches + descriptors + score
            pat0_b = jnp.concatenate([state.prev_patches[None],
                                      patches_b[:-1]])

            def refine_one(pat0, d0, pat1, kp1, d1, m):
                pairf = match_ops.score_filter(
                    m.matches0, m.mscores0, cfg.frontend.match_threshold)
                return subpix_mod.pair_refine_scatter(
                    subpix_head, params.ks, pat0, pat1, d0, d1, kp1,
                    m.matches0, m.mscores0, pairf)
            kpts_b = jax.vmap(refine_one)(pat0_b, d0_b, patches_b,
                                          kpts_b, desc_b, m_b)
            # 3. essential RANSAC on the REFINED coordinates (pair t-1's
            #    refinement of frame t-1 reaches pair t through kp0r_b)
            if use_pnp:
                ess_b = None
            else:
                kp0r_b = jnp.concatenate([state.prev_kpts[None],
                                          kpts_b[:-1]])

                def ess_one(kp0, kp1, m, key):
                    pairf = match_ops.score_filter(
                        m.matches0, m.mscores0,
                        cfg.frontend.match_threshold)
                    uv0, uv1, pairf = match_ops.gather_matched(
                        kp0, kp1, m.matches0, pairf)
                    return essential_mod.estimate_essential(
                        K, uv0, uv1, pairf, key,
                        threshold_px=g.essential_threshold_px,
                        num_hypotheses=g.essential_hypotheses,
                        refine_iters=g.essential_refine_iters)
                ess_b = jax.vmap(ess_one)(kp0r_b, kpts_b, m_b, keys)
        else:
            m_b, ess_b = jax.vmap(pair_geom)(kp0_b, d0_b, v0_b,
                                             kpts_b, desc_b, valid_b, keys)

        def body(carry, inputs):
            s, ok_prev = carry
            (kpts, desc, valid, patches, idx, m_pre, ess_pre, key_t,
             fg) = inputs
            f = frontend.FrameFeatures(kpts=kpts, desc=desc, valid=valid,
                                       frame_idx=idx)
            if prologue_recovery:
                m, ess = jax.lax.cond(
                    ok_prev,
                    lambda: (m_pre, ess_pre),
                    lambda: pair_geom(s.prev_kpts, s.prev_desc,
                                      s.prev_valid, kpts, desc, valid,
                                      key_t, with_lightglue=False))
                gate = None if frame_gate is None else fg
            else:
                m, ess = m_pre, ess_pre
                gate = ok_prev if frame_gate is None else (ok_prev & fg)
            s, out = frontend.track_step_impl(cfg, K, s, f, matches=m,
                                              matcher=matcher,
                                              ess_result=ess,
                                              accept_gate=gate,
                                              patches=patches)
            # A gated-off padding frame must not mark the NEXT pair stale:
            # the carried features did not advance, but padding only ever
            # trails real frames, so ok_prev keeps its pre-padding value.
            ok_next = out.frame_ok if frame_gate is None \
                else jnp.where(fg, out.frame_ok, ok_prev)
            return (s, ok_next), out

        fg_b = (jnp.ones((chunk,), bool) if frame_gate is None
                else frame_gate)
        (state, _), outs = jax.lax.scan(
            body, (state, jnp.asarray(True)),
            (kpts_b, desc_b, valid_b, patches_b, idxs, m_b, ess_b, keys,
             fg_b))
        return state, outs

    if not jit:
        return chunk_fn
    return jax.jit(chunk_fn, donate_argnums=(1,))


def build_multistream_chunk_fn(cfg: SLAMConfig, sp_net, lg_net,
                               K: jnp.ndarray, chunk: int, num_streams: int,
                               mesh=None, extract_group: int = 1, **kw):
    """S concurrent sequences through the fused chunk in lock step.

    The scale-out shape of BASELINE configs[4]: `jax.vmap` over the stream
    axis (states, images and intrinsics batched; model params shared), jitted
    with the state donated. On a multi-chip mesh the stream axis is sharded
    over the `data` dimension (parallel/mesh.py) and the program is
    communication-free — per-chip throughput is S x frames/sec of one chunk
    dispatch.

    Extraction is NOT fused into one (S*T)-batch conv: at flagship shapes a
    batch-128 full-res VGG layer holds ~7.8 GB of bf16 activations, which
    forces XLA into spill/remat and measurably REDUCES aggregate throughput
    below single-stream (bench round 2). Instead `lax.map` walks the stream
    axis in groups of `extract_group` streams (activation peak = one group's
    batch), and only the cheap fixed-shape tracking scan is vmapped.

    On a mesh the stream axis is mapped with `shard_map`, NOT
    jit+in_shardings: streams are independent, so the per-device program is
    just the local-batch chunk — and the SPMD partitioner never sees the
    program, so it cannot insert collectives. (Measured: the partitioned
    jit route all-gathered the stream axis around every batched
    sort/top_k in the tracking scan — point-table selection, covisibility
    top-C — i.e. per-scan-iteration collectives;
    tests/test_multichip_scaling.py asserts the compiled program stays
    collective-free.)

    K: (3,3) shared or (S,3,3) per stream.
    """
    Kb = jnp.broadcast_to(jnp.asarray(K, jnp.float32), (num_streams, 3, 3))
    extract = build_extract_fn(cfg, sp_net, **{
        k: v for k, v in kw.items()
        if k in ("use_pallas_nms", "subpix_head")})

    track = jax.vmap(
        lambda params, state, feats, idx0, K_s:
        build_chunk_fn(cfg, sp_net, lg_net, K_s, chunk, jit=False, **kw)(
            params, state, None, idx0, features=feats),
        in_axes=(None, 0, 0, None, 0))

    def ms_chunk(params, states, images, frame_idx0, K_streams):
        S = images.shape[0]
        g = max(1, min(extract_group, S))
        if S % g:
            g = 1
        grouped = images.reshape(S // g, g * chunk, *images.shape[2:])
        feats = jax.lax.map(lambda im: extract(params, im), grouped)
        feats = jax.tree_util.tree_map(
            lambda a: a.reshape(S, chunk, *a.shape[2:]), feats)
        return track(params, states, feats, frame_idx0, K_streams)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        data = mesh.axis_names[0]
        sharded = jax.shard_map(
            ms_chunk, mesh=mesh,
            in_specs=(P(), P(data), P(data), P(), P(data)),
            out_specs=P(data),
            check_vma=False)
        return jax.jit(
            lambda params, states, images, frame_idx0:
            sharded(params, states, images, frame_idx0, Kb),
            donate_argnums=(1,))
    return jax.jit(
        lambda params, states, images, frame_idx0:
        ms_chunk(params, states, images, frame_idx0, Kb),
        donate_argnums=(1,))
