"""Train-lite for the learned front-end on synthetic rendered sequences.

The reference ships pre-trained ONNX weights (SuperPoint / LightGlue /
Keypt2Subpx engines, `/root/reference/src/core/superpoint.cpp:29-43`); this
framework instead trains its own weights from scratch — the synthetic
renderer (io/synthetic.py render_frame) provides infinite labeled
correspondences, so a few hundred supervised steps are enough for the learned
pipeline to track (VERDICT r1 item 3).

Losses:
  * SuperPoint detector: per-cell 65-way cross-entropy (the classic
    SuperPoint formulation — each 8x8 cell is classified as one of its 64
    pixels or a dustbin).
  * SuperPoint descriptor: bidirectional InfoNCE between descriptors sampled
    at corresponding ground-truth keypoints of two views.
  * LightGlue: negative log-likelihood of the ground-truth assignment under
    the dual-softmax + matchability head, plus BCE pushing matchability to 0
    for unmatched keypoints (the LightGlue paper's loss shape).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..io import synthetic
from ..models.lightglue import normalize_keypoints
from ..models.superpoint import sample_descriptors


# --------------------------------------------------------------- SP labels

def cell_labels(kpts: np.ndarray, valid: np.ndarray, height: int,
                width: int, cell: int = 8) -> np.ndarray:
    """(N,2) pixel keypoints -> (Hc,Wc) int32 per-cell class labels.

    Class = (y%cell)*cell + x%cell for the keypoint pixel; cell**2 (dustbin)
    where the cell holds no keypoint. Last keypoint wins a collision."""
    Hc, Wc = height // cell, width // cell
    lab = np.full((Hc, Wc), cell * cell, np.int32)
    for (x, y), v in zip(kpts, valid):
        if not v:
            continue
        xi, yi = int(round(float(x))), int(round(float(y)))
        if 0 <= xi < Wc * cell and 0 <= yi < Hc * cell:
            lab[yi // cell, xi // cell] = (yi % cell) * cell + (xi % cell)
    return lab


class FramePack(NamedTuple):
    """Pre-rendered training frame: image + GT detections + labels."""
    image: np.ndarray       # (H,W) float32
    kpts: np.ndarray        # (N,2)
    valid: np.ndarray       # (N,)
    lids: np.ndarray        # (N,) landmark ids
    labels: np.ndarray      # (Hc,Wc) detector class labels


def render_pack(scene, frame_idx: int, max_keypoints: int) -> FramePack:
    obs = synthetic.observe_frame(scene, frame_idx, max_keypoints)
    img = synthetic.render_frame(scene, frame_idx, max_keypoints)
    lab = cell_labels(obs.keypoints, obs.valid, scene.height, scene.width)
    return FramePack(image=img.astype(np.float32),
                     kpts=obs.keypoints.astype(np.float32),
                     valid=obs.valid, lids=obs.landmark_ids, labels=lab)


# --------------------------------------------------------------- SP loss

def superpoint_loss(sp_net, params, batch, desc_temp: float = 0.07):
    """batch: dict of stacked FramePack pairs (view a / view b).

    Returns scalar loss = detector CE (both views) + InfoNCE descriptor loss
    across the pair."""
    img_a, img_b = batch["image_a"], batch["image_b"]
    x = jnp.concatenate([img_a, img_b], 0)[..., None]
    heat, grid, logits = sp_net.apply(params, x, return_logits=True)
    B = img_a.shape[0]

    # Detector CE over cells (65-way; logits (2B,Hc,Wc,65))
    labels = jnp.concatenate([batch["labels_a"], batch["labels_b"]], 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels)
    det_loss = ce.mean()

    # Descriptor InfoNCE at GT keypoints
    grid_a, grid_b = grid[:B], grid[B:]
    d_a = jax.vmap(sample_descriptors)(grid_a, batch["kpts_a"])   # (B,N,D)
    d_b = jax.vmap(sample_descriptors)(grid_b, batch["kpts_b"])

    def pair_nce(da, db, lida, lidb, va, vb):
        sim = (da @ db.T) / desc_temp                             # (N,N)
        # target j for row i: lidb[j] == lida[i]
        eq = (lida[:, None] == lidb[None, :]) & (lida >= 0)[:, None]
        has = eq.any(axis=1) & va
        tgt = jnp.argmax(eq, axis=1)
        neg = jnp.asarray(-1e9, sim.dtype)
        sim = jnp.where(vb[None, :], sim, neg)
        logp = jax.nn.log_softmax(sim, axis=1)
        row_l = -jnp.where(has, logp[jnp.arange(da.shape[0]), tgt], 0.0)
        logp_t = jax.nn.log_softmax(
            jnp.where(va[:, None], sim, neg), axis=0)
        col_l = -jnp.where(has, logp_t[jnp.arange(da.shape[0]), tgt], 0.0)
        denom = jnp.maximum(has.sum(), 1)
        return (row_l.sum() + col_l.sum()) / (2.0 * denom)

    desc_loss = jax.vmap(pair_nce)(
        d_a, d_b, batch["lids_a"], batch["lids_b"],
        batch["valid_a"], batch["valid_b"]).mean()
    return det_loss + desc_loss, {"det": det_loss, "desc": desc_loss}


# --------------------------------------------------------------- LG loss

def lightglue_loss(lg_net, params, batch, height: int, width: int):
    """NLL of the GT assignment under dual-softmax + matchability.

    batch carries per-pair keypoints (pixel), descriptors, validity and
    landmark ids; unmatched valid keypoints supervise matchability -> 0."""
    def one(d0, d1, k0, k1, v0, v1, l0, l1):
        kn0 = normalize_keypoints(k0, height, width)
        kn1 = normalize_keypoints(k1, height, width)
        sim, z0, z1 = lg_net.apply(params, d0, d1, kn0, kn1, v0, v1)
        neg = jnp.asarray(-1e9, sim.dtype)
        simm = jnp.where(v0[:, None] & v1[None, :], sim, neg)
        lp0 = jax.nn.log_softmax(simm, axis=1)
        lp1 = jax.nn.log_softmax(simm, axis=0)
        eq = (l0[:, None] == l1[None, :]) & (l0 >= 0)[:, None] \
            & v0[:, None] & v1[None, :]
        has0 = eq.any(axis=1)
        tgt = jnp.argmax(eq, axis=1)
        i = jnp.arange(sim.shape[0])
        pair_ll = lp0[i, tgt] + lp1[i, tgt] \
            + jax.nn.log_sigmoid(z0) + jax.nn.log_sigmoid(z1)[tgt]
        n_pos = jnp.maximum(has0.sum(), 1)
        match_loss = -jnp.where(has0, pair_ll, 0.0).sum() / n_pos
        # Unmatched valid keypoints: matchability -> 0
        un0 = v0 & ~has0
        has1 = eq.any(axis=0)
        un1 = v1 & ~has1
        bce = -(jnp.where(un0, jax.nn.log_sigmoid(-z0), 0.0).sum()
                + jnp.where(un1, jax.nn.log_sigmoid(-z1), 0.0).sum()) \
            / jnp.maximum(un0.sum() + un1.sum(), 1)
        return match_loss + 0.5 * bce

    losses = jax.vmap(one)(batch["desc0"], batch["desc1"], batch["kpts0"],
                           batch["kpts1"], batch["valid0"], batch["valid1"],
                           batch["lids0"], batch["lids1"])
    return losses.mean()


# --------------------------------------------------------------- trainers

def _augment(img: np.ndarray, rng) -> np.ndarray:
    """Photometric augmentation: gain/bias jitter + sensor noise. Keypoint
    positions are untouched, so detector labels stay valid — this is what
    stops a small detector from memorizing a fixed render set."""
    gain = 0.7 + 0.6 * rng.random()
    bias = 0.05 * (rng.random() - 0.5)
    noisy = img * gain + bias + rng.normal(scale=0.02, size=img.shape)
    return np.clip(noisy, 0.0, 1.0).astype(np.float32)


def _pair_batch(packs, rng, batch_size, gap_choices=(1, 2), augment=True,
                scene_of=None):
    """Sample random (frame, frame+gap) index pairs into stacked arrays.

    `scene_of`: optional array mapping pack index -> scene id; pairs are
    only drawn within a scene (packs from several scenes concatenate)."""
    n = len(packs)
    gmax = max(gap_choices)
    while True:
        ia = rng.integers(0, n - gmax, size=batch_size)
        ib = ia + rng.choice(gap_choices, size=batch_size)
        if scene_of is None or all(scene_of[a] == scene_of[b]
                                   for a, b in zip(ia, ib)):
            break
    img = lambda idx: np.stack(
        [_augment(packs[i].image, rng) if augment else packs[i].image
         for i in idx])
    stack = lambda idx, field: np.stack(
        [getattr(packs[i], field) for i in idx])
    return {
        "image_a": img(ia), "image_b": img(ib),
        "kpts_a": stack(ia, "kpts"), "kpts_b": stack(ib, "kpts"),
        "valid_a": stack(ia, "valid"), "valid_b": stack(ib, "valid"),
        "lids_a": stack(ia, "lids"), "lids_b": stack(ib, "lids"),
        "labels_a": stack(ia, "labels"), "labels_b": stack(ib, "labels"),
    }


class DeviceDataset(NamedTuple):
    """Pre-rendered training frames staged ON DEVICE once.

    The axon TPU tunnel moves host->device at ~100 MB/s but device->host at
    well under 1 MB/s (measured round 2), so the only viable training loop
    shape is: upload the full pre-rendered dataset once, then drive every
    step with a handful of int32 frame indices — batching, augmentation,
    descriptor sampling and GT matching all happen inside the jitted step,
    and nothing but scalar losses ever crosses back to the host."""
    images: jnp.ndarray     # (F,H,W) f32
    labels: jnp.ndarray     # (F,Hc,Wc) i32 detector cell labels
    kpts: jnp.ndarray       # (F,N,2) GT keypoints
    valid: jnp.ndarray      # (F,N) bool
    lids: jnp.ndarray       # (F,N) i32 landmark ids (-1 invalid)
    scene_of: np.ndarray    # HOST (F,) scene id per frame


def stage_packs(scenes, num_frames: int, max_keypoints: int) -> DeviceDataset:
    packs, scene_of = [], []
    for si, sc in enumerate(scenes):
        packs.extend(render_pack(sc, i, max_keypoints)
                     for i in range(num_frames))
        scene_of.extend([si] * num_frames)
    return DeviceDataset(
        images=jnp.asarray(np.stack([p.image for p in packs])),
        labels=jnp.asarray(np.stack([p.labels for p in packs])),
        kpts=jnp.asarray(np.stack([p.kpts for p in packs])),
        valid=jnp.asarray(np.stack([p.valid for p in packs])),
        lids=jnp.asarray(
            np.stack([p.lids for p in packs]).astype(np.int32)),
        scene_of=np.asarray(scene_of))


def _sample_pairs(rng, scene_of, batch_size, gap_choices=(1, 2),
                  age_max=0):
    """(frame, frame+gap) index pairs drawn within a scene (host side —
    a few dozen bytes per step).

    With `age_max` > 0 also draws a descriptor-AGE frame `ic = ia - age`
    (age ~ U[0, age_max], clamped to the scene start): the matcher's
    synthetic re-observation inputs carry descriptors STORED when the map
    point was last seen, which can be several keyframes old, while its
    position is a fresh projection — training only on same-frame
    descriptors leaves that input out-of-distribution and the re-obs pass
    collapses after a few frames of staleness (measured:
    scripts/diag_frontend_accuracy.py age sweep — match recall at age 5
    was ~3% of age 1 before aging was added to training)."""
    n = len(scene_of)
    gmax = max(gap_choices)
    while True:
        ia = rng.integers(0, n - gmax, size=batch_size)
        ib = ia + rng.choice(gap_choices, size=batch_size)
        # Half the batch keeps fresh (age-0) descriptors so the dominant
        # inference input — the direct prev<->cur pass with current-frame
        # descriptors — stays on-distribution; the other half spreads
        # uniformly over [1, age_max] for the re-observation passes.
        age = np.where(rng.random(batch_size) < 0.5, 0,
                       rng.integers(1, age_max + 1, size=batch_size))
        ic = np.maximum(ia - age, 0)
        if all(scene_of[a] == scene_of[b] == scene_of[c]
               for a, b, c in zip(ia, ib, ic)):
            if age_max > 0:
                return (ia.astype(np.int32), ib.astype(np.int32),
                        ic.astype(np.int32))
            return ia.astype(np.int32), ib.astype(np.int32)


def _augment_device(imgs, key):
    """Device-side photometric augmentation — same distribution as
    `_augment` (gain/bias jitter + sensor noise), batched."""
    kg, kb, kn = jax.random.split(key, 3)
    B = imgs.shape[0]
    gain = 0.7 + 0.6 * jax.random.uniform(kg, (B, 1, 1))
    bias = 0.05 * (jax.random.uniform(kb, (B, 1, 1)) - 0.5)
    noise = 0.02 * jax.random.normal(kn, imgs.shape)
    return jnp.clip(imgs * gain + bias + noise, 0.0, 1.0)


def train_superpoint(sp_net, scene, num_frames: int, max_keypoints: int,
                     steps: int = 300, batch_size: int = 4,
                     lr: float = 1e-3, seed: int = 0, log_every: int = 0):
    """Returns trained params. Frames are pre-rendered once and staged on
    device; each step ships only the batch's frame indices + a PRNG key
    (see DeviceDataset for why).

    `scene` may be a single SyntheticScene or a list of scenes (more data
    diversity -> less memorization); pairs are drawn within a scene."""
    # NB: SyntheticScene is itself a NamedTuple — only a plain list counts
    # as "multiple scenes" here.
    scenes = scene if isinstance(scene, list) else [scene]
    ds = stage_packs(scenes, num_frames, max_keypoints)
    rng = np.random.default_rng(seed)
    H, W = scenes[0].height, scenes[0].width
    pad_h, pad_w = (-H) % 8, (-W) % 8
    if pad_h or pad_w:
        raise ValueError("train expects H,W multiples of 8")

    params = sp_net.init(jax.random.PRNGKey(seed),
                         jnp.zeros((1, H, W, 1), jnp.float32))
    # Global-norm clipping: the 9-layer flagship matcher's bf16 attention
    # occasionally produces exploding gradients mid-run (observed: loss ->
    # NaN between steps 400-600 of an LG retrain); clipping bounds the
    # update without changing the converged optimum.
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    # The dataset is an explicit jit ARGUMENT, not a closure: closed-over
    # device arrays are embedded in the serialized computation, and at
    # flagship shapes (hundreds of MB) that breaks the remote-compile
    # tunnel (HTTP 413) and slows every compile. As arguments they stay in
    # HBM and only buffer pointers cross per step.
    dev = {"images": ds.images, "labels": ds.labels, "kpts": ds.kpts,
           "valid": ds.valid, "lids": ds.lids}

    @jax.jit
    def step(params, opt_state, key, ia, ib, dev):
        ka, kb = jax.random.split(key)
        batch = {
            "image_a": _augment_device(dev["images"][ia], ka),
            "image_b": _augment_device(dev["images"][ib], kb),
            "kpts_a": dev["kpts"][ia], "kpts_b": dev["kpts"][ib],
            "valid_a": dev["valid"][ia], "valid_b": dev["valid"][ib],
            "lids_a": dev["lids"][ia], "lids_b": dev["lids"][ib],
            "labels_a": dev["labels"][ia], "labels_b": dev["labels"][ib],
        }
        (loss, aux), grads = jax.value_and_grad(
            lambda p: superpoint_loss(sp_net, p, batch), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    key = jax.random.PRNGKey(seed + 1)
    for it in range(steps):
        ia, ib = _sample_pairs(rng, ds.scene_of, batch_size)
        key, sk = jax.random.split(key)
        params, opt_state, loss, aux = step(params, opt_state, sk,
                                            jnp.asarray(ia), jnp.asarray(ib),
                                            dev)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"sp step {it}: loss={float(loss):.4f} "
                  f"det={float(aux['det']):.4f} "
                  f"desc={float(aux['desc']):.4f}", flush=True)
    return params


def _detect_features_staged(sp_net, sp_params, ds: DeviceDataset, N: int,
                            P: int, score_threshold: float, nms_radius: int,
                            offset_range: float, refine_centroid: bool,
                            subpix_patch: int = 7, chunk: int = 8):
    """Per-frame detections of the frozen SuperPoint + GT matches, staged
    entirely on device: (patches (F,N,P,P), desc (F,N,D), target (F,N,2),
    ok (F,N), lid (F,N)). `refine_centroid=True` mirrors the inference-time
    pair-subpix anchoring (centroid refine -> round -> patch) while False
    anchors at the integer detection (single-view SubpixHead semantics)."""
    from ..models.subpix import centroid_refine, gather_patches
    from ..models.superpoint import sample_descriptors
    from ..ops import nms as nms_ops

    @jax.jit
    def feats(images, kpts_gt, valid_gt, lids_gt):
        heat, grid = sp_net.apply(sp_params, images[..., None])
        kp, _, v = nms_ops.detect_keypoints(heat, N, score_threshold,
                                            nms_radius)
        kp_i = kp.astype(jnp.float32)
        if refine_centroid:
            kp_ref = jax.vmap(lambda im, k: centroid_refine(
                im, k, subpix_patch))(images, kp_i)
            anchor = jnp.round(kp_ref)
        else:
            kp_ref = anchor = kp_i
        patches = jax.vmap(lambda im, k: gather_patches(im, k, P))(
            images, anchor)
        desc = jax.vmap(sample_descriptors)(grid, kp_ref)
        d = jnp.linalg.norm(kp_ref[:, :, None, :] - kpts_gt[:, None, :, :],
                            axis=-1)
        d = jnp.where(valid_gt[:, None, :], d, jnp.inf)
        j = jnp.argmin(d, axis=2)
        ok = v & (jnp.min(d, axis=2) < 2.0)
        gtj = jnp.take_along_axis(kpts_gt, j[..., None], axis=1)
        lid = jnp.where(ok, jnp.take_along_axis(lids_gt, j, axis=1), -1)
        tgt = jnp.clip(gtj - anchor, -offset_range, offset_range)
        return patches, desc, tgt.astype(jnp.float32), ok, lid

    F = ds.images.shape[0]
    outs = [feats(ds.images[i:i + chunk], ds.kpts[i:i + chunk],
                  ds.valid[i:i + chunk], ds.lids[i:i + chunk])
            for i in range(0, F, chunk)]
    cat = lambda c: jnp.concatenate([o[c] for o in outs])
    return cat(0), cat(1), cat(2), cat(3), cat(4)


def train_subpix(subpix_head, sp_net, sp_params, scene, num_frames: int,
                 max_keypoints: int, steps: int = 400, batch_size: int = 4,
                 lr: float = 1e-3, seed: int = 2, log_every: int = 0,
                 nms_radius: int = 3, score_threshold: float = 1e-3):
    """Train the Keypt2Subpx-style head (models/subpix.SubpixHead):
    regress the true sub-pixel offset from (image patch around the INTEGER
    detection, sampled descriptor). Supervision pairs each detection of the
    frozen trained SuperPoint with its nearest ground-truth keypoint within
    2 px; the L2 loss is masked to matched detections. All data stays on
    device (DeviceDataset rationale); steps ship only frame indices."""
    scenes = scene if isinstance(scene, list) else [scene]
    rng = np.random.default_rng(seed)
    N = max_keypoints
    P = subpix_head.patch

    ds = stage_packs(scenes, num_frames, max_keypoints)
    patches, desc, target, ok, _ = _detect_features_staged(
        sp_net, sp_params, ds, N, P, score_threshold, nms_radius,
        subpix_head.offset_range, refine_centroid=False)
    F = int(ds.images.shape[0])
    D = desc.shape[-1]

    params = subpix_head.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((4, P, P), jnp.float32),
        jnp.zeros((4, D), jnp.float32))
    # Global-norm clipping: the 9-layer flagship matcher's bf16 attention
    # occasionally produces exploding gradients mid-run (observed: loss ->
    # NaN between steps 400-600 of an LG retrain); clipping bounds the
    # update without changing the converged optimum.
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    def loss_fn(p, pt, dc, tg, mk):
        off = subpix_head.apply(p, pt, dc)
        err = jnp.sum((off - tg) ** 2, axis=-1)
        return jnp.sum(jnp.where(mk, err, 0.0)) / jnp.maximum(mk.sum(), 1)

    # Dataset as jit argument, not closure (remote-compile size limit — see
    # train_superpoint)
    dev = {"patches": patches, "desc": desc, "target": target, "ok": ok}

    @jax.jit
    def step(params, opt_state, idx, dev):
        B = idx.shape[0]
        pt = dev["patches"][idx].reshape(B * N, P, P)
        dc = dev["desc"][idx].reshape(B * N, D)
        tg = dev["target"][idx].reshape(B * N, 2)
        mk = dev["ok"][idx].reshape(B * N)
        loss, grads = jax.value_and_grad(loss_fn)(params, pt, dc, tg, mk)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(steps):
        idx = jnp.asarray(rng.integers(0, F, size=batch_size), jnp.int32)
        params, opt_state, loss = step(params, opt_state, idx, dev)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"subpix step {it}: loss={float(loss):.4f}", flush=True)
    return params


def train_pair_subpix(pair_head, sp_net, sp_params, scene, num_frames: int,
                      max_keypoints: int, steps: int = 500,
                      batch_size: int = 4, lr: float = 1e-3, seed: int = 3,
                      log_every: int = 0, nms_radius: int = 3,
                      score_threshold: float = 1e-3,
                      subpix_patch: int = 7):
    """Train the PAIR-conditioned Keypt2Subpx head (models/subpix.
    PairSubpixHead): regress the current keypoint's true sub-pixel offset
    from (patch around the matched PREVIOUS detection, patch around the
    current detection, both descriptors, match score) — the reference's
    Keypt2Subpx consumes exactly this matched-pair context
    (`keypt2subpx.cpp:283-340`). Mirrors inference (slam/fused.py prologue):
    detections are centroid-refined, patches/targets anchor at
    round(centroid), descriptors are sampled at the refined coordinates,
    and the score input is the descriptor dot product (a [0,1] confidence
    proxy for the matcher's mscore)."""
    scenes = scene if isinstance(scene, list) else [scene]
    rng = np.random.default_rng(seed)
    N = max_keypoints
    P = pair_head.patch

    ds = stage_packs(scenes, num_frames, max_keypoints)
    patches, desc, target, ok, lid = _detect_features_staged(
        sp_net, sp_params, ds, N, P, score_threshold, nms_radius,
        pair_head.offset_range, refine_centroid=True,
        subpix_patch=subpix_patch)
    D = desc.shape[-1]

    # Consecutive in-scene frame pairs; GT landmark-id matching happens on
    # device inside the step (no host LUT, no readback)
    pa = np.asarray([a for a in range(len(ds.scene_of) - 1)
                     if ds.scene_of[a] == ds.scene_of[a + 1]], np.int32)

    params = pair_head.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((4, P, P), jnp.float32), jnp.zeros((4, P, P), jnp.float32),
        jnp.zeros((4, D), jnp.float32), jnp.zeros((4, D), jnp.float32),
        jnp.zeros((4,), jnp.float32))
    # Global-norm clipping: the 9-layer flagship matcher's bf16 attention
    # occasionally produces exploding gradients mid-run (observed: loss ->
    # NaN between steps 400-600 of an LG retrain); clipping bounds the
    # update without changing the converged optimum.
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    # Dataset as jit argument, not closure (remote-compile size limit — see
    # train_superpoint)
    dev = {"patches": patches, "desc": desc, "target": target, "lid": lid}

    @jax.jit
    def step(params, opt_state, ia, dev):
        patches, desc, target, lid = (dev["patches"], dev["desc"],
                                      dev["target"], dev["lid"])
        ib = ia + 1
        l0, l1 = lid[ia], lid[ib]                        # (B,N)
        eq = (l0[:, :, None] == l1[:, None, :]) & (l0 >= 0)[:, :, None]
        has = eq.any(-1)                                 # (B,N)
        j = jnp.argmax(eq, axis=-1)                      # (B,N)
        p0 = patches[ia]
        p1 = jnp.take_along_axis(patches[ib], j[..., None, None], axis=1)
        d0 = desc[ia]
        d1 = jnp.take_along_axis(desc[ib], j[..., None], axis=1)
        t1 = jnp.take_along_axis(target[ib], j[..., None], axis=1)
        score = jnp.clip(jnp.sum(d0 * d1, -1), 0.0, 1.0)
        B = ia.shape[0]
        M = B * N

        def loss_fn(p):
            off = pair_head.apply(p, p0.reshape(M, P, P),
                                  p1.reshape(M, P, P), d0.reshape(M, D),
                                  d1.reshape(M, D), score.reshape(M))
            err = jnp.sum((off - t1.reshape(M, 2)) ** 2, axis=-1)
            mk = has.reshape(M)
            return jnp.sum(jnp.where(mk, err, 0.0)) / jnp.maximum(
                mk.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(steps):
        ia = jnp.asarray(rng.choice(pa, size=batch_size), jnp.int32)
        params, opt_state, loss = step(params, opt_state, ia, dev)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"pair-subpix step {it}: loss={float(loss):.4f}",
                  flush=True)
    return params


def train_lightglue(lg_net, sp_net, sp_params, scene, num_frames: int,
                    max_keypoints: int, steps: int = 300,
                    batch_size: int = 2, lr: float = 8e-4, seed: int = 1,
                    jitter_px: float = 0.5, log_every: int = 0,
                    desc_age_max: int = 6):
    """Train the matcher on SP-sampled descriptors at GT keypoints.

    Descriptors come from the (frozen) trained SuperPoint at ground-truth
    keypoint locations (+ sub-pixel jitter), so the matcher learns the
    actual descriptor distribution it will see at inference.

    `desc_age_max` > 0 enables descriptor-age augmentation: set-0 keeps its
    frame-ia keypoint POSITIONS but draws each landmark's descriptor from
    its detection `age` frames earlier (age ~ U[0, desc_age_max]) — the
    exact input the map re-observation passes construct (stored descriptor
    + projected position, `get_matches_from_previous_frames` /
    `project_mpids_to_current`, slam_core.cpp:428-541, 1257-1340). Without
    it the matcher's recall on stale descriptors collapses within ~4 frames
    of staleness and the map starves (diag_frontend_accuracy age sweep)."""
    # NB: SyntheticScene is itself a NamedTuple — only a plain list counts
    # as "multiple scenes" here.
    scenes = scene if isinstance(scene, list) else [scene]
    ds = stage_packs(scenes, num_frames, max_keypoints)
    rng = np.random.default_rng(seed)
    H, W = scenes[0].height, scenes[0].width

    # Precompute descriptor grids once (frozen SP), chunked to bound the
    # conv activation peak, and KEEP THEM ON DEVICE (the flagship grid set
    # is ~0.8 GB — fine in HBM, ~40 min if read back over the tunnel)
    @jax.jit
    def grids_of(images):
        _, grid = sp_net.apply(sp_params, images[..., None])
        return grid
    F = int(ds.images.shape[0])
    all_grids = jnp.concatenate([grids_of(ds.images[i:i + 8])
                                 for i in range(0, F, 8)])

    kd = jnp.zeros((8, all_grids.shape[-1]))
    kk = jnp.zeros((8, 2)); km = jnp.ones((8,), bool)
    params = lg_net.init(jax.random.PRNGKey(seed), kd, kd, kk, kk, km, km)
    # Global-norm clipping: the 9-layer flagship matcher's bf16 attention
    # occasionally produces exploding gradients mid-run (observed: loss ->
    # NaN between steps 400-600 of an LG retrain); clipping bounds the
    # update without changing the converged optimum.
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    # Dataset as jit argument, not closure: the flagship grid set (~0.8 GB)
    # embedded as a compile-time constant exceeds the remote-compile
    # tunnel's request limit (HTTP 413) — as an argument it stays in HBM.
    dev = {"grids": all_grids, "kpts": ds.kpts, "valid": ds.valid,
           "lids": ds.lids}

    @jax.jit
    def step(params, opt_state, key, ia, ib, ic, dev):
        k0, k1, kc = jax.random.split(key, 3)
        kp0 = dev["kpts"][ia] + jitter_px * jax.random.normal(
            k0, dev["kpts"][ia].shape)
        kp1 = dev["kpts"][ib] + jitter_px * jax.random.normal(
            k1, dev["kpts"][ib].shape)
        desc0 = jax.vmap(sample_descriptors)(dev["grids"][ia], kp0)
        if desc_age_max > 0:
            # Descriptor-age augmentation: row j of set 0 keeps position
            # kp0[j] (frame ia) but takes the SAME landmark's descriptor
            # sampled from frame ic's grid at its frame-ic detection —
            # landmark correspondence resolved on device by lid equality.
            la, lc = dev["lids"][ia], dev["lids"][ic]          # (B,N)
            eq = (la[:, :, None] == lc[:, None, :]) & (la >= 0)[:, :, None]
            hasold = eq.any(-1)                                # (B,N)
            j = jnp.argmax(eq, axis=-1)                        # (B,N)
            kpc = jnp.take_along_axis(dev["kpts"][ic], j[..., None], axis=1)
            kpc = kpc + jitter_px * jax.random.normal(kc, kpc.shape)
            desc_aged = jax.vmap(sample_descriptors)(dev["grids"][ic], kpc)
            desc0 = jnp.where(hasold[..., None], desc_aged, desc0)
        batch = {
            "desc0": desc0,
            "desc1": jax.vmap(sample_descriptors)(dev["grids"][ib], kp1),
            "kpts0": kp0, "kpts1": kp1,
            "valid0": dev["valid"][ia], "valid1": dev["valid"][ib],
            "lids0": dev["lids"][ia], "lids1": dev["lids"][ib],
        }
        loss, grads = jax.value_and_grad(
            lambda p: lightglue_loss(lg_net, p, batch, H, W))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed + 17)
    for it in range(steps):
        if desc_age_max > 0:
            ia, ib, ic = _sample_pairs(rng, ds.scene_of, batch_size,
                                       age_max=desc_age_max)
        else:
            ia, ib = _sample_pairs(rng, ds.scene_of, batch_size)
            ic = ia
        key, sk = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sk,
                                       jnp.asarray(ia), jnp.asarray(ib),
                                       jnp.asarray(ic), dev)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"lg step {it}: loss={float(loss):.4f}", flush=True)
    return params
