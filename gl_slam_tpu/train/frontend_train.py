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


def train_superpoint(sp_net, scene, num_frames: int, max_keypoints: int,
                     steps: int = 300, batch_size: int = 4,
                     lr: float = 1e-3, seed: int = 0, log_every: int = 0):
    """Returns trained params. Frames are pre-rendered once.

    `scene` may be a single SyntheticScene or a list of scenes (more data
    diversity -> less memorization); pairs are drawn within a scene."""
    # NB: SyntheticScene is itself a NamedTuple — only a plain list counts
    # as "multiple scenes" here.
    scenes = scene if isinstance(scene, list) else [scene]
    packs, scene_of = [], []
    for si, sc in enumerate(scenes):
        packs.extend(render_pack(sc, i, max_keypoints)
                     for i in range(num_frames))
        scene_of.extend([si] * num_frames)
    scene = scenes[0]
    rng = np.random.default_rng(seed)
    H, W = scene.height, scene.width
    pad_h, pad_w = (-H) % 8, (-W) % 8
    if pad_h or pad_w:
        raise ValueError("train expects H,W multiples of 8")

    params = sp_net.init(jax.random.PRNGKey(seed),
                         jnp.zeros((1, H, W, 1), jnp.float32))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: superpoint_loss(sp_net, p, batch), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    for it in range(steps):
        batch = {k: jnp.asarray(v)
                 for k, v in _pair_batch(packs, rng, batch_size,
                                         scene_of=scene_of).items()}
        params, opt_state, loss, aux = step(params, opt_state, batch)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"sp step {it}: loss={float(loss):.4f} "
                  f"det={float(aux['det']):.4f} "
                  f"desc={float(aux['desc']):.4f}", flush=True)
    return params


def train_subpix(subpix_head, sp_net, sp_params, scene, num_frames: int,
                 max_keypoints: int, steps: int = 400, batch_size: int = 4,
                 lr: float = 1e-3, seed: int = 2, log_every: int = 0,
                 nms_radius: int = 3, score_threshold: float = 1e-3):
    """Train the Keypt2Subpx-style head (models/subpix.SubpixHead):
    regress the true sub-pixel offset from (image patch around the INTEGER
    detection, sampled descriptor). Supervision pairs each detection of the
    frozen trained SuperPoint with its nearest ground-truth keypoint within
    2 px; the L2 loss is masked to matched detections."""
    import jax
    import jax.numpy as jnp

    from ..models.subpix import gather_patches
    from ..models.superpoint import sample_descriptors
    from ..ops import nms as nms_ops

    scenes = scene if isinstance(scene, list) else [scene]
    rng = np.random.default_rng(seed)
    N = max_keypoints
    P = subpix_head.patch

    # Pre-extract: integer detections + target offsets per frame
    data = []
    for sc in scenes:
        for i in range(num_frames):
            obs = synthetic.observe_frame(sc, i, max_keypoints=N)
            img = synthetic.render_frame(sc, i, max_keypoints=N)
            heat, grid = sp_net.apply(sp_params,
                                      jnp.asarray(img)[None, ..., None])
            kp, scr, v = nms_ops.detect_keypoints(
                heat, N, score_threshold, nms_radius)
            kp_i = np.asarray(kp[0], np.float32)
            vv = np.asarray(v[0])
            gt = obs.keypoints[obs.valid]
            if len(gt) == 0:
                continue
            d = np.linalg.norm(kp_i[:, None, :] - gt[None, :, :], axis=2)
            j = d.argmin(axis=1)
            ok = vv & (d.min(axis=1) < 2.0)
            target = np.clip(gt[j] - kp_i, -subpix_head.offset_range,
                             subpix_head.offset_range)
            desc = np.asarray(jax.vmap(
                lambda k: sample_descriptors(grid[0], k[None])[0])(
                jnp.asarray(kp_i)))
            patches = np.asarray(gather_patches(jnp.asarray(img),
                                                jnp.asarray(kp_i), P))
            data.append((patches, desc, target.astype(np.float32), ok))

    params = subpix_head.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((4, P, P), jnp.float32),
        jnp.zeros((4, data[0][1].shape[1]), jnp.float32))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, patches, desc, target, ok):
        off = subpix_head.apply(p, patches, desc)
        err = jnp.sum((off - target) ** 2, axis=-1)
        return jnp.sum(jnp.where(ok, err, 0.0)) / jnp.maximum(ok.sum(), 1)

    @jax.jit
    def step(params, opt_state, patches, desc, target, ok):
        loss, grads = jax.value_and_grad(loss_fn)(params, patches, desc,
                                                  target, ok)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(steps):
        idx = rng.integers(0, len(data), size=batch_size)
        patches = jnp.asarray(np.concatenate([data[i][0] for i in idx]))
        desc = jnp.asarray(np.concatenate([data[i][1] for i in idx]))
        target = jnp.asarray(np.concatenate([data[i][2] for i in idx]))
        ok = jnp.asarray(np.concatenate([data[i][3] for i in idx]))
        params, opt_state, loss = step(params, opt_state, patches, desc,
                                       target, ok)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"subpix step {it}: loss={float(loss):.4f}", flush=True)
    return params


def train_lightglue(lg_net, sp_net, sp_params, scene, num_frames: int,
                    max_keypoints: int, steps: int = 300,
                    batch_size: int = 2, lr: float = 8e-4, seed: int = 1,
                    jitter_px: float = 0.5, log_every: int = 0):
    """Train the matcher on SP-sampled descriptors at GT keypoints.

    Descriptors come from the (frozen) trained SuperPoint at ground-truth
    keypoint locations (+ sub-pixel jitter), so the matcher learns the
    actual descriptor distribution it will see at inference."""
    # NB: SyntheticScene is itself a NamedTuple — only a plain list counts
    # as "multiple scenes" here.
    scenes = scene if isinstance(scene, list) else [scene]
    packs, scene_of = [], []
    for si, sc in enumerate(scenes):
        packs.extend(render_pack(sc, i, max_keypoints)
                     for i in range(num_frames))
        scene_of.extend([si] * num_frames)
    scene = scenes[0]
    rng = np.random.default_rng(seed)
    H, W = scene.height, scene.width

    # Precompute descriptor grids once (frozen SP)
    @jax.jit
    def grids_of(images):
        _, grid = sp_net.apply(sp_params, images[..., None])
        return grid
    all_grids = np.asarray(grids_of(
        jnp.asarray(np.stack([p.image for p in packs]))))

    kd = jnp.zeros((8, all_grids.shape[-1]))
    kk = jnp.zeros((8, 2)); km = jnp.ones((8,), bool)
    params = lg_net.init(jax.random.PRNGKey(seed), kd, kd, kk, kk, km, km)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: lightglue_loss(lg_net, p, batch, H, W))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(packs)
    for it in range(steps):
        while True:
            ia = rng.integers(0, n - 2, size=batch_size)
            ib = ia + rng.choice((1, 2), size=batch_size)
            if all(scene_of[a] == scene_of[b] for a, b in zip(ia, ib)):
                break
        b = {"desc0": [], "desc1": [], "kpts0": [], "kpts1": [],
             "valid0": [], "valid1": [], "lids0": [], "lids1": []}
        for i0, i1 in zip(ia, ib):
            for tag, i in (("0", i0), ("1", i1)):
                p = packs[i]
                k = p.kpts + rng.normal(scale=jitter_px,
                                        size=p.kpts.shape).astype(np.float32)
                d = sample_descriptors(jnp.asarray(all_grids[i]),
                                       jnp.asarray(k))
                b[f"desc{tag}"].append(np.asarray(d))
                b[f"kpts{tag}"].append(k)
                b[f"valid{tag}"].append(p.valid)
                b[f"lids{tag}"].append(p.lids)
        batch = {k: jnp.asarray(np.stack(v)) for k, v in b.items()}
        params, opt_state, loss = step(params, opt_state, batch)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"lg step {it}: loss={float(loss):.4f}", flush=True)
    return params
