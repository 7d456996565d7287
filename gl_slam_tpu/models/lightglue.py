"""LightGlue-style attention matcher (Flax) — fixed-N, masked, bf16.

TPU-native replacement for the reference's LightGlue TensorRT engine
(`/root/reference/src/core/lightglue.cpp`: dynamic N in [1,2048] via
optimization profiles `lightglue.cpp:64-92`, keypoints normalized to [-1,1]
`:296-304`, outputs matches0/1 with -1 sentinel + mscores `:204-294`).
Dynamic shapes are anathema to XLA — here N is the fixed keypoint budget and
invalid slots are masked, which also removes the reference's per-call
device-buffer churn.

Architecture (LightGlue paper shape): L transformer layers, each doing
masked self-attention (with rotary 2D positional encoding on keypoint
coordinates) then bidirectional cross-attention, followed by a dual-softmax
assignment head with per-keypoint matchability. The adaptive early-exit of
the original is intentionally dropped: a fixed-depth network is one XLA
program with no data-dependent control flow (SURVEY.md §7 step 3).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops

_NEG = -1e9


class MatchOutput(NamedTuple):
    matches0: jnp.ndarray   # (N,) int32 into set1, -1 = none
    mscores0: jnp.ndarray   # (N,) float32
    matches1: jnp.ndarray   # (M,) int32 into set0
    mscores1: jnp.ndarray   # (M,)
    scores: jnp.ndarray     # (N,M) assignment probabilities


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


class RotaryEncoding(nn.Module):
    """Learnable 2D rotary positional encoding on normalized keypoints."""
    head_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, kpts):               # (N,2) in [-1,1]
        freqs = nn.Dense(self.head_dim // 2, use_bias=False,
                         dtype=jnp.float32, name="freqs")(kpts)  # (N,hd/2)
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        return jnp.cos(emb), jnp.sin(emb)   # each (N,hd)


def _apply_rotary(x, cos, sin):
    # x: (H,N,hd); cos/sin: (N,hd)
    return x * cos[None] + _rotate_half(x) * sin[None]


class Attention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, source, mask_q, mask_k, rot_q=None, rot_k=None):
        """x attends to source. x: (N,dim), source: (M,dim)."""
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(source)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(source)
        q = q.reshape(-1, self.heads, hd).transpose(1, 0, 2)   # (H,N,hd)
        k = k.reshape(-1, self.heads, hd).transpose(1, 0, 2)
        v = v.reshape(-1, self.heads, hd).transpose(1, 0, 2)
        if rot_q is not None:
            q = _apply_rotary(q, *rot_q)
            k = _apply_rotary(k, *rot_k)
        # Fused Pallas attention on TPU: logits stay in VMEM (ops/attention)
        out = attn_ops.attention(q.astype(self.dtype), k.astype(self.dtype),
                                 v, mask_k, 1.0 / float(hd) ** 0.5)
        out = out.transpose(1, 0, 2).reshape(-1, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="o")(out)
        return jnp.where(mask_q[:, None], out, 0.0)


class GlueLayer(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, d0, d1, rot0, rot1, m0, m1):
        """One matcher layer over both sets. rot = (cos, sin) tuples.

        Self- and cross-attention weights are shared between the two sets
        (LightGlue paper). When the sets have EQUAL size, each pair runs as
        ONE batched attention call (nn.vmap with broadcast params — the
        parameter tree is identical to per-set calls, keeping checkpoints
        compatible): half the kernel launches, twice the per-call
        parallelism. Unequal sets (small synthetic re-observation sets vs
        the full frame) keep per-set calls at their TRUE sizes — padding the
        small set up to the large one would forfeit exactly the compute
        saving the small set exists for (the reference's dynamic-N TensorRT
        profiles, lightglue.cpp:64-92, are this same economics)."""
        mlp_s = nn.Sequential([
            nn.Dense(2 * self.dim, dtype=self.dtype), nn.gelu,
            nn.Dense(self.dim, dtype=self.dtype)])
        mlp_c = nn.Sequential([
            nn.Dense(2 * self.dim, dtype=self.dtype), nn.gelu,
            nn.Dense(self.dim, dtype=self.dtype)])
        if d0.shape == d1.shape:
            AttnB = nn.vmap(Attention, variable_axes={"params": None},
                            split_rngs={"params": False})
            sa = AttnB(self.dim, self.heads, self.dtype, name="self_attn")
            ca = AttnB(self.dim, self.heads, self.dtype, name="cross_attn")
            d = jnp.stack([d0, d1])
            rot = (jnp.stack([rot0[0], rot1[0]]),
                   jnp.stack([rot0[1], rot1[1]]))
            m = jnp.stack([m0, m1])
            d = d + mlp_s(jnp.concatenate(
                [d, sa(d, d, m, m, rot, rot)], axis=-1))
            c = ca(d, d[::-1], m, m[::-1], None, None)
            d = d + mlp_c(jnp.concatenate([d, c], axis=-1))
            return d[0], d[1]
        sa = Attention(self.dim, self.heads, self.dtype, name="self_attn")
        ca = Attention(self.dim, self.heads, self.dtype, name="cross_attn")
        d0 = d0 + mlp_s(jnp.concatenate(
            [d0, sa(d0, d0, m0, m0, rot0, rot0)], axis=-1))
        d1 = d1 + mlp_s(jnp.concatenate(
            [d1, sa(d1, d1, m1, m1, rot1, rot1)], axis=-1))
        c0 = ca(d0, d1, m0, m1)
        c1 = ca(d1, d0, m1, m0)
        d0 = d0 + mlp_c(jnp.concatenate([d0, c0], axis=-1))
        d1 = d1 + mlp_c(jnp.concatenate([d1, c1], axis=-1))
        return d0, d1


class LightGlueNet(nn.Module):
    dim: int = 256
    heads: int = 4
    layers: int = 9
    input_dim: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, desc0, desc1, kpts0, kpts1, m0, m1,
                 return_features: bool = False):
        """desc: (N,Din); kpts normalized to [-1,1]; m: validity masks.
        Returns (sim (N,M) log-assignment scores matrix components), or —
        with `return_features=True` — the pre-similarity projections
        (f0, f1, z0, z1) so the caller can run the fused Pallas assignment
        (ops/assignment.py) without ever materializing the (N,M) matrix.
        sim = f0 @ f1^T / sqrt(dim); the parameter tree is identical either
        way (checkpoint-compatible)."""
        inp = nn.Dense(self.dim, dtype=self.dtype, name="inp")
        d0 = inp(desc0.astype(self.dtype))
        d1 = inp(desc1.astype(self.dtype))
        rope = RotaryEncoding(self.dim // self.heads, name="rope")
        rot0 = rope(kpts0)
        rot1 = rope(kpts1)
        for i in range(self.layers):
            d0, d1 = GlueLayer(self.dim, self.heads, self.dtype,
                               name=f"layer{i}")(d0, d1, rot0, rot1, m0, m1)
        final = nn.Dense(self.dim, dtype=self.dtype, name="final")
        f0 = final(d0)
        f1 = final(d1)
        matchability = nn.Dense(1, dtype=jnp.float32, name="matchability")
        z0 = matchability(d0.astype(jnp.float32))[:, 0]
        z1 = matchability(d1.astype(jnp.float32))[:, 0]
        if return_features:
            return f0, f1, z0, z1
        sim = jnp.einsum('nd,md->nm', f0, f1,
                         preferred_element_type=jnp.float32)
        sim = sim / jnp.sqrt(float(self.dim))
        return sim, z0, z1


def assignment(sim, z0, z1, m0, m1, threshold: float):
    """Dual-softmax + matchability -> mutual matches (fixed shapes).

    Output convention identical to the reference result struct
    (`lightglue.cpp:204-294`): index arrays with -1 sentinel + scores.
    """
    sim = jnp.where(m0[:, None] & m1[None, :], sim, _NEG)
    p0 = jax.nn.log_softmax(sim, axis=1)        # over set1 for each of set0
    p1 = jax.nn.log_softmax(sim, axis=0)
    cert0 = jax.nn.log_sigmoid(z0)[:, None]
    cert1 = jax.nn.log_sigmoid(z1)[None, :]
    scores = jnp.exp(p0 + p1 + cert0 + cert1)   # (N,M)

    nn0 = jnp.argmax(scores, axis=1)
    nn1 = jnp.argmax(scores, axis=0)
    s0 = jnp.max(scores, axis=1)
    s1 = jnp.max(scores, axis=0)
    mutual0 = nn1[nn0] == jnp.arange(scores.shape[0])
    ok0 = mutual0 & m0 & (s0 > threshold)
    matches0 = jnp.where(ok0, nn0.astype(jnp.int32), -1)
    mutual1 = nn0[nn1] == jnp.arange(scores.shape[1])
    ok1 = mutual1 & m1 & (s1 > threshold)
    matches1 = jnp.where(ok1, nn1.astype(jnp.int32), -1)
    return MatchOutput(matches0=matches0, mscores0=jnp.where(ok0, s0, 0.0),
                       matches1=matches1, mscores1=jnp.where(ok1, s1, 0.0),
                       scores=scores)


def normalize_keypoints(kpts: jnp.ndarray, height: int,
                        width: int) -> jnp.ndarray:
    """Pixel -> [-1,1] normalization (reference `lightglue.cpp:296-304`:
    shift by half-size, scale by half the larger side)."""
    size = jnp.asarray([width, height], jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size) / 2.0
    return (kpts - shift) / scale


class LightGlueMatcher:
    """Jitted batched matcher. vmapped over pairs; fixed N."""

    def __init__(self, height: int, width: int, input_dim: int = 256,
                 dim: int = 256, heads: int = 4, layers: int = 9,
                 threshold: float = 0.1, seed: int = 0):
        self.height = height
        self.width = width
        self.threshold = threshold
        self.net = LightGlueNet(dim=dim, heads=heads, layers=layers,
                                input_dim=input_dim)
        N = 8
        dummy_d = jnp.zeros((N, input_dim), jnp.float32)
        dummy_k = jnp.zeros((N, 2), jnp.float32)
        dummy_m = jnp.ones((N,), bool)
        self.params = self.net.init(jax.random.PRNGKey(seed), dummy_d,
                                    dummy_d, dummy_k, dummy_k, dummy_m,
                                    dummy_m)
        self._fn = jax.jit(self._match_batch)

    def _match_one(self, params, kpts0, desc0, m0, kpts1, desc1, m1):
        k0 = normalize_keypoints(kpts0, self.height, self.width)
        k1 = normalize_keypoints(kpts1, self.height, self.width)
        sim, z0, z1 = self.net.apply(params, desc0, desc1, k0, k1, m0, m1)
        return assignment(sim, z0, z1, m0, m1, self.threshold)

    def _match_batch(self, params, kpts0, desc0, m0, kpts1, desc1, m1):
        return jax.vmap(self._match_one,
                        in_axes=(None, 0, 0, 0, 0, 0, 0))(
            params, kpts0, desc0, m0, kpts1, desc1, m1)

    def __call__(self, kpts0, desc0, valid0, kpts1, desc1, valid1):
        """All args batched (B,N,...). Returns batched MatchOutput."""
        return self._fn(self.params, kpts0, desc0, valid0, kpts1, desc1,
                        valid1)
