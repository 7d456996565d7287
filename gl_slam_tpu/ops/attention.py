"""Pallas fused masked attention for the matcher (the hot kernel).

Why: the matcher's attention at N=2048 is MEMORY-bound under plain XLA — the
(heads, N, N) f32 logits round-trip to HBM between the two matmuls (~67 MB
per attention, 4 attentions x 9 layers ~ 2.4 GB of traffic per matched
frame). This kernel computes q@k^T, the masked softmax, and attn@v in one
VMEM-resident pass per (head, query-tile): logits never touch HBM. At the
matcher's sizes the whole K/V of one head fits in VMEM, so no online-softmax
streaming is needed — one tile of logits lives in registers/VMEM and dies
there (pallas_guide.md: fuse elementwise into matmuls, keep reuse in VMEM).

Numerics match the XLA reference implementation (tests/test_attention.py);
CPU/tests use interpret mode or the XLA fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def attention_xla(q, k, v, mask_k, scale):
    """Reference implementation. q,k,v: (H,N,dh); mask_k: (N,) bool."""
    logits = jnp.einsum('hnd,hmd->hnm', q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(mask_k[None, None, :], logits, _NEG)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('hnm,hmd->hnd', attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


def _attn_kernel(scale, q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]                                   # (TQ, dh)
    k = k_ref[0]                                   # (N, dh)
    v = v_ref[0]
    m = mask_ref[:]                                # (1, N) int32
    # Precision selected FROM THE OPERAND DTYPE, not the ambient context:
    # for bf16 operands an ambient jax.default_matmul_precision("float32")
    # (ops/precision.f32 wrappers — e.g. the matcher running inside
    # f32-wrapped detect_loop) would request an fp32-contract tpu.matmul
    # on bf16 inputs, which Mosaic rejects ("Bad lhs type") — bf16 inputs
    # + f32 accumulate (DEFAULT) is the MXU-native configuration. f32
    # operands keep HIGHEST so an f32-precision caller is not silently
    # downgraded to bf16 multiplies (advisor r4).
    prec = (jax.lax.Precision.DEFAULT if q.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec) * scale                        # (TQ, N)
    logits = jnp.where(m > 0, logits, _NEG)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    s = jnp.sum(e, axis=-1, keepdims=True)
    attn = (e / jnp.maximum(s, 1e-20)).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)


def attention_pallas(q, k, v, mask_k, scale, tile_q: int = 256,
                     interpret: bool = False):
    """Fused masked attention. q: (H,Nq,dh), k/v: (H,Nk,dh), mask_k: (Nk,).

    Grid over (head, query tile); K/V of the head stay resident in VMEM for
    all query tiles (VMEM budget at H=4, N=2048, dh=64 bf16: ~0.5 MB/head)."""
    H, Nq, dh = q.shape
    Nk = k.shape[1]
    tq = min(tile_q, Nq)
    grid = (H, pl.cdiv(Nq, tq))
    mask_i = mask_k.astype(jnp.int32)[None, :]      # (1, Nk) for tiling

    kernel = functools.partial(_attn_kernel, scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, dh), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, dh), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, dh), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk), lambda h, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dh), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Nq, dh), jnp.float32),
        interpret=interpret,
    )(q, k, v, mask_i)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_pallas_ad(q, k, v, mask_k, scale):
    """Pallas forward with an XLA-recompute backward: the kernel itself has
    no reverse rule, so training (train/frontend_train.py) recomputes the
    logits/softmax in plain XLA for the VJP — at matcher sizes the recompute
    is cheap and HBM easily holds one (H,N,N) attention for the backward."""
    return attention_pallas(q, k, v, mask_k, scale)


def _attn_fwd(q, k, v, mask_k, scale):
    return attention_pallas(q, k, v, mask_k, scale), (q, k, v, mask_k)


def _attn_bwd(scale, res, g):
    q, k, v, mask_k = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_xla(q_, k_, v_, mask_k,
                                                      scale), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_attention_pallas_ad.defvjp(_attn_fwd, _attn_bwd)


def attention(q, k, v, mask_k, scale, use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU at large N, XLA elsewhere.

    Small sets (tiny test models, sparse synthetic keypoint sets) stay on
    XLA: the kernel's win is keeping the (N,N) logits out of HBM, which is
    irrelevant below ~256 keypoints — and Mosaic rejects some sub-tile bf16
    matmul shapes there outright."""
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and q.shape[-2] >= 256 and k.shape[-2] >= 256)
    if use_pallas:
        return _attention_pallas_ad(q, k, v, mask_k, float(scale))
    return attention_xla(q, k, v, mask_k, scale)
