"""Attention-kernel variants at matcher shapes (H=2, N=2048, dh=128).

Times the fused kernel, XLA reference, a no-softmax matmul-only bound, and
softmax-precision/tile variants, inside a 9-deep scan (one matcher pass)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L = 9          # layers per pass -> 2x self + 2x cross per layer = 4 calls
_NEG = -1e9


def bench(name, fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>40}: {dt*1e3:8.2f} ms/{4*L}calls "
          f"{dt*1e3/(4*L)*1000:7.1f} us/call", flush=True)


def kernel_var(scale, softmax_dtype, q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    m = mask_ref[:]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(m > 0, logits, _NEG)
    mx = jnp.max(logits, axis=-1, keepdims=True)
    x = (logits - mx).astype(softmax_dtype)
    e = jnp.exp(x)
    s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    attn = (e.astype(jnp.float32) / jnp.maximum(s, 1e-20)).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def kernel_nosm(scale, q_ref, k_ref, v_ref, mask_ref, o_ref):
    q = q_ref[0]; k = k_ref[0]; v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    o_ref[0] = jax.lax.dot_general(
        logits.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def make_pallas(kernel, H, Nq, Nk, dh, tq):
    def fn(q, k, v, m):
        grid = (H, pl.cdiv(Nq, tq))
        return pl.pallas_call(
            kernel, grid=grid,
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
        )(q, k, v, m)
    return fn


def main():
    from gl_slam_tpu.ops import attention as attn_ops

    H, N, dh = 2, 2048, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (H, N, dh), jnp.bfloat16)
    k = jax.random.normal(key, (H, N, dh), jnp.bfloat16)
    v = jax.random.normal(key, (H, N, dh), jnp.bfloat16)
    m = jnp.ones((N,), bool)
    mi = m.astype(jnp.int32)[None, :]
    scale = 1.0 / dh ** 0.5

    def scan_calls(call):
        def fn(q, k, v):
            def body(c, _):
                o = call(c, k, v)
                return o.astype(jnp.bfloat16), None
            return jax.lax.scan(body, q, None, length=4 * L)[0]
        return jax.jit(fn)

    bench("xla reference", scan_calls(
        lambda q, k, v: attn_ops.attention_xla(q, k, v, m, scale)), q, k, v)
    for tq in (256, 512, 1024):
        bench(f"pallas f32 softmax tq={tq}", scan_calls(
            lambda q, k, v, tq=tq: make_pallas(
                functools.partial(kernel_var, scale, jnp.float32),
                H, N, N, dh, tq)(q, k, v, mi)), q, k, v)
    bench("pallas bf16 exp tq=512", scan_calls(
        lambda q, k, v: make_pallas(
            functools.partial(kernel_var, scale, jnp.bfloat16),
            H, N, N, dh, 512)(q, k, v, mi)), q, k, v)
    bench("pallas NO softmax (bound) tq=512", scan_calls(
        lambda q, k, v: make_pallas(
            functools.partial(kernel_nosm, scale),
            H, N, N, dh, 512)(q, k, v, mi)), q, k, v)

    def kernel_bf16out(scale, q_ref, k_ref, v_ref, mask_ref, o_ref):
        # f32 accumulate (Mosaic requires 32-bit acc), bf16 store
        q = q_ref[0]; k = k_ref[0]; v = v_ref[0]
        m = mask_ref[:]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(m > 0, logits, _NEG)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        s = jnp.sum(e, axis=-1, keepdims=True)
        attn = (e / jnp.maximum(s, 1e-20)).astype(v.dtype)
        o_ref[0] = jax.lax.dot_general(
            attn, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def make_pallas_o16(kernel, H, Nq, Nk, dh, tq):
        def fn(q, k, v, m):
            grid = (H, pl.cdiv(Nq, tq))
            return pl.pallas_call(
                kernel, grid=grid,
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
                out_shape=jax.ShapeDtypeStruct((H, Nq, dh), jnp.bfloat16),
            )(q, k, v, m)
        return fn

    bench("pallas f32 + bf16 OUT tq=512", scan_calls(
        lambda q, k, v: make_pallas_o16(
            functools.partial(kernel_bf16out, scale),
            H, N, N, dh, 512)(q, k, v, mi)), q, k, v)

    # batched B=2 (pair path) via vmap
    qb = jnp.stack([q, q]); kb = jnp.stack([k, k]); vb = jnp.stack([v, v])
    pal = make_pallas(functools.partial(kernel_var, scale, jnp.float32),
                      H, N, N, dh, 512)
    def call_b(c, k_, v_):
        return jax.vmap(lambda cc, kk, vv: pal(cc, kk, vv, mi))(c, k_, v_)
    bench("pallas f32 tq=512 vmap B=2 (2x work)", scan_calls(call_b),
          qb, kb, vb)


if __name__ == "__main__":
    main()
