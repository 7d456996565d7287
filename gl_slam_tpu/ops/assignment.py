"""Fused dual-softmax assignment head (Pallas) — the matcher epilogue.

Why: the plain-XLA assignment (`models/lightglue.py:assignment`) materializes
the (N,M) similarity matrix plus `p0`, `p1` and `scores` — four full (N,M)
f32 HBM round trips (~64 MB at N=M=2048) per matcher call, and the hot loop
runs THREE matcher calls per frame (prev<->cur + two synthetic re-observation
passes, mirroring `/root/reference/src/threading/thread_pool.cpp:110,140` +
`/root/reference/src/core/slam_core.cpp:527`). The hot path only ever
consumes `matches0/1` + `mscores0/1` (slam/fused.py) — never the dense
scores — so the whole epilogue reduces to per-row/per-column reductions.

The algebra that makes the fusion cheap: with
  lse_r[i] = logsumexp_j sim[i,j],   lse_c[j] = logsumexp_i sim[i,j],
  c0[i] = log_sigmoid(z0[i]),        c1[j] = log_sigmoid(z1[j]),
the assignment score is
  scores[i,j] = exp(2*sim[i,j] - lse_r[i] - lse_c[j] + c0[i] + c1[j]).
Per-row terms are constant within a row, so
  nn0[i] = argmax_j (2*sim[i,j] + c1[j] - lse_c[j])
  nn1[j] = argmax_i (2*sim[i,j] + c0[i] - lse_r[i])
and the max score follows from the same reductions — no (N,M) tensor ever
needs to exist in HBM. The kernel recomputes the logits tile from the
final-projection features f0 @ f1^T (a 256-deep matmul, ~2x2 GFLOP — cheap
on the MXU compared to the ~64 MB of HBM traffic it replaces) in two
fori_loop passes over row tiles, everything VMEM-resident:

  pass 1: row logsumexp per tile + online column logsumexp;
  pass 2: row argmax/max of the matchability-adjusted objective + online
          column argmax/max.

The kernel is GRID-FREE (tiling is an internal fori_loop): pallas_call's
vmap batching rule prepends a batch grid dimension, which would silently
re-index a program_id-keyed accumulator — with no grid there is nothing to
re-index, so the same kernel serves the vmapped chunk prologue and the
multi-stream tracker. A tiny XLA epilogue does the mutual-NN check and
thresholding on (N,)/(M,) vectors. Numerics match `assignment`
(tests/test_assignment.py); CPU/tests use interpret mode or the XLA
fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.lightglue import MatchOutput, assignment as assignment_xla

_NEG = -1e9


def _assign_kernel(scale, tq, f0_ref, f1_ref, m0_ref, m1_ref, c0_ref,
                   c1_ref, nn0_ref, v0_ref, lser_ref, nn1_ref, v1_ref,
                   lsec_ref):
    N = f0_ref.shape[0]
    M = f1_ref.shape[0]
    nt = N // tq
    f1 = f1_ref[:]
    m1 = m1_ref[:]                                    # (1, M) int32
    colmask = m1 > 0

    def tile_logits(i, mul):
        # m0/c0 arrive pre-reshaped to (nt, tq) so every dynamic slice is on
        # the sublane dim (lane-dim dynamic slicing is a Mosaic minefield)
        f0 = f0_ref[pl.ds(i * tq, tq), :]
        m0 = m0_ref[pl.ds(i, 1), :].reshape(tq)
        l = jax.lax.dot_general(
            f0, f1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (mul * scale)
        return jnp.where((m0[:, None] > 0) & colmask, l, _NEG)

    # ---- pass 1: row lse per tile + online column lse -------------------
    def lse_body(i, carry):
        cmax, csum = carry
        logits = tile_logits(i, 1.0)
        rmx = jnp.max(logits, axis=1, keepdims=True)
        rs = jnp.sum(jnp.exp(logits - rmx), axis=1, keepdims=True)
        lser_ref[pl.ds(i, 1), :] = (rmx + jnp.log(rs)).reshape(1, tq)
        tile_cmax = jnp.max(logits, axis=0, keepdims=True)
        cm_new = jnp.maximum(cmax, tile_cmax)
        tile_sum = jnp.sum(jnp.exp(logits - cm_new), axis=0, keepdims=True)
        return cm_new, csum * jnp.exp(cmax - cm_new) + tile_sum

    f32 = jnp.float32
    cmax0 = jnp.full((1, M), _NEG, f32)
    csum0 = jnp.zeros((1, M), f32)
    cmax, csum = jax.lax.fori_loop(0, nt, lse_body, (cmax0, csum0))
    lse_c = cmax + jnp.log(jnp.maximum(csum, 1e-30))
    lsec_ref[:] = lse_c

    # ---- pass 2: row/column argmax of the adjusted objective ------------
    cc1 = jnp.where(colmask, c1_ref[:] - lse_c, _NEG)  # (1, M)

    def arg_body(i, carry):
        cbest, cidx = carry
        l2 = tile_logits(i, 2.0)
        gr = l2 + cc1                                  # (tq, M)
        rbest = jnp.max(gr, axis=1)
        jidx = jax.lax.broadcasted_iota(jnp.int32, gr.shape, 1)
        ridx = jnp.min(jnp.where(gr >= rbest[:, None], jidx, M), axis=1)
        v0_ref[pl.ds(i, 1), :] = rbest.reshape(1, tq)
        nn0_ref[pl.ds(i, 1), :] = ridx.astype(jnp.int32).reshape(1, tq)
        # Guard like cc1: a masked row has lse_r ~ _NEG, so the unguarded
        # constant c0 - lse_r ~ +1e9 would win every column argmax
        m0 = m0_ref[pl.ds(i, 1), :].reshape(tq)
        r0 = jnp.where(m0 > 0,
                       c0_ref[pl.ds(i, 1), :].reshape(tq)
                       - lser_ref[pl.ds(i, 1), :].reshape(tq), _NEG)
        gc = l2 + r0[:, None]
        tile_best = jnp.max(gc, axis=0, keepdims=True)
        iidx = jax.lax.broadcasted_iota(jnp.int32, gc.shape, 0)
        tile_idx = jnp.min(
            jnp.where(gc >= tile_best, iidx + i * tq, jnp.int32(2 ** 30)),
            axis=0, keepdims=True)
        better = tile_best > cbest
        return (jnp.where(better, tile_best, cbest),
                jnp.where(better, tile_idx, cidx))

    cbest0 = jnp.full((1, M), _NEG - 1.0, f32)
    cidx0 = jnp.zeros((1, M), jnp.int32)
    cbest, cidx = jax.lax.fori_loop(0, nt, arg_body, (cbest0, cidx0))
    v1_ref[:] = cbest
    nn1_ref[:] = cidx


def _fused_reductions(f0, f1, c0, c1, m0, m1, scale, tile_q, interpret):
    N, Df = f0.shape
    M = f1.shape[0]
    tq = tile_q if N % tile_q == 0 else N
    nt = N // tq
    m0i = m0.astype(jnp.int32).reshape(nt, tq)
    m1i = m1.astype(jnp.int32)[None, :]
    f32 = jnp.float32
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    nn0, v0, lse_r, nn1, v1, lse_c = pl.pallas_call(
        functools.partial(_assign_kernel, scale, tq),
        in_specs=[vm() for _ in range(6)],
        out_specs=[vm() for _ in range(6)],
        out_shape=[jax.ShapeDtypeStruct((nt, tq), jnp.int32),
                   jax.ShapeDtypeStruct((nt, tq), f32),
                   jax.ShapeDtypeStruct((nt, tq), f32),
                   jax.ShapeDtypeStruct((1, M), jnp.int32),
                   jax.ShapeDtypeStruct((1, M), f32),
                   jax.ShapeDtypeStruct((1, M), f32)],
        interpret=interpret,
    )(f0, f1, m0i, m1i, c0.reshape(nt, tq), c1[None, :])
    return (nn0.reshape(N), v0.reshape(N), lse_r.reshape(N),
            nn1[0], v1[0], lse_c[0])


def fused_assignment(f0, f1, z0, z1, m0, m1, scale: float,
                     threshold: float = 0.0, tile_q: int = 512,
                     use_pallas: bool | None = None,
                     interpret: bool = False) -> MatchOutput:
    """Matcher assignment directly from final-projection features.

    f0: (N,Df), f1: (M,Df) — the `final` Dense outputs; sim = f0@f1^T*scale.
    Returns MatchOutput with `scores=None` (the dense matrix is never
    formed); use the XLA `assignment` when the full matrix is needed
    (training loss, visualization).
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu",)
                      and f0.shape[0] >= 256 and f1.shape[0] >= 256
                      and not interpret)
    if not (use_pallas or interpret):
        sim = jnp.einsum('nd,md->nm', f0, f1,
                         preferred_element_type=jnp.float32) * scale
        out = assignment_xla(sim, z0, z1, m0, m1, threshold)
        return out._replace(scores=None)

    f32 = jnp.float32
    c0 = jax.nn.log_sigmoid(z0.astype(f32))
    c1 = jax.nn.log_sigmoid(z1.astype(f32))
    nn0, v0, lse_r, nn1, v1, lse_c = _fused_reductions(
        f0, f1, c0, c1, m0, m1, float(scale), tile_q, interpret)
    N = f0.shape[0]
    M = f1.shape[0]
    # Max assignment score per row/col: exp(objective + per-row/col terms)
    s0 = jnp.exp(v0 + c0 - lse_r)
    s1 = jnp.exp(v1 + c1 - lse_c)
    nn0c = jnp.clip(nn0, 0, M - 1)
    nn1c = jnp.clip(nn1, 0, N - 1)
    mutual0 = nn1c[nn0c] == jnp.arange(N)
    ok0 = mutual0 & m0 & (s0 > threshold) & (nn0 < M)
    mutual1 = nn0c[nn1c] == jnp.arange(M)
    ok1 = mutual1 & m1 & (s1 > threshold) & (nn1 < 2 ** 30)
    return MatchOutput(
        matches0=jnp.where(ok0, nn0c, -1).astype(jnp.int32),
        mscores0=jnp.where(ok0, s0, 0.0),
        matches1=jnp.where(ok1, nn1c, -1).astype(jnp.int32),
        mscores1=jnp.where(ok1, s1, 0.0),
        scores=None)
