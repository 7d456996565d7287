"""Numerics tests: Pallas fused attention kernel vs the XLA reference."""

import jax.numpy as jnp
import numpy as np

from gl_slam_tpu.ops import attention as attn_ops


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(scale=scale, size=shape)
        .astype(np.float32))


def test_pallas_attention_matches_xla():
    H, N, dh = 2, 128, 64
    q = _rand((H, N, dh), 0, 0.3)
    k = _rand((H, N, dh), 1, 0.3)
    v = _rand((H, N, dh), 2)
    mask = jnp.asarray(np.random.default_rng(3).random(N) > 0.3)
    scale = 1.0 / np.sqrt(dh)
    ref = attn_ops.attention_xla(q, k, v, mask, scale)
    out = attn_ops.attention_pallas(q, k, v, mask, scale, tile_q=32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pallas_attention_cross_shapes():
    """Cross-attention: Nq != Nk."""
    H, Nq, Nk, dh = 2, 64, 96, 32
    q = _rand((H, Nq, dh), 4, 0.3)
    k = _rand((H, Nk, dh), 5, 0.3)
    v = _rand((H, Nk, dh), 6)
    mask = jnp.asarray(np.random.default_rng(7).random(Nk) > 0.5)
    scale = 1.0 / np.sqrt(dh)
    ref = attn_ops.attention_xla(q, k, v, mask, scale)
    out = attn_ops.attention_pallas(q, k, v, mask, scale, tile_q=32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pallas_attention_all_masked():
    """Fully-masked keys must not produce NaNs (uniform-ish output)."""
    H, N, dh = 1, 32, 16
    q = _rand((H, N, dh), 8)
    k = _rand((H, N, dh), 9)
    v = _rand((H, N, dh), 10)
    mask = jnp.zeros((N,), bool)
    out = attn_ops.attention_pallas(q, k, v, mask, 0.25, tile_q=32,
                                    interpret=True)
    assert np.isfinite(np.asarray(out)).all()
