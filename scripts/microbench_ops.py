"""Micro-bench individual ops implicated in the per-frame scan cost.

Establishes the standalone-dispatch floor first (a trivial program), then
times candidate hot ops; subtract the floor to estimate in-chunk cost."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def bench(name, fn, *args, n=30):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>44}: {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    P = 65536
    N = 2048
    Kmax = 512

    floor = bench("dispatch floor (1-op)", jax.jit(lambda x: x + 1.0),
                  jnp.ones((8,), jnp.float32))

    prio = jax.random.randint(key, (P,), -1, 512).astype(jnp.int32)
    bench("top_k 65536 -> 2048", jax.jit(
        lambda p: jax.lax.top_k(p, 2048)), prio)
    bench("top_k 65536 -> 1024", jax.jit(
        lambda p: jax.lax.top_k(p, 1024)), prio)
    bench("top_k 65536 -> 256", jax.jit(
        lambda p: jax.lax.top_k(p, 256)), prio)

    mask = prio > 300

    def cumsum_select(m, M):
        # newest-first: reverse cumulative count over point index
        pos = jnp.cumsum(m[::-1].astype(jnp.int32))[::-1] - 1
        pos = jnp.where(m, pos, M)
        ids = jnp.full((M,), -1, jnp.int32).at[
            jnp.clip(pos, 0, M)].set(jnp.arange(P, dtype=jnp.int32),
                                     mode='drop')
        return ids

    bench("cumsum-select 65536 -> 2048", jax.jit(
        lambda m: cumsum_select(m, 2048)), mask)
    bench("cumsum-select 65536 -> 1024", jax.jit(
        lambda m: cumsum_select(m, 1024)), mask)

    # scatter .at[].add histogram (seed->kf histogram)
    ids = jax.random.randint(key, (N * 16,), 0, Kmax)
    bench("scatter-add hist 32k -> 512", jax.jit(
        lambda i: jnp.zeros((Kmax,), jnp.int32).at[i].add(1, mode='drop')),
        ids)

    # big boolean scatter (member set over P)
    flat = jax.random.randint(key, (60 * N,), 0, P)
    bench("scatter-set bool 120k -> 65536", jax.jit(
        lambda f: jnp.zeros((P,), bool).at[f].set(True, mode='drop')), flat)

    # gathers at candidate sets
    desc = jax.random.normal(key, (P, 256), jnp.bfloat16)
    cand = jax.random.randint(key, (2048,), 0, P)
    bench("gather 2048x256 desc", jax.jit(lambda d, c: d[c]), desc, cand)

    # sort-based alternative: argsort full
    bench("argsort 65536", jax.jit(lambda p: jnp.argsort(p)), prio)

    # insert_keyframe component guess: big scatters into map tables
    pts = jax.random.normal(key, (N, 3))
    bench("scatter 2048x3 into 65536x3", jax.jit(
        lambda t, i, v: t.at[i].set(v, mode='drop')),
        jnp.zeros((P, 3)), cand, pts)
    descf = jax.random.normal(key, (N, 256), jnp.bfloat16)
    bench("scatter 2048x256 into 65536x256", jax.jit(
        lambda t, i, v: t.at[i].set(v, mode='drop')),
        jnp.zeros((P, 256), jnp.bfloat16), cand, descf)

    # covis union membership via sorted compare alternative is omitted;
    # measure one full covis retrieval for reference
    from gl_slam_tpu.config import FrontendConfig, MapConfig, SLAMConfig
    from gl_slam_tpu.slam import frontend, reobserve
    cfg = SLAMConfig(
        frontend=FrontendConfig(image_height=376, image_width=1241,
                                max_keypoints=N, descriptor_dim=256),
        map=MapConfig(max_keyframes=512, max_points=65536),
    )


if __name__ == "__main__":
    main()
