"""In-scan cost of estimate_essential sub-stages at flagship shapes."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T = 8


def bench(name, fn, *args, n=15):
    out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:>44}: {dt*1e3:8.2f} ms/scan8  {dt*1e3/T:6.3f} ms/iter",
          flush=True)


def main():
    from gl_slam_tpu.geometry import essential, projection
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.ops import smallmat

    N = 2048
    H_hyp = 512
    key = jax.random.PRNGKey(0)
    scene = synthetic.make_scene(num_landmarks=3000, num_frames=3,
                                 height=376, width=1241, desc_dim=64, seed=0)
    o0 = synthetic.observe_frame(scene, 0, max_keypoints=N)
    o1 = synthetic.observe_frame(scene, 1, max_keypoints=N)
    K = jnp.asarray(scene.K, jnp.float32)
    uv0 = jnp.asarray(o0.keypoints); uv1 = jnp.asarray(o1.keypoints)
    mask = jnp.asarray(o0.valid)

    def scan8(body):
        def fn(key):
            def step(c, _):
                out = body(c)
                leaf = jax.tree_util.tree_leaves(out)[0]
                # data-couple the carry so no iteration is dead code
                bump = (leaf.astype(jnp.float32).ravel()[0] * 0).astype(
                    jnp.uint32)
                return jax.random.fold_in(c, 1) + bump, None
            return jax.lax.scan(step, key, None, length=T)[0]
        return jax.jit(fn)

    x0 = projection.normalize_points(K, uv0)
    x1 = projection.normalize_points(K, uv1)
    maskf = mask.astype(jnp.float32)
    f = 0.5 * (K[0, 0] + K[1, 1])
    thr2 = (0.5 / f) ** 2

    bench("full estimate_essential 512/10", scan8(
        lambda k: essential.estimate_essential(K, uv0, uv1, mask, k).R),
        key)
    bench("full estimate_essential 256/6", scan8(
        lambda k: essential.estimate_essential(
            K, uv0, uv1, mask, k, num_hypotheses=256, refine_iters=6).R),
        key)

    def sample_only(k):
        g = jax.random.gumbel(k, (H_hyp, N), jnp.float32)
        g = jnp.where(mask[None, :], g, -jnp.inf)
        _, idx = jax.lax.top_k(g, 8)
        return idx
    bench("gumbel top-8 sampling (512)", scan8(sample_only), key)

    def fit_only(k):
        idx = sample_only(k)
        sx0 = x0[idx]; sx1 = x1[idx]
        ones8 = jnp.ones((H_hyp, 8), jnp.float32)
        return jax.vmap(essential._fit_eight_point)(sx0, sx1, ones8)
    bench("+ 512x eight-point fit", scan8(fit_only), key)

    def score_only(k):
        Es = fit_only(k)
        errs = jax.vmap(essential._sampson_error_sq,
                        in_axes=(0, None, None))(Es, x0, x1)
        errs = jnp.where(mask[None, :], errs, thr2)
        return Es[jnp.argmin(jnp.sum(jnp.minimum(errs, thr2), axis=1))]
    bench("+ score + argmin", scan8(score_only), key)

    def with_irls(k, iters):
        E = score_only(k)
        def refit(E, _):
            e2 = essential._sampson_error_sq(E, x0, x1)
            w = maskf * (e2 < thr2).astype(jnp.float32)
            w = jnp.where(jnp.sum(w) >= 8, w, maskf)
            return essential._fit_eight_point(x0, x1, w), None
        E, _ = jax.lax.scan(refit, E, None, length=iters)
        return E
    bench("+ IRLS x10", scan8(lambda k: with_irls(k, 10)), key)
    bench("+ IRLS x4", scan8(lambda k: with_irls(k, 4)), key)

    def recovery(k):
        E = with_irls(k, 10)
        e2 = essential._sampson_error_sq(E, x0, x1)
        inl = mask & (e2 < thr2)
        Rs, ts = essential.decompose_essential(E)
        votes = essential._cheirality_votes(K, Rs, ts, uv0, uv1,
                                            inl.astype(jnp.float32))
        return Rs[jnp.argmax(votes)]
    bench("+ recoverPose vote (=full)", scan8(recovery), key)


if __name__ == "__main__":
    main()
