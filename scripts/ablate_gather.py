"""Ablation: keypoint patch gather / sub-pixel refine / assignment variants.

BASELINE.md round-3 decomposition put "sub-pixel refine + descriptor
sampling" at ~0.92 ms/frame (gather-bound) — (N,P,P) element gathers from
the (H,W) image lower to scalar-granularity TPU gathers. This measures the
alternatives inside a scan (in-program costs, not standalone dispatch):

  1. gather_patches as-is (2D advanced indexing)
  2. flat 1-D gather (precomputed flat indices)
  3. centroid refine via DENSE separable box filters + one (N,) row gather
     (dx = conv(w*x)/conv(w) evaluated densely, gathered at keypoints)
  4. descriptor sampling (row gathers from the (Hc*Wc, D) grid)
  5. XLA dual-softmax assignment vs the fused Pallas assignment
     (ops/assignment.py) at matcher shapes

Run on the real TPU: python scripts/ablate_gather.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (PYTHONPATH breaks the axon TPU plugin)

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, N, P, D = 376, 1241, 2048, 7, 256
REPS = 16      # scan length per measured call


def bench(name, fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(out)[0])[:1]))
    dt = (time.perf_counter() - t0) / n / REPS
    print(f"{name:>44}: {dt*1e3:8.3f} ms/iter", flush=True)
    return dt


def scanned(fn):
    """Repeat fn REPS times with a perturbed input to defeat CSE."""
    def run(img, kpts):
        def body(c, _):
            out = fn(img + c * 1e-6, kpts)
            s = jnp.sum(out) if not isinstance(out, tuple) \
                else jnp.sum(out[0])
            return s * 1e-9, None
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0]
    return jax.jit(run)


def main():
    from gl_slam_tpu.models.subpix import (centroid_refine,
                                           centroid_refine_naive,
                                           gather_patches,
                                           gather_patches_naive)

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32)
    kpts = jnp.stack([
        jax.random.uniform(key, (N,), jnp.float32, 4, W - 5),
        jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float32, 4,
                           H - 5)], axis=1)

    bench("gather_patches 2D-index (naive)",
          scanned(lambda im, kp: gather_patches_naive(im, kp, P)), img, kpts)
    bench("gather_patches x-packed row gather (NEW)",
          scanned(lambda im, kp: gather_patches(im, kp, P)), img, kpts)
    bench("centroid_refine shift-add dense (NEW)",
          scanned(lambda im, kp: centroid_refine(im, kp, P)), img, kpts)

    def flat_gather(im, kp):
        r = P // 2
        off = jnp.arange(P) - r
        xs = jnp.clip(kp[:, 0:1].astype(jnp.int32) + off[None, :], 0, W - 1)
        ys = jnp.clip(kp[:, 1:2].astype(jnp.int32) + off[None, :], 0, H - 1)
        flat = (ys[:, :, None] * W + xs[:, None, :]).reshape(-1)
        return jnp.take(im.reshape(-1), flat, axis=0).reshape(N, P, P)
    bench("gather_patches flat 1-D take", scanned(flat_gather), img, kpts)

    bench("centroid_refine gather (naive)",
          scanned(lambda im, kp: centroid_refine_naive(im, kp, P)),
          img, kpts)

    def centroid_dense(im, kp):
        # separable box sums of w, w*x, w*y; evaluate densely on the MXU/VPU
        # then ONE row gather of the (H*W, 2) offset map at the keypoints
        r = P // 2
        w = jnp.maximum(im, 0.0)[None, :, :, None]
        ones = jnp.ones((P, 1, 1, 1), jnp.float32)
        offk = (jnp.arange(P, dtype=jnp.float32) - r).reshape(P, 1, 1, 1)
        dn = jax.lax.conv_general_dilated(
            w, ones, (1, 1), [(r, r), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        dn = jax.lax.conv_general_dilated(
            dn, ones.reshape(1, P, 1, 1), (1, 1), [(0, 0), (r, r)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        sy = jax.lax.conv_general_dilated(
            w, offk, (1, 1), [(r, r), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        sy = jax.lax.conv_general_dilated(
            sy, ones.reshape(1, P, 1, 1), (1, 1), [(0, 0), (r, r)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        sx = jax.lax.conv_general_dilated(
            w, ones, (1, 1), [(r, r), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        sx = jax.lax.conv_general_dilated(
            sx, offk.reshape(1, P, 1, 1), (1, 1), [(0, 0), (r, r)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        dxy = jnp.stack([sx[0, :, :, 0], sy[0, :, :, 0]], -1) \
            / jnp.maximum(dn[0, :, :, 0], 1e-9)[..., None]
        xi = jnp.clip(kp[:, 0].astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(kp[:, 1].astype(jnp.int32), 0, H - 1)
        return kp + dxy.reshape(-1, 2)[yi * W + xi]
    bench("centroid_refine dense conv + row gather",
          scanned(centroid_dense), img, kpts)

    # numeric agreement away from borders
    a = centroid_refine(img, kpts, P)
    b = centroid_dense(img, kpts)
    inner = ((kpts[:, 0] > P) & (kpts[:, 0] < W - P)
             & (kpts[:, 1] > P) & (kpts[:, 1] < H - P))
    err = jnp.max(jnp.abs(a - b) * inner[:, None])
    print(f"   centroid dense-vs-gather max abs err (interior): {err:.2e}")

    from gl_slam_tpu.models.superpoint import sample_descriptors
    grid = jax.random.normal(key, (H // 8, W // 8 + 1, D), jnp.float32)
    bench("sample_descriptors (row gathers)",
          scanned(lambda g, kp: sample_descriptors(grid, kp)), grid, kpts)

    # --- assignment: XLA vs fused Pallas at matcher shapes ---------------
    from gl_slam_tpu.models.lightglue import assignment
    from gl_slam_tpu.ops.assignment import fused_assignment
    f0 = jax.random.normal(key, (N, D), jnp.bfloat16) * 0.5
    f1 = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.bfloat16) * 0.5
    z = jnp.zeros((N,), jnp.float32)
    m = jnp.ones((N,), bool)
    scale = 1.0 / np.sqrt(D)

    def xla_assign(ff0, ff1):
        sim = jnp.einsum('nd,md->nm', ff0, ff1,
                         preferred_element_type=jnp.float32) * scale
        return assignment(sim, z, z, m, m, 0.0).matches0

    def scanned_pair(fn):
        def run(a, b):
            def body(c, _):
                out = fn(a + c.astype(a.dtype) * 1e-6, b)
                return jnp.sum(out).astype(jnp.float32) * 1e-9, None
            return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0]
        return jax.jit(run)

    bench("assignment XLA 2048x2048", scanned_pair(xla_assign), f0, f1)
    bench("assignment fused pallas 2048x2048", scanned_pair(
        lambda a, b: fused_assignment(a, b, z, z, m, m, scale).matches0),
        f0, f1)
    na = np.asarray(xla_assign(f0, f1))
    nb = np.asarray(fused_assignment(f0, f1, z, z, m, m, scale).matches0)
    print(f"   assignment agreement: {(na == nb).mean()*100:.2f}% rows")


if __name__ == "__main__":
    main()
