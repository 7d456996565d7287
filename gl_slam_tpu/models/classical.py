"""Classical (training-free) corner detector + patch descriptors.

Covers BASELINE configs[1] ("KITTI monocular tracking, classical FAST/ORB
features, no BA") with a TPU-friendly formulation: FAST's ring test is
branchy and int8-scalar — hostile to the VPU — so the detector is a Harris
corner response (pure 3x3 convolutions + elementwise algebra, fuses into a
handful of VPU passes) with the same fused NMS/top-K selection as the learned
path, and descriptors are L2-normalized intensity patches sampled at a
blurred half-resolution pyramid level (rotation ignorance traded for batched
gathers, adequate for the near-upright KITTI motion the reference targets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import nms as nms_ops


def _box_blur(img: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Separable box blur, (H,W)."""
    w = jnp.ones((k,), img.dtype) / k
    img = jax.vmap(lambda r: jnp.convolve(r, w, mode='same'))(img)
    img = jax.vmap(lambda c: jnp.convolve(c, w, mode='same'),
                   in_axes=1, out_axes=1)(img)
    return img


def harris_response(img: jnp.ndarray, k: float = 0.04) -> jnp.ndarray:
    """Harris corner response of a (H,W) [0,1] grayscale image."""
    dx = (jnp.pad(img, ((0, 0), (0, 2)))[:, 2:]
          - jnp.pad(img, ((0, 0), (2, 0)))[:, :-2]) * 0.5
    dy = (jnp.pad(img, ((0, 2), (0, 0)))[2:, :]
          - jnp.pad(img, ((2, 0), (0, 0)))[:-2, :]) * 0.5
    Ixx = _box_blur(dx * dx)
    Iyy = _box_blur(dy * dy)
    Ixy = _box_blur(dx * dy)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    return det - k * tr * tr


def patch_descriptors(img: jnp.ndarray, kpts: jnp.ndarray,
                      patch: int = 8) -> jnp.ndarray:
    """Mean/variance-normalized blurred patches as descriptors. (N,P*P)."""
    from .subpix import gather_patches
    blurred = _box_blur(img, 3)
    p = gather_patches(blurred, kpts, patch)              # (N,P,P)
    d = p.reshape(p.shape[0], -1)
    d = d - jnp.mean(d, axis=1, keepdims=True)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-8)


class HarrisExtractor:
    """Fixed-K classical extractor with the same contract as the learned one
    (kpts, scores, desc, valid) — front-ends are interchangeable, like the
    reference's synthetic SuperPoint results (`slam_core.cpp:514-525`)."""

    def __init__(self, height: int, width: int, max_keypoints: int = 2048,
                 patch: int = 8, nms_radius: int = 4,
                 score_threshold: float = 1e-6):
        self.height = height
        self.width = width
        self.max_keypoints = max_keypoints
        self.patch = patch
        self.nms_radius = nms_radius
        self.score_threshold = score_threshold
        self._fn = jax.jit(self._extract)

    def _extract(self, images):
        def one(img):
            resp = harris_response(img)
            # Kill borders (patch sampling + gradient validity)
            b = self.patch
            row_ok = (jnp.arange(self.height) >= b) \
                & (jnp.arange(self.height) < self.height - b)
            col_ok = (jnp.arange(self.width) >= b) \
                & (jnp.arange(self.width) < self.width - b)
            resp = resp * row_ok[:, None] * col_ok[None, :]
            kpts, scores, valid = nms_ops.detect_keypoints(
                resp[None], self.max_keypoints, self.score_threshold,
                self.nms_radius, use_pallas=False)
            kpts, scores, valid = kpts[0], scores[0], valid[0]
            desc = patch_descriptors(img, kpts, self.patch)
            return kpts.astype(jnp.float32), scores, desc, valid
        return jax.vmap(one)(images)

    def __call__(self, images):
        """images: (B,H,W) in [0,1] -> (kpts, scores, desc, valid)."""
        return self._fn(images)
