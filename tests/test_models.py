"""Tests for the learned + classical front-end models (SURVEY.md §7 step 3):
shape/mask contracts for the SuperPoint-style extractor and LightGlue-style
matcher, NMS kernel equivalence (Pallas interpret vs XLA), sub-pixel
refinement accuracy, and the classical Harris front-end driving real
two-view geometry on rendered images (BASELINE configs[1] slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gl_slam_tpu.geometry import essential, se3
from gl_slam_tpu.io import synthetic
from gl_slam_tpu.models import classical, lightglue, subpix, superpoint
from gl_slam_tpu.ops import match as match_ops
from gl_slam_tpu.ops import nms as nms_ops

H, W = 96, 128


def test_nms_pallas_matches_xla():
    rng = np.random.default_rng(0)
    heat = jnp.asarray(rng.random((2, 64, 128)).astype(np.float32))
    a = nms_ops._nms_xla(heat, 4)
    b = nms_ops._nms_pallas(heat, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_nms_suppresses_neighbors():
    heat = np.zeros((1, 32, 32), np.float32)
    heat[0, 10, 10] = 1.0
    heat[0, 10, 12] = 0.8   # within radius 4 of the peak -> suppressed
    heat[0, 25, 25] = 0.9
    kpts, scores, valid = nms_ops.detect_keypoints(
        jnp.asarray(heat), 8, 0.1, 4, use_pallas=False)
    got = {tuple(k) for k, v in zip(np.asarray(kpts[0]), np.asarray(valid[0]))
           if v}
    assert got == {(10, 10), (25, 25)}


def test_superpoint_contract():
    ex = superpoint.SuperPointExtractor(H, W, max_keypoints=64,
                                        score_threshold=0.0,
                                        descriptor_dim=64, use_pallas=False)
    imgs = jnp.asarray(np.random.default_rng(1).random((2, H, W)),
                       jnp.float32)
    kpts, scores, desc, valid = ex(imgs)
    assert kpts.shape == (2, 64, 2) and desc.shape == (2, 64, 64)
    k = np.asarray(kpts)
    assert (k[..., 0] >= 0).all() and (k[..., 0] < W).all()
    assert (k[..., 1] >= 0).all() and (k[..., 1] < H).all()
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()     # top-k returns sorted
    d = np.asarray(desc)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)


def test_lightglue_contract():
    N = 32
    m = lightglue.LightGlueMatcher(H, W, input_dim=32, dim=64, heads=2,
                                   layers=2, threshold=0.0)
    rng = np.random.default_rng(2)
    d0 = rng.normal(size=(1, N, 32)).astype(np.float32)
    k0 = rng.uniform(0, [W, H], size=(1, N, 2)).astype(np.float32)
    v0 = np.ones((1, N), bool)
    v0[0, 20:] = False                            # invalid tail
    out = m(jnp.asarray(k0), jnp.asarray(d0), jnp.asarray(v0),
            jnp.asarray(k0), jnp.asarray(d0), jnp.asarray(v0))
    m0 = np.asarray(out.matches0[0])
    m1 = np.asarray(out.matches1[0])
    # Invalid slots never matched, in either direction
    assert (m0[20:] == -1).all()
    assert not np.isin(np.arange(20, N), m1[m1 >= 0]).any()
    # Mutual consistency
    for i, j in enumerate(m0):
        if j >= 0:
            assert m1[j] == i
    # Same descriptors both sides -> the diagonal should dominate
    good = [(i, j) for i, j in enumerate(m0) if j >= 0]
    assert len(good) > 10
    assert all(i == j for i, j in good)


def test_subpix_centroid():
    """Centroid refinement must recover a planted sub-pixel peak offset."""
    H2, W2 = 32, 32
    yy, xx = np.mgrid[0:H2, 0:W2].astype(np.float32)
    true = np.array([[15.3, 14.6], [20.8, 9.4]], np.float32)  # (x,y)
    heat = np.zeros((H2, W2), np.float32)
    for tx, ty in true:
        heat += np.exp(-((xx - tx) ** 2 + (yy - ty) ** 2) / 1.0)
    kint = np.round(true).astype(np.float32)
    ref = subpix.centroid_refine(jnp.asarray(heat), jnp.asarray(kint), 5)
    err = np.abs(np.asarray(ref) - true)
    assert err.max() < 0.12, err


def test_subpix_head_bounded():
    r = subpix.SubpixRefiner(patch=5, desc_dim=16)
    heat = jnp.asarray(np.random.default_rng(3).random((32, 32)),
                       jnp.float32)
    kpts = jnp.asarray([[10.0, 10.0], [20.0, 5.0]])
    desc = jnp.asarray(np.random.default_rng(4).random((2, 16)), jnp.float32)
    out = np.asarray(r(heat, kpts, desc))
    assert np.abs(out - np.asarray(kpts)).max() <= r.head.offset_range


@pytest.mark.slow
def test_classical_two_view():
    """BASELINE configs[0]/[1] slice with REAL images: render two synthetic
    frames, Harris-extract, patch-match, essential -> pose close to GT."""
    scene = synthetic.make_scene(num_landmarks=900, num_frames=4,
                                 height=240, width=320, seed=21)
    img0 = synthetic.render_frame(scene, 0, max_keypoints=400)
    img1 = synthetic.render_frame(scene, 1, max_keypoints=400)
    ex = classical.HarrisExtractor(240, 320, max_keypoints=512)
    kpts, scores, desc, valid = ex(jnp.asarray(np.stack([img0, img1])))

    m = match_ops.mutual_nn_match(desc[0], valid[0], desc[1], valid[1],
                                  min_score=0.0)
    pair = m.matches0 >= 0
    uv0, uv1, pair = match_ops.gather_matched(kpts[0], kpts[1], m.matches0,
                                              pair)
    assert int(pair.sum()) > 60, int(pair.sum())
    res = essential.estimate_essential(
        jnp.asarray(scene.K), uv0, uv1, pair, jax.random.PRNGKey(0),
        threshold_px=2.0, num_hypotheses=256)
    assert bool(res.ok)
    R_rel = scene.poses_R[1] @ scene.poses_R[0].T
    t_rel = scene.poses_t[1] - R_rel @ scene.poses_t[0]
    rot_err = float(se3.rotation_angle_deg(
        jnp.asarray(R_rel, jnp.float32).T @ res.R))
    t_err = float(se3.translation_direction_angle_deg(
        res.t, jnp.asarray(t_rel, jnp.float32)))
    assert rot_err < 1.0, rot_err
    # Translation DIRECTION from a ~1 m baseline is the ill-conditioned part
    # of two-view geometry (the reference's own GT printouts show several
    # degrees); rotation above is the tight check.
    assert t_err < 12.0, t_err


def test_gather_patches_packed_matches_naive():
    """The row-gather (x-shift packed) patch gather and the dense shift-add
    centroid must reproduce the naive element-gather implementations exactly
    (edge replication == clamped indexing), including at image borders."""
    import jax.numpy as jnp
    from gl_slam_tpu.models import subpix

    rng = np.random.default_rng(3)
    H, W, N, P = 96, 200, 64, 7            # > the tiny-shape fallback cutoff
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    kp = np.stack([rng.uniform(0, W - 1, N), rng.uniform(0, H - 1, N)], 1)
    kp[:4] = [[0, 0], [W - 1, H - 1], [1.7, 0.2], [W - 1.2, 3.9]]  # borders
    kp = jnp.asarray(kp.astype(np.float32))
    ref = subpix.gather_patches_naive(img, kp, P)
    out = subpix.gather_patches(img, kp, P)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    h = jnp.abs(img)
    a = subpix.centroid_refine_naive(h, kp, P)
    b = subpix.centroid_refine(h, kp, P)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
