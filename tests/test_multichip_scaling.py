"""Multi-chip scaling evidence on the virtual mesh (VERDICT r2 item 8).

The scale-out claim is: the stream axis is the multi-CHIP axis — S streams
sharded over an S-chip data mesh run with NO inter-chip communication, so
aggregate throughput is S x one chip's single-stream throughput (BASELINE
configs[4], parallel/mesh.py).

Wall-clock scaling cannot be demonstrated on this host (the 8 'devices' of
the test mesh are virtual XLA host devices multiplexed onto ONE physical
core — adding virtual devices adds no compute), so these tests assert the
property STRUCTURALLY on the compiled program, which is exactly what
transfers to real chips:

  1. the compiled multistream chunk contains ZERO cross-device collectives
     (no all-reduce / all-gather / collective-permute / all-to-all) — each
     chip's work is independent, so chips never wait on each other;
  2. every stream-batched input/output is sharded S/n per device — each
     chip holds and computes exactly one chip's share, not a replica;
  3. executing at S=8 over 8 devices produces per-stream results identical
     to S=1 (already covered end-to-end by __graft_entry__.dryrun_multichip
     and test_runtime's multistream tests; re-checked here on one chunk).
"""

import numpy as np
import pytest


COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter", "collective-broadcast")


@pytest.fixture(scope="module")
def compiled_multistream():
    import jax
    import jax.numpy as jnp
    # Compile from a clean trace/executable cache: the shard_map AOT
    # compile has been observed to segfault XLA:CPU when it reuses jit
    # state left behind by earlier suite files (standalone it is stable).
    jax.clear_caches()

    from gl_slam_tpu.config import tiny_test_config
    from gl_slam_tpu.io import synthetic
    from gl_slam_tpu.models.lightglue import LightGlueNet
    from gl_slam_tpu.models.superpoint import SuperPointNet
    from gl_slam_tpu.parallel import mesh as mesh_lib
    from gl_slam_tpu.slam import frontend, fused

    cfg = tiny_test_config()
    H, W = cfg.frontend.image_height, cfg.frontend.image_width
    N, D = cfg.frontend.max_keypoints, cfg.frontend.descriptor_dim
    S, T = 8, 2
    mesh = mesh_lib.make_mesh(S)
    key = jax.random.PRNGKey(0)
    sp = SuperPointNet(descriptor_dim=D, channels=(8, 8, 16, 16, 16, 16,
                                                   32, 32))
    lg = LightGlueNet(dim=32, heads=2, layers=2, input_dim=D)
    pad_h, pad_w = (-H) % 8, (-W) % 8
    sp_params = sp.init(key, jnp.zeros((1, H + pad_h, W + pad_w, 1)))
    d8 = jnp.zeros((8, D)); k8 = jnp.zeros((8, 2)); m8 = jnp.ones((8,), bool)
    lg_params = lg.init(key, d8, d8, k8, k8, m8, m8)
    params = fused.FusedParams(sp=sp_params, lg=lg_params)

    scene = synthetic.make_scene(num_landmarks=500, num_frames=T + 2,
                                 height=H, width=W, desc_dim=D, seed=5)
    K = jnp.asarray(scene.K, jnp.float32)
    obs = synthetic.observe_frame(scene, 0, max_keypoints=N)
    st1 = frontend.init_track_state(cfg, key)._replace(
        prev_kpts=jnp.asarray(obs.keypoints),
        prev_desc=jnp.asarray(obs.descriptors),
        prev_valid=jnp.asarray(obs.valid))
    images = jnp.asarray(np.stack([
        synthetic.render_frame(scene, 2 + t, max_keypoints=N)
        for t in range(T)]), jnp.float32)

    rep = lambda a: jnp.broadcast_to(a, (S,) + a.shape)
    states = jax.tree_util.tree_map(lambda a: rep(a).copy(), st1)
    states = mesh_lib.shard_streams(states, mesh)
    images_b = mesh_lib.shard_streams(rep(images).copy(), mesh)

    fnS = fused.build_multistream_chunk_fn(cfg, sp, lg, K, T, S, mesh=mesh)
    lowered = fnS.lower(params, states, images_b, jnp.asarray(1, jnp.int32))
    compiled = lowered.compile()
    return dict(compiled=compiled, fnS=fnS, params=params, states=states,
                images_b=images_b, mesh=mesh, S=S)


def test_no_collectives_in_compiled_program(compiled_multistream):
    """The sharded multistream program must be communication-free: any
    collective op would serialize chips on ICI and break the S x scaling
    claim. (The reference has no multi-device concept at all — SURVEY §2.3;
    this is the TPU-native scale-out design being validated.)"""
    txt = compiled_multistream["compiled"].as_text().lower()
    found = [c for c in COLLECTIVES if c in txt]
    lines = [l[:200] for l in txt.splitlines()
             if any(c in l for c in found)][:6]
    assert not found, \
        f"collectives in multistream program: {found}\n" + "\n".join(lines)


def test_inputs_sharded_not_replicated(compiled_multistream):
    """Every stream-batched input must be partitioned S/n per device (chips
    hold only their shard); model params are the only replicated leaves."""
    S = compiled_multistream["S"]
    states = compiled_multistream["states"]
    import jax
    for leaf in jax.tree_util.tree_leaves(states):
        if leaf.ndim == 0 or leaf.shape[0] != S:
            continue
        shards = leaf.sharding.shard_shape(leaf.shape)
        assert shards[0] == S // 8, (leaf.shape, shards)


def test_streams_match_single_stream(compiled_multistream):
    """Executing the sharded program: identical inputs per stream ->
    identical per-stream outputs (and they advance the map)."""
    import jax.numpy as jnp
    fnS = compiled_multistream["fnS"]
    stS, outs = fnS(compiled_multistream["params"],
                    compiled_multistream["states"],
                    compiled_multistream["images_b"],
                    jnp.asarray(1, jnp.int32))
    t = np.asarray(outs.t)
    assert np.isfinite(t).all()
    for s in range(1, t.shape[0]):
        np.testing.assert_allclose(t[s], t[0], rtol=1e-5, atol=1e-5)
    n_kf = np.asarray(stS.map.num_kf)
    assert (n_kf == n_kf[0]).all()


def test_ms_econ_table_bounds():
    """Committed single-chip multi-stream economics (VERDICT r4 item 6):
    time-multiplexed S-stream aggregate must not collapse below the
    single-stream rate (the round-2 finding that vmapped multistream ran
    1.7x SLOWER is why the driver time-multiplexes instead). Measured at
    HEAD: single 75.8 fps, aggregates 74.7-77.2 for S=2..16 — flat, i.e.
    compute-bound: the stream axis is the multi-CHIP scaling lever."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "MS_ECON.json")
    if not os.path.exists(path):
        import pytest
        pytest.skip("no committed MS_ECON.json (run bench.py --ms-econ)")
    rep = json.load(open(path))
    single = rep["single_stream_fps"]
    agg = rep["aggregate_fps_by_streams"]
    assert set(agg) == {"2", "4", "8", "16"}, rep
    for s, v in agg.items():
        assert v >= 0.85 * single, (s, v, single)
