"""Benchmark: tracked frames/sec/chip on the flagship learned pipeline.

Measures the steady-state per-frame cost of the full tracked-frame program
(SuperPoint-style extraction at KITTI 376x1241, fused NMS+top-K, sub-pixel
refinement, LightGlue-style attention matching at N=2048, essential RANSAC,
map re-observation + covisibility retrieval, pose-only LM, triangulation,
keyframe/map insertion) on one TPU chip, and prints ONE JSON line.

vs_baseline is measured against the driver-set north star of 500 tracked
frames/sec/chip (BASELINE.json; the reference publishes no numbers of its
own — BASELINE.md documents this).
"""

import json
import sys
import time


def main():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    jfn = jax.jit(fn)

    # Warm-up / compile
    state = args[2]
    out = jfn(args[0], args[1], state, args[3], args[4])
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])

    # Steady-state: feed frames back-to-back, threading the state
    n_warm, n_meas = 3, 30
    st = state
    for _ in range(n_warm):
        st, _ = jfn(args[0], args[1], st, args[3], args[4])
    jax.block_until_ready(st.map.num_kf)

    t0 = time.time()
    for _ in range(n_meas):
        st, _ = jfn(args[0], args[1], st, args[3], args[4])
    jax.block_until_ready(st.map.num_kf)
    elapsed = time.time() - t0

    fps = n_meas / elapsed
    print(json.dumps({
        "metric": "tracked frames/sec/chip (full learned pipeline, KITTI 376x1241, N=2048)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 500.0, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
