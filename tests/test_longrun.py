"""Reference-length sequence capability (VERDICT r1 item 3).

The reference tracks KITTI 00 frames 0-4540 with an unboundedly growing
in-RAM map (`/root/reference/include/core/slam_types.h:8-127`,
`src/core/slam_types.cpp:12`); the fixed-capacity device tables here must
instead recycle point slots (slam/state.py recycle_free_slots). The soak
itself is too heavy for the CPU test backend, so it runs on the real TPU via
`scripts/longrun_learned.py --frames 1000 --out LONGRUN.json` and commits
its scoreboard; these tests assert the committed bounds so a regression that
invalidates the artifact turns the suite red.
"""

import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
PATH = os.path.join(ROOT, "LONGRUN.json")


@pytest.mark.skipif(not os.path.exists(PATH),
                    reason="no committed long-run soak "
                    "(run scripts/longrun_learned.py --frames 1000 on TPU)")
def test_longrun_soak_bounds():
    rep = json.load(open(PATH))
    # Reference-length evidence scale: a 1000-frame scene in one run. The
    # chunked driver tracks the largest chunk multiple after the 2-frame
    # bootstrap (2 + 124*8 = 994 of the 1000 rendered frames), so the bound
    # is on that arithmetic, not a round number.
    assert rep["frames"] >= 990, rep
    # No capacity starvation: with every-frame keyframing, (nearly) every
    # frame must survive as a keyframe for the whole run — a starved map
    # (no free point slots -> triangulation silently dropped -> tracking
    # rejects) collapses this ratio first.
    assert rep["keyframes"] >= 0.95 * rep["frames"], rep
    # Drift bound: ATE as % of trajectory length. The 32-frame tiny-scale
    # e2e holds ~1-3%; monocular drift compounds with length, so the soak
    # bound is looser but still a real lost-tracking detector (a single
    # wrong-basin pose excursion costs tens of metres at 1 m/frame).
    assert rep["drift_pct"] <= 8.0, rep
    # The point table must have TURNED OVER, not been sized to fit the whole
    # run: total_new_points is the number of map points the run actually
    # created (the turnover counter the advisor asked for — ADVICE r2,
    # medium); creating >1.5x the table capacity is only survivable through
    # slot recycling (state.recycle_free_slots), and the capacity bound
    # makes the headroom explicit rather than relying on the script's
    # auto-sizing.
    assert rep["max_points_capacity"] <= 0.5 * rep["total_new_points"], rep
    assert rep["total_new_points"] > 1.5 * rep["max_points_capacity"], rep
