"""Round-7 anchor for the Lloyd's k-means operator.

The registry query is oracle-checked against an exactly-unrolled
recursive-CTE twin — but oracle and engine share the unrolled
iteration definition, so a wrong fold (mis-seeded init, argmin tie
broken the wrong way, update rounded at the wrong stage) encoded in
both would pass.  This replays the published contract in plain
Python: smallest-id init, round-6 left-fold distances, (dist, cid)
argmin, round-6 per-dimension centroid means, empty clusters dropping
out — including a planted exact distance TIE in round 1.
"""

from __future__ import annotations

import math

import pytest


def _round_half(x: float, nd: int = 6) -> float:
    scale = 10**nd
    v = x * scale
    r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    return r / scale


def _replay_lloyd(vecs, k, iters):
    ids = sorted(vecs)
    cents = {cid: list(vecs[i]) for cid, i in enumerate(ids[:k])}
    assigned = {}
    for it in range(iters):
        assigned = {}
        for vid in ids:
            best = None
            for cid in sorted(cents):
                acc = 0.0
                for x, y in zip(vecs[vid], cents[cid]):
                    acc = acc + (x - y) * (x - y)
                d = _round_half(acc)
                if best is None or (d, cid) < best[:2]:
                    best = (d, cid)
            assigned[vid] = (best[1], best[0])
        if it + 1 == iters:
            break
        new = {}
        for cid in set(c for c, _ in assigned.values()):
            members = [vid for vid in ids if assigned[vid][0] == cid]
            new[cid] = [
                _round_half(
                    sum(vecs[m][i] for m in members) / len(members)
                )
                for i in range(len(next(iter(vecs.values()))))
            ]
        cents = new  # empty clusters drop out here
    return assigned


def test_kmeans_assign_matches_lloyd_replay(spark):
    from scats_transis_kinesis_spark.operators.ml import kmeans_assign

    # k=3 seeded from ids 0..2.  Vector 9 sits EXACTLY equidistant from
    # seeds 0 and 1 in round 1 (tie -> cid 0).  Seed 2 is an outlier
    # whose cluster collapses to itself, and vectors cluster so that at
    # least one centroid moves between rounds.
    vecs = {
        0: [0.0, 0.0, 0.0],
        1: [4.0, 0.0, 0.0],
        2: [50.0, 50.0, 50.0],
        3: [0.25, 0.25, 0.0],
        4: [0.5, 0.0, 0.25],
        5: [4.25, 0.25, 0.0],
        6: [3.75, 0.0, 0.25],
        7: [0.0, 0.5, 0.5],
        8: [4.0, 0.5, 0.25],
        9: [2.0, 0.0, 0.0],   # exact tie between seeds 0 and 1
    }
    df = spark.createDataFrame(
        [(vid, v) for vid, v in vecs.items()], "vec_id long, v array<double>"
    )
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_assign(df, k=3, iters=3, dim=3).collect()
    }

    want = _replay_lloyd(vecs, k=3, iters=3)
    assert got == want
    # Scenario sanity from the replay: the outlier keeps its own
    # cluster; the tie vector landed somewhere definite in round 1 but
    # by round 3 belongs to the cluster whose centroid drifted toward
    # it; both big clusters are non-trivial.
    assert want[2][0] == 2 and want[2][1] == 0.0
    sizes = {}
    for cid, _ in want.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    assert sizes[2] == 1 and sizes[0] >= 4 and sizes[1] >= 4

    # Round-1-only run pins the tie-break itself: with centroids still
    # at the seeds, vector 9's two distances are EQUAL and cid 0 wins.
    got1 = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_assign(df, k=3, iters=1, dim=3).collect()
    }
    want1 = _replay_lloyd(vecs, k=3, iters=1)
    assert got1 == want1
    assert want1[9][0] == 0 and want1[9][1] == 4.0


def test_kmeans_tol_stops_early_and_converges(spark):
    """The convergence knob (BACKLOG "k-means beyond fixed
    iterations"): with tol set, iters becomes a cap and the loop stops
    once max squared centroid movement <= tol.

    - tol=1e18 (everything "converged"): stops after round 0's update,
      so the assignment must equal the fixed iters=1 run — the
      observable proof the early-stop path actually fires.
    - tol=0.0 on a well-separated corpus: centroids freeze within the
      cap, and the result must equal the long fixed run.
    - tol=None: untouched registry contract (equals the fixed run of
      the same iters)."""
    from scats_transis_kinesis_spark.operators.ml import kmeans_assign

    # Two tight, far-apart clusters in 2-D; ids 0 and 1 (the seeds)
    # land one in each cluster so Lloyd's separates them in one round
    # and freezes.
    pts = [
        (0, [0.0, 0.0]), (2, [0.5, 0.0]), (4, [0.0, 0.5]), (6, [0.5, 0.5]),
        (1, [100.0, 100.0]), (3, [100.5, 100.0]), (5, [100.0, 100.5]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, v array<double>")

    def run(**kw):
        return {
            r["vec_id"]: r["cluster"]
            for r in kmeans_assign(df, k=2, dim=2, **kw).collect()
        }

    assert run(iters=10, tol=1e18) == run(iters=1)
    converged = run(iters=10, tol=0.0)
    assert converged == run(iters=10)
    assert {i for i, c in converged.items() if c == converged[0]} == {0, 2, 4, 6}
    assert {i for i, c in converged.items() if c == converged[1]} == {1, 3, 5}
