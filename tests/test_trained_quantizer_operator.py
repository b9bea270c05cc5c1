"""Operator-level pins for the round-10 external-quantizer surface.

The registry queries are oracle-gated and anchor-replayed
(test_round10_anchors.py); these pin the OPERATOR contracts the
queries compose, so a refactor cannot silently change them:

- ``cosine_topk_bucketed(centroids=...)`` with the seed sample passed
  EXPLICITLY must equal the default seed path row-for-row — the new
  parameter changes where centroids come from, never what assignment
  or probing mean.
- ``assign_to_centroids`` is a total partition of the corpus: every
  vector lands in exactly one cluster, and the assigned centroid is
  the true rounded-cosine argmax with the centroid-id tiebreak.
- ``kmeans_centroids`` drops empty clusters and never exports more
  than min(k, |corpus|) centroids; the export is consistent with the
  final ``kmeans_assign`` labeling on the same inputs (same cluster
  ids, one centroid per surviving cluster).
"""

from __future__ import annotations

import math

import numpy as np


def _round_half(x: float, nd: int = 6) -> float:
    scale = 10**nd
    v = x * scale
    r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    return r / scale


def _vectors(n=20, dim=6):
    """Deterministic f32-exact spread (the round-9 style)."""
    vecs = []
    for i in range(n):
        v = [0.0625 * ((i * 7 + j * 13) % 11 - 5) for j in range(dim)]
        v[i % dim] += 2.0
        vecs.append(v)
    return vecs


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(np.float32(x)) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_explicit_seed_centroids_equal_default_path(spark):
    from scats_transis_kinesis_spark.operators import similarity as S

    emb = _emb_df(spark, _vectors())
    qids = [3, 7, 11]
    default = S.cosine_topk_bucketed(
        emb, query_ids=qids, k=4, num_centroids=8, nprobe=3
    )
    seed_cents, _ = S.assign_centroids(emb, 8)
    explicit = S.cosine_topk_bucketed(
        emb, query_ids=qids, k=4, nprobe=3, centroids=seed_cents
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    got_d, got_e = rows(default), rows(explicit)
    assert got_d == got_e
    assert len(got_d) > 0


def test_assign_to_centroids_is_a_total_argmax_partition(spark):
    from scats_transis_kinesis_spark.operators import similarity as S

    vecs = _vectors()
    emb = _emb_df(spark, vecs)
    cents, assigned = S.assign_centroids(emb, 8)
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    # Total: every vector assigned exactly once.
    assert sorted(got) == list(range(len(vecs)))
    # Argmax with id tiebreak, replayed in numpy on the f32 values.
    f64 = {
        i: np.array(np.array(v, dtype=np.float32), dtype=np.float64)
        for i, v in enumerate(vecs)
    }

    def cos(a, b):
        return _round_half(
            float(np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))
        )

    for i, v in f64.items():
        want = min(range(8), key=lambda c: (-cos(v, f64[c]), c))
        assert got[i] == want, (i, got[i], want)


def test_kmeans_centroids_consistent_with_assignment(spark):
    from scats_transis_kinesis_spark.operators.ml import (
        kmeans_assign,
        kmeans_centroids,
    )

    vecs = _vectors(n=12, dim=4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )
    assign = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, k=5, iters=2, dim=4).collect()
    }
    cents = {
        r["centroid_id"]: r["cvec"]
        for r in kmeans_centroids(df, k=5, iters=2, dim=4).collect()
    }
    # One exported centroid per surviving cluster, never more than k.
    assert set(cents) == set(assign.values())
    assert len(cents) <= 5
    # Each export is the round-6 mean of exactly its members (the
    # final-update definition).
    for cid, c in cents.items():
        members = [vecs[i] for i, a in assign.items() if a == cid]
        want = [
            _round_half(sum(m[j] for m in members) / len(members))
            for j in range(4)
        ]
        assert list(c) == want
