"""Hand-computed anchor for the SemDeDup pruning stage.

Drives operators/dedup.py:semantic_prune_stats on hand-built clustered
vectors: an exact duplicate must drop (keep-lowest-id), an orthogonal
vector must survive, an ANTI-parallel vector must survive (the
sign-check — cos² alone would wrongly drop it), and cluster boundaries
must isolate (identical vectors in different clusters both survive).
"""

from __future__ import annotations


def _rows():
    # cluster 0: v1 == v2 (dup, drop id 2), v3 orthogonal (keep)
    # cluster 1: v4 and v5 anti-parallel (keep both: sign-checked)
    # cluster 2: v6 identical to v1 but in its own cluster (keep)
    return [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0]),
        (3, 0, [0.0, 1.0]),
        (4, 1, [1.0, 0.0]),
        (5, 1, [-1.0, 0.0]),
        (6, 2, [1.0, 0.0]),
    ]


def test_semdedup_drops_dup_keeps_orthogonal_and_antiparallel(spark):
    from scats_transis_kinesis_spark.operators.dedup import semantic_prune_stats

    df = spark.createDataFrame(
        _rows(), "vec_id long, cid int, v array<double>"
    )
    out = {
        r["cluster"]: r
        for r in semantic_prune_stats(df, tau_ppm=990_000).collect()
    }
    c0 = out[0]
    assert (c0["n_vecs"], c0["n_dropped"], c0["dropped_checksum"]) == (3, 1, 2)
    c1 = out[1]
    assert (c1["n_vecs"], c1["n_dropped"], c1["dropped_checksum"]) == (2, 0, 0)
    c2 = out[2]
    assert (c2["n_vecs"], c2["n_dropped"], c2["dropped_checksum"]) == (1, 0, 0)
