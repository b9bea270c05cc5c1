"""Randomized brute-force parity for lossless prefix containment.

``containment_prefix_pairs`` claims a LOSSLESS prefix-probe guarantee —
every pair whose small-side containment reaches the threshold must
surface regardless of the size ratio (the tiny-excerpt-in-huge-doc case
Jaccard banding misses).  This replays exact all-pairs shingle
containment in plain Python, including planted excerpt/container pairs
with extreme size ratios, and requires set AND value equality."""

from __future__ import annotations

import random


def _sh(text: str, n: int = 3) -> frozenset:
    w = text.split(" ")
    return frozenset(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))


def test_containment_prefix_pairs_match_bruteforce(spark):
    rng = random.Random(99)
    vocab = [f"t{i}" for i in range(40)]
    docs = []
    # A huge "container" doc and tiny excerpts cut from it — the
    # structural blind spot of symmetric-Jaccard banding.
    container = [rng.choice(vocab) for _ in range(120)]
    docs.append((0, " ".join(container)))
    for i in range(1, 4):
        start = rng.randrange(0, 100)
        docs.append((i, " ".join(container[start : start + 8])))
    # Random background docs.
    for i in range(4, 30):
        docs.append(
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
        )

    from scats_transis_kinesis_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        containment_prefix_pairs,
    )

    expect = {}
    sets = {i: _sh(t) for i, t in docs if _sh(t)}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            cab = round(inter / len(sets[a]), 6)
            cba = round(inter / len(sets[b]), 6)
            if max(cab, cba) >= CONTAINMENT_THRESHOLD:
                expect[(a, b)] = (cab, cba)

    # Sanity: the planted excerpts must actually be in the expectation,
    # or the fixture lost its point.
    assert any(k[0] == 0 or k[1] == 0 for k in expect)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (
            round(r["containment_a_in_b"], 6),
            round(r["containment_b_in_a"], 6),
        )
        for r in containment_prefix_pairs(df).collect()
    }
    assert got == expect
