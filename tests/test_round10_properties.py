"""Property-based tests (hypothesis) for the round-10 addition math.

The Spark queries are pinned by the oracle gate and the replay anchors
(tests/test_round10_anchors.py); these pin the DEFINITIONS over the
whole input space — corpus shapes, batch partitions, vector sets and
quantizers that example-based anchors under-sample.

- Streaming span inventory: for ANY corpus and ANY partition of the
  docs into ANY number of micro-batches, the sum-merged per-span
  distinct-doc counts equal the full recompute's — the algebraic
  identity that makes incremental_span_coverage_stream's state table
  batch-count-invariant (round 9 proved the 2-split case; the stream
  needs the m-way generalization).
- k-means centroid export: the exported quantizer is exactly the
  round-6 per-dimension means of the final assignment's clusters — one
  centroid per SURVIVING cluster (empty ones drop out), never more
  than k, and each exported coordinate set is the mean of precisely
  its members.
- Quantizer-agnostic audit bounds: for ANY vector set and ANY centroid
  set (corpus-seeded or not), probing ALL clusters makes the candidate
  set "everything but self" — recall exactly 1e6 — and recall /
  candidate volume are monotone in the probe count.  This is what
  makes the seed-vs-kmeans comparison fair: the audit's ceiling and
  monotonicity hold for every quantizer, so differences can only come
  from centroid placement.
- Balance audit: cluster sizes partition the corpus (sum == n), the
  floor-micros max/mean occupancy is >= 1e6 with equality exactly on
  a perfectly even split, and it is scale-free (duplicating every
  cluster's size leaves it unchanged).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

M = 1_000_000
SPAN_N = 3  # property-space span length (shorter than prod's 5 so tiny
# random docs actually produce repeats; every property is length-generic)


def _round_half(x: float, nd: int = 6) -> float:
    scale = 10**nd
    v = x * scale
    r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    return r / scale


# --- streaming span inventory: m-way merge == full recompute ---------------

_corpus = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=10,
)


def _inventory(docs: dict[int, list[str]], n: int = SPAN_N) -> dict[tuple, int]:
    inv: dict[tuple, set] = {}
    for d, w in docs.items():
        for i in range(len(w) - n + 1):
            inv.setdefault(tuple(w[i : i + n]), set()).add(d)
    return {g: len(ds) for g, ds in inv.items()}


@given(
    _corpus,
    st.lists(st.integers(min_value=0, max_value=4), min_size=31, max_size=31),
)
@settings(max_examples=60, deadline=None)
def test_mway_partition_merge_equals_full_inventory(docs, batch_of):
    """Partition the docs into up to 5 'micro-batches' by an arbitrary
    assignment; summing the per-batch partial inventories must equal
    the full recompute — for every corpus and every partition.  This is
    the exact state-table maintenance incremental_span_coverage_stream
    performs per batch (and why its answer cannot depend on
    maxFilesPerTrigger, file order, or repartitioning)."""
    batches: dict[int, dict] = {}
    for d, w in docs.items():
        batches.setdefault(batch_of[d], {})[d] = w
    merged: dict[tuple, int] = {}
    for b in batches.values():
        for g, c in _inventory(b).items():
            merged[g] = merged.get(g, 0) + c
    assert merged == _inventory(docs)
    # ...and therefore the repeated set (>= 2) agrees too.
    assert {g for g, c in merged.items() if c >= 2} == {
        g for g, c in _inventory(docs).items() if c >= 2
    }


# --- k-means centroid export -------------------------------------------------

_vecset = st.dictionaries(
    keys=st.integers(min_value=0, max_value=20),
    values=st.lists(
        st.sampled_from([-1.0, -0.5, 0.0, 0.25, 0.5, 1.0, 2.0]),
        min_size=3,
        max_size=3,
    ),
    min_size=2,
    max_size=12,
)


def _lloyd(vecs: dict[int, list[float]], k: int, iters: int):
    """The published contract: smallest-id init, round-6 left-fold
    squared distances, (dist, cid) argmin, round-6 means, empty
    clusters dropping out.  Returns (exported cents, final assign)."""
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    cents = {cid: list(vecs[i]) for cid, i in enumerate(ids[:k])}
    assigned: dict[int, int] = {}
    for _ in range(iters):
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
            assigned[vid] = best[1]
        cents = {
            cid: [
                _round_half(
                    sum(vecs[m][j] for m in ids if assigned[m] == cid)
                    / sum(1 for m in ids if assigned[m] == cid)
                )
                for j in range(dim)
            ]
            for cid in sorted(set(assigned.values()))
        }
    return cents, assigned


@given(_vecset, st.integers(min_value=1, max_value=5))
@settings(max_examples=60, deadline=None)
def test_kmeans_export_is_exactly_the_final_cluster_means(vecs, k):
    cents, assigned = _lloyd(vecs, k, iters=2)
    # One exported centroid per SURVIVING cluster, never more than k.
    assert set(cents) == set(assigned.values())
    assert len(cents) <= min(k, len(vecs))
    # Each exported centroid is the round-6 mean of precisely its
    # members — the final-update definition kmeans_centroids exports.
    for cid, c in cents.items():
        members = [v for v, a in assigned.items() if a == cid]
        dim = len(next(iter(vecs.values())))
        want = [
            _round_half(sum(vecs[m][j] for m in members) / len(members))
            for j in range(dim)
        ]
        assert c == want
    # Every vector is accounted for exactly once.
    assert sorted(assigned) == sorted(vecs)


@given(_vecset)
@settings(max_examples=60, deadline=None)
def test_kmeans_k1_exports_the_global_mean(vecs):
    """Degenerate quantizer: with one cluster there is nothing to
    iterate — the export must be exactly the round-6 global mean, and
    every vector must sit in cluster 0, for any corpus and any round
    count."""
    for iters in (1, 3):
        cents, assigned = _lloyd(vecs, k=1, iters=iters)
        dim = len(next(iter(vecs.values())))
        assert set(assigned.values()) == {0}
        assert cents == {
            0: [
                _round_half(sum(v[j] for v in vecs.values()) / len(vecs))
                for j in range(dim)
            ]
        }


# --- quantizer-agnostic audit bounds -----------------------------------------


def _cos(a, b) -> float:
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return _round_half(num / den)


_nonzero_vec = st.lists(
    st.sampled_from([-1.0, -0.5, 0.25, 0.5, 1.0, 2.0]), min_size=3, max_size=3
)


@given(
    st.dictionaries(
        keys=st.integers(min_value=0, max_value=15),
        values=_nonzero_vec,
        min_size=3,
        max_size=10,
    ),
    st.lists(_nonzero_vec, min_size=1, max_size=5),
)
@settings(max_examples=60, deadline=None)
def test_audit_recall_monotone_and_exact_at_full_probe_for_any_quantizer(
    vecs, cent_vecs
):
    """For ANY corpus and ANY centroid set: candidates only grow with
    nprobe (so recall and cost are monotone), and probing ALL clusters
    degenerates to brute force — recall exactly 1e6.  The ceiling and
    monotonicity are quantizer-independent, which is what lets the
    seed-vs-kmeans rows differ ONLY through centroid placement."""
    ids = sorted(vecs)
    k = min(3, len(ids) - 1)
    if k == 0:
        return
    cents = dict(enumerate(cent_vecs))
    cids = sorted(cents)
    assigned = {
        i: min(cids, key=lambda c: (-_cos(vecs[i], cents[c]), c)) for i in ids
    }
    qids = ids[: min(2, len(ids))]
    exact = {
        q: set(
            sorted(
                (i for i in ids if i != q),
                key=lambda i: (-_cos(vecs[q], vecs[i]), i),
            )[:k]
        )
        for q in qids
    }
    prev_hits, prev_cand = -1, -1
    for p in range(1, len(cids) + 1):
        n_cand = n_hits = 0
        for q in qids:
            probed = set(
                sorted(cids, key=lambda c: (-_cos(vecs[q], cents[c]), c))[:p]
            )
            cand = [i for i in ids if i != q and assigned[i] in probed]
            n_cand += len(cand)
            topk = sorted(
                cand, key=lambda i: (-_cos(vecs[q], vecs[i]), i)
            )[:k]
            n_hits += len(set(topk) & exact[q])
        assert n_cand >= prev_cand and n_hits >= prev_hits
        prev_hits, prev_cand = n_hits, n_cand
    # Full probe: every cluster is probed, so candidates == all non-self
    # vectors and the approximate top-k IS the exact top-k.
    assert prev_cand == len(qids) * (len(ids) - 1)
    assert prev_hits * M // (len(qids) * k) == M


# --- balance audit ------------------------------------------------------------


@given(st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=16))
@settings(max_examples=100, deadline=None)
def test_balance_imbalance_micros_bounds_and_scale_freedom(sizes):
    n_cl, n_v = len(sizes), sum(sizes)
    imb = max(sizes) * M * n_cl // n_v
    # max >= mean always, with floor-micros equality exactly on a
    # perfectly even split.
    assert imb >= M
    if len(set(sizes)) == 1:
        assert imb == M
    if imb == M:
        assert max(sizes) * n_cl == n_v  # floor can't hide real skew > 0
    # Scale-free: doubling every cluster leaves the skew number alone
    # (it measures SHAPE, so it transfers from sf0.01 to 100 TB).
    doubled = [s * 2 for s in sizes]
    assert max(doubled) * M * n_cl // sum(doubled) == imb
