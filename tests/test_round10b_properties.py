"""Property-based tests (hypothesis) for the round-10 extended-session
addition math.

The Spark queries are pinned by the oracle gate and the replay anchors
(tests/test_round10b_anchors.py); these pin the DEFINITIONS over the
whole input space:

- Streaming dedup state: for ANY multiset of (doc_id, text) and ANY
  partition into ANY number of micro-batches, (min, sum)-merging the
  per-batch (hash -> min id, count) partials equals the one-shot
  groupBy — the algebraic identity that makes
  incremental_exact_dedup_stream batch-count-invariant.  The in_base
  flag depends only on the base hash SET, so it is split-invariant by
  construction (also asserted).
- Pair-counting agreement: for ANY two partitions of the same items,
  matched pairs never exceed either side's own pair count, the Rand
  index lies in [0, 1e6] with 1e6 exactly on identical partitions
  (ari = 1.0 there), and both Rand and ARI are invariant under
  relabeling either partition — the property that makes the stability
  audit meaningful across independent trainings (cluster IDs carry no
  information; pair structure does).
- Farthest-point traversal: the selection-time min-distances are
  non-increasing round over round, the first pick is the smallest id,
  picks are distinct while distinct points remain, and after the run
  every point's distance to the selected set is <= the last selection
  distance — the max-min guarantee the seeding audit's spread story
  rests on.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

M = 1_000_000


def _round_half(x: float, nd: int = 6) -> float:
    scale = 10**nd
    v = x * scale
    r = math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)
    return r / scale


# --- streaming dedup state: m-way (min, sum) merge == one-shot groupBy ------

_dedup_corpus = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.sampled_from(["a", "b", "c", "d", "e"]),  # texts, few so
    min_size=1,                                         # dupes are common
    max_size=15,
)


def _oneshot(docs: dict[int, str]) -> dict[str, tuple[int, int]]:
    out: dict[str, tuple[int, int]] = {}
    for d, t in docs.items():
        if t in out:
            out[t] = (min(out[t][0], d), out[t][1] + 1)
        else:
            out[t] = (d, 1)
    return out


@given(
    _dedup_corpus,
    st.lists(st.integers(min_value=0, max_value=4), min_size=31, max_size=31),
    st.sets(st.sampled_from(["a", "b", "c", "d", "e"])),
)
@settings(max_examples=80, deadline=None)
def test_mway_minsum_merge_equals_oneshot_groupby(docs, batch_of, base):
    """Partition the docs into up to 5 'micro-batches' by an arbitrary
    assignment; (min, sum)-merging the per-batch partials must equal
    the one-shot groupBy — for every corpus and every partition — and
    the in_base flag (a join against a fixed base set) therefore
    cannot depend on the split either."""
    batches: dict[int, dict[int, str]] = {}
    for d, t in docs.items():
        batches.setdefault(batch_of[d], {})[d] = t
    merged: dict[str, tuple[int, int]] = {}
    for b in batches.values():
        for t, (kid, n) in _oneshot(b).items():
            if t in merged:
                merged[t] = (min(merged[t][0], kid), merged[t][1] + n)
            else:
                merged[t] = (kid, n)
    assert merged == _oneshot(docs)
    # The final report row (keep_id, n_copies, in_base) per hash:
    report = {t: (kid, n, t in base) for t, (kid, n) in merged.items()}
    want = {t: (kid, n, t in base) for t, (kid, n) in _oneshot(docs).items()}
    assert report == want


# --- pair-counting agreement --------------------------------------------------


def _agreement(pa: dict[int, int], pb: dict[int, int]):
    cells = Counter((pa[i], pb[i]) for i in pa)

    def c2(x: int) -> int:
        return x * (x - 1) // 2

    matched = sum(c2(v) for v in cells.values())
    a: Counter = Counter()
    b: Counter = Counter()
    for (ca, cb), v in cells.items():
        a[ca] += v
        b[cb] += v
    full_pairs = sum(c2(v) for v in a.values())
    half_pairs = sum(c2(v) for v in b.values())
    tot = c2(sum(cells.values()))
    rand = (
        (matched + tot - full_pairs - half_pairs + matched) * M // tot
        if tot > 0
        else None
    )
    exp_idx = full_pairs * half_pairs / tot if tot > 0 else 0.0
    den = (full_pairs + half_pairs) / 2.0 - exp_idx
    ari = _round_half((matched - exp_idx) / den) if tot > 0 and den > 0 else None
    return matched, full_pairs, half_pairs, rand, ari


_labels = st.lists(st.integers(min_value=0, max_value=5), min_size=2, max_size=25)


@given(_labels, _labels)
@settings(max_examples=150, deadline=None)
def test_pair_agreement_bounds(la, lb):
    n = min(len(la), len(lb))
    pa = {i: la[i] for i in range(n)}
    pb = {i: lb[i] for i in range(n)}
    matched, full_pairs, half_pairs, rand, ari = _agreement(pa, pb)
    # A matched pair is same-cluster on BOTH sides, so it counts into
    # each side's own pair total.
    assert matched <= min(full_pairs, half_pairs)
    assert rand is not None and 0 <= rand <= M
    if ari is not None:
        assert ari <= 1.0


@given(_labels, st.permutations(list(range(6))))
@settings(max_examples=100, deadline=None)
def test_pair_agreement_relabel_invariance_and_identity(la, perm):
    """Relabeling either side changes nothing (cluster IDs carry no
    information), and a partition compared against its own relabeling
    scores exact identity — rand 1e6, ari 1.0 whenever the partition
    is non-trivial enough for ARI to be defined."""
    pa = {i: v for i, v in enumerate(la)}
    pb = {i: perm[v] for i, v in enumerate(la)}
    got = _agreement(pa, pb)
    want = _agreement(pa, pa)
    assert got == want
    matched, full_pairs, half_pairs, rand, ari = got
    assert matched == full_pairs == half_pairs
    assert rand == M
    if ari is not None:
        assert ari == 1.0


@given(_labels, _labels, st.permutations(list(range(6))))
@settings(max_examples=100, deadline=None)
def test_pair_agreement_invariant_under_one_side_relabel(la, lb, perm):
    n = min(len(la), len(lb))
    pa = {i: la[i] for i in range(n)}
    pb = {i: lb[i] for i in range(n)}
    pb_re = {i: perm[v] for i, v in pb.items()}
    assert _agreement(pa, pb) == _agreement(pa, pb_re)


# --- farthest-point traversal --------------------------------------------------

_vecset = st.dictionaries(
    keys=st.integers(min_value=0, max_value=20),
    values=st.lists(
        st.sampled_from([-1.0, -0.5, 0.0, 0.25, 0.5, 1.0, 2.0]),
        min_size=2,
        max_size=2,
    ),
    min_size=1,
    max_size=12,
)


def _sqd(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return _round_half(acc)


@given(_vecset, st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_kcenter_traversal_maxmin_invariants(vecs, k):
    ids = sorted(vecs)
    order = [ids[0]]
    md = {i: _sqd(vecs[i], vecs[ids[0]]) for i in ids}
    sel_mds = []
    for _ in range(1, k):
        nxt = max(ids, key=lambda i: (md[i], -i))
        sel_mds.append(md[nxt])
        order.append(nxt)
        for i in ids:
            md[i] = min(md[i], _sqd(vecs[i], vecs[nxt]))
    # Selection-time distances are non-increasing: each pick removes
    # the current farthest point, so the next max cannot grow.
    assert sel_mds == sorted(sel_mds, reverse=True)
    # First pick is the smallest id; picks stay distinct while any
    # point with positive min-distance remains.
    assert order[0] == ids[0]
    n_distinct_points = len({tuple(v) for v in vecs.values()})
    picked = []
    for i, m in zip(order[1:], sel_mds):
        if m > 0:
            picked.append(i)
    assert len(set(picked)) == len(picked)
    assert len(set(order)) == min(k, max(n_distinct_points, 1), len(ids))
    # Max-min guarantee: after the run, no point is farther from the
    # selected set than the last selection distance.
    if sel_mds:
        assert max(md.values()) <= sel_mds[-1]
