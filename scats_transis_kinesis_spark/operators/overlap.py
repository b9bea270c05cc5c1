"""Overlap independent driver-sequenced pipelines (guide §2.6).

Several audit queries build two or three INDEPENDENT sub-pipelines
(e.g. separate quantizer trainings) whose driver code is a sequence of
small jobs — per-round collects, eager ``localCheckpoint`` pins.  Run
serially, every one of those jobs pays its scheduling floor while the
rest of the cluster idles; Spark's scheduler happily runs jobs from
several driver threads at once, and FIFO scheduling back-fills the
tail of one branch with the next branch's tasks.

``run_concurrently`` executes the thunks on a small thread pool and
returns their results in input order.  Each thunk's RESULT is
unchanged — only the wall-clock interleaving of the jobs differs — so
cross-engine determinism contracts are untouched.  Exceptions
propagate: the first failing thunk re-raises in the caller (the other
threads are still joined first, so no job leaks past the query).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence, TypeVar

T = TypeVar("T")


def run_concurrently(
    thunks: Sequence[Callable[[], T]], max_workers: int | None = None
) -> list[T]:
    """Run ``thunks`` concurrently; return results in input order.

    2-3 branches in flight is the sweet spot (enough to fill job-floor
    gaps, not enough to thrash the scheduler) — the default pool size
    is ``len(thunks)`` capped at 4."""
    if len(thunks) == 1:
        return [thunks[0]()]
    workers = max_workers or min(len(thunks), 4)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(t) for t in thunks]
        # futures.result() re-raises the thunk's exception; iterate in
        # order so results align with input order.
        return [f.result() for f in futures]
