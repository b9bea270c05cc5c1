"""Round-7 anchor for the MERGE-INTO upsert operator.

The registry query's oracle replicates the same union+keep-latest
definition, so the MERGE semantics themselves (change row REPLACES the
matched base row wholesale, unmatched change rows INSERT, untouched
base rows survive byte-identical) need a hand-checked pin.
"""

from __future__ import annotations


def test_upsert_merge_semantics(spark):
    from scats_transis_kinesis_spark.operators.relational import upsert

    base = spark.createDataFrame(
        [
            (1, "alice", 100.0),
            (2, "bob", 200.0),
            (3, "carol", 300.0),
        ],
        "id long, name string, balance double",
    )
    changes = spark.createDataFrame(
        [
            (2, "bob-updated", 250.0),   # update: replaces base row 2
            (4, "dave", 400.0),          # insert: new key
            (3, "carol", 300.0),         # no-op change: still "wins"
        ],
        "id long, name string, balance double",
    )

    got = sorted(
        tuple(r) for r in upsert(base, changes, "id").collect()
    )
    assert got == [
        (1, "alice", 100.0),          # untouched base row survives
        (2, "bob-updated", 250.0),    # change wins wholesale
        (3, "carol", 300.0),          # identical change is idempotent
        (4, "dave", 400.0),           # unmatched change inserts
    ]

    # Applying the SAME change set twice is idempotent (MERGE contract).
    twice = sorted(
        tuple(r)
        for r in upsert(upsert(base, changes, "id"), changes, "id").collect()
    )
    assert twice == got

    # An empty change set is the identity.
    empty = changes.where("id < 0")
    assert sorted(tuple(r) for r in upsert(base, empty, "id").collect()) == [
        (1, "alice", 100.0),
        (2, "bob", 200.0),
        (3, "carol", 300.0),
    ]
