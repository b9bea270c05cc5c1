"""Schema evolution on the lake: appended batches gain columns over
time (a crawler adds a field mid-run), and readers must reconcile.

Two contracts, both standard lakehouse behavior the engine's ingest
path depends on:

- ``mergeSchema=true`` reconciles per-file footers into the union
  schema, NULL-filling files that predate a column — the read-side
  answer to additive evolution;
- an explicit user schema (the ``schemas.py`` discipline used by every
  loader) reads BOTH file generations without mergeSchema, projecting
  the declared columns and NULL-filling the missing — the plan the
  engine actually ships, since footer-merge over millions of files at
  100 TB is an expensive listing-time operation the explicit schema
  avoids.
"""

from __future__ import annotations

import os
import tempfile


def _write_generations(spark, path: str) -> None:
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(3, "gamma", "en"), (4, "delta", "de")],
        "doc_id long, text string, lang string",
    ).write.mode("append").parquet(path)


def test_merge_schema_unions_columns_and_null_fills(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "docs")
        _write_generations(spark, path)
        df = spark.read.option("mergeSchema", "true").parquet(path)
        assert set(df.columns) == {"doc_id", "text", "lang"}
        rows = {r["doc_id"]: r["lang"] for r in df.collect()}
        assert rows[1] is None and rows[2] is None
        assert rows[3] == "en" and rows[4] == "de"


def test_explicit_schema_reads_across_generations(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "docs")
        _write_generations(spark, path)
        df = spark.read.schema("doc_id long, text string, lang string").parquet(
            path
        )
        assert df.count() == 4
        by_id = {r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()}
        assert by_id[2] == ("beta", None)
        assert by_id[3] == ("gamma", "en")
        # And the narrow projection prunes to the declared columns only.
        assert spark.read.schema("doc_id long").parquet(path).columns == [
            "doc_id"
        ]
