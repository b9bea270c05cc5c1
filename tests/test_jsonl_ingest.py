"""Corpus ingestion from JSONL with explicit corrupt-record policy
(`sources/loaders.py:read_documents_jsonl`)."""

import json

import pytest

from scats_transis_kinesis_spark.sources.loaders import read_documents_jsonl

GOOD = [
    {"doc_id": 1, "text": "a b c", "lang": "en", "source": "s0", "n_chars": 5},
    {"doc_id": 2, "text": "d e", "lang": "fr", "source": "s1", "n_chars": 3},
]
BAD_LINES = ['{"doc_id": broken', "not json at all"]


@pytest.fixture()
def corpus_path(tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [json.dumps(GOOD[0]), BAD_LINES[0], json.dumps(GOOD[1]), BAD_LINES[1]]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_permissive_quarantines_corrupt_lines(spark, corpus_path):
    df = read_documents_jsonl(spark, corpus_path)
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert sorted(r["doc_id"] for r in good) == [1, 2]
    # Quarantined rows keep the raw line for a dead-letter sink and
    # carry null data columns.
    assert sorted(r["_corrupt_record"] for r in bad) == sorted(BAD_LINES)
    assert all(r["doc_id"] is None for r in bad)


def test_dropmalformed_keeps_only_parseable(spark, corpus_path):
    df = read_documents_jsonl(spark, corpus_path, mode="DROPMALFORMED")
    assert sorted(r["doc_id"] for r in df.collect()) == [1, 2]
    assert "_corrupt_record" not in df.columns


def test_failfast_raises_on_corrupt(spark, corpus_path):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    df = read_documents_jsonl(spark, corpus_path, mode="FAILFAST")
    with pytest.raises((PySparkException, Py4JJavaError)):
        df.collect()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC as an interchange format (built into Spark): a table written
    to ORC reads back value-identical to the parquet path, and filters
    still push into the ORC scan (the format swap keeps the scan-level
    optimizations parquet gets)."""
    import re

    from pyspark.sql import functions as F

    from scats_transis_kinesis_spark.sources.loaders import load_table

    orders = load_table(spark, "orders", "/root/testdata/sf0.001")
    dst = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(dst)

    back = spark.read.orc(dst)
    pred = F.col("o_totalprice") > 200000.0
    proj = ["o_orderkey", "o_totalprice"]
    expect = {tuple(r) for r in orders.where(pred).select(*proj).collect()}
    got_df = back.where(pred).select(*proj)
    got = {tuple(r) for r in got_df.collect()}
    assert got == expect and len(got) > 0

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "OrcScan" in plan or "Format: ORC" in plan or "orc" in plan.lower()
    assert re.search(r"PushedFilters:.*GreaterThan\(o_totalprice", plan), plan[:800]
    # column pruning reaches the scan too
    assert re.search(r"ReadSchema:[^\n]*o_orderkey", plan)
    assert not re.search(r"ReadSchema:[^\n]*o_orderdate", plan)
