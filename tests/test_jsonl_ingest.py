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
