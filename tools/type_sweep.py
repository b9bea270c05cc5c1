#!/usr/bin/env python
"""Sweep all oracles for output-type-family mismatches vs the Spark query.

The driver's correctness hasher canonicalizes VALUES, and a DuckDB HUGEINT
(int128, produced by sum(INTEGER)/sum(CASE...)) reaches pandas as
float64/object while Spark emits LONG — same number, different rendering,
hash mismatch.  This tool runs every registered oracle with ``LIMIT 0``
semantics (DuckDB DESCRIBE) and the Spark query's schema, then reports any
column whose type FAMILY (int / float / decimal / bool / string / ts /
date / list / other) differs between the two engines.

Usage: python tools/type_sweep.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

INT_FAMS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UTINYINT",
            "USMALLINT", "UINTEGER", "UBIGINT"}


def duck_family(t: str) -> str:
    u = str(t).upper()
    if u in INT_FAMS:
        return "int128" if u == "HUGEINT" else "int"
    if u in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if u.startswith("DECIMAL"):
        return "decimal"
    if u == "BOOLEAN":
        return "bool"
    if u in ("VARCHAR", "CHAR", "TEXT"):
        return "string"
    if u.startswith("TIMESTAMP"):
        return "ts"
    if u == "DATE":
        return "date"
    if u.endswith("[]") or u.startswith("LIST") or u.startswith("ARRAY"):
        return "list"
    if u.startswith("STRUCT") or u.startswith("MAP"):
        return "struct"
    if u == "BLOB":
        return "bytes"
    return "other:" + u


def spark_family(t: str) -> str:
    u = str(t).lower()
    if u in ("tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"):
        return "int"
    if u in ("float", "double"):
        return "float"
    if u.startswith("decimal"):
        return "decimal"
    if u == "boolean":
        return "bool"
    if u == "string":
        return "string"
    if u.startswith("timestamp"):
        return "ts"
    if u == "date":
        return "date"
    if u.startswith("array"):
        return "list"
    if u.startswith("struct") or u.startswith("map"):
        return "struct"
    if u == "binary":
        return "bytes"
    return "other:" + u


def collect_mismatches(spark, con, sf_dir, names=None):
    """Return {query_name: [issue, ...]} for every registered oracle whose
    output type family disagrees with the Spark query's schema (or whose
    either side fails to even build).  Pure analysis — neither engine
    executes the query, so the sweep is cheap enough to gate every round
    (the round-7 HUGEINT reds shipped precisely because this was not in
    the gate; VERDICT r7 §What's wrong #2).
    """
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if name not in oracles or (names and name not in names):
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = dict(sdf.dtypes)
        except Exception as e:
            bad[name] = [f"spark build error: {str(e)[:160]}"]
            continue
        try:
            rel = con.sql(oracles[name])
            otypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            bad[name] = [f"duckdb build error: {str(e)[:160]}"]
            continue
        issues = []
        for col in stypes:
            if col not in otypes:
                continue
            sf_, of_ = spark_family(stypes[col]), duck_family(otypes[col])
            # int128 is its own flag even though values match: pandas
            # renders HUGEINT as float/object, breaking the driver hash.
            if of_ == "int128":
                issues.append(f"{col}: duck HUGEINT (cast ::BIGINT) vs spark {stypes[col]}")
            elif sf_ != of_:
                issues.append(f"{col}: spark {stypes[col]}({sf_}) vs duck {otypes[col]}({of_})")
        if issues:
            bad[name] = issues
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    import duckdb

    from scats_transis_kinesis_spark.session import get_session

    spark = get_session(extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    bad = collect_mismatches(spark, con, args.sf_dir)
    for name, issues in bad.items():
        print(f"MISMATCH {name}: " + "; ".join(issues))
    print(f"== {len(bad)} queries with type-family mismatches")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
