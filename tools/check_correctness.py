#!/usr/bin/env python
"""Local clone of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` at sf0.01 on Spark AND
its ``oracle_sql()`` twin in DuckDB, then compares:

- row count
- column names (sorted)
- order-insensitive value multiset (columns sorted by name, rows sorted,
  canonical string rendering)

Usage: python tools/check_correctness.py [query ...] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
SF01_DIR = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# The decimal-boundary-flip watchlist (the round-5 Holt / percent_rank
# class): queries whose contract still carries a ``round(double, 6)`` of
# a small-denominator exact rational or an iterative/cancellation-heavy
# double expression — exactly the shape that passes at one scale factor
# and flips one ulp at another because a value lands ON the 6-decimal
# half boundary.  ``--fp-sweep`` runs this list (default sf0.1, the SF
# that historically exposed the flips) so a regression in the class
# surfaces locally before the driver sees it.  Queries whose outputs
# are pure integers/micros are deliberately absent — they cannot flip.
FP_SENSITIVE = [
    "spearman_daily_kpis",       # corr over ranks + sufficient-stat pearson
    "stats_correlation",         # corr/covar/regr_slope family
    "welch_t_test_orders",       # fixed-order t / df doubles
    "anova_f_priority_spend",    # F statistic double
    "kruskal_wallis_priority_spend",  # H statistic double
    "chi2_lang_source_independence",  # chi2 double
    "mutual_information_lang_source", # log-ratio doubles
    "lang_id_agreement_ari",     # ARI fixed-order double
    "ks_drift_orders",           # max-gap over ECDF ratios
    "quality_auc_en",            # rank-sum AUC ratio
    "trend_seasonal_decompose",  # regression slope doubles
    "seasonal_strength_audit",   # variance-ratio doubles
    "theil_sen_trend_daily",     # median-of-slopes rationals
    "acf_hourly_traffic",        # autocorrelation ratios
    "holt_linear_daily",         # the original boundary-flip query
    "burst_detection_daily",     # Viterbi log-likelihood doubles
    "markov_stationary_events",  # power-iteration micros + doubles
    "hits_hubs_authorities",     # iterative normalization
    "pca_top_component",         # power iteration on Gram doubles
    "jl_projection_distortion_audit",  # distortion ratio doubles
    "embedding_anisotropy_audit",      # cosine-moment doubles
    "zipf_law_fit",              # log-log regression doubles
    "heaps_law_fit",             # log-log regression doubles
    "domain_shift_kl",           # KL log-ratio doubles
    "window_distribution_stats", # percent_rank/cume_dist contract
    "dsir_importance_weights",   # log-importance doubles
    "ivf_quantizer_stability_audit",  # ARI fixed-order double (round 10)
]


def canon(v):
    """Canonical string rendering for hashing/compare."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, Decimal):
        return canon(float(v))
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    # Sentinel default (None) so --fp-sweep can tell "user passed
    # --sf-dir" (either form: "--sf-dir PATH" or "--sf-dir=PATH") apart
    # from the default without inspecting sys.argv (round-7 ADVICE fix).
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument(
        "--json",
        metavar="PATH",
        help="also write per-query results as a JSON artifact "
        "(checked in per round so the local rerun is auditable)",
    )
    ap.add_argument(
        "--fp-sweep",
        action="store_true",
        help="run the FP_SENSITIVE decimal-boundary watchlist at sf0.1 "
        "(names/--sf-dir still override)",
    )
    ap.add_argument(
        "--cpus",
        type=int,
        metavar="N",
        help="run under local[N] with N shuffle partitions (the "
        "partition-invariance sweep: a different layout reshapes every "
        "AQE stage, catching expressions that are only total on the "
        "rows a later join keeps — the round-8 Adamic-Adar degree-1 "
        "lesson).  Equivalent to SPARK_GRAFT_CPUS=N.",
    )
    args = ap.parse_args()
    # `is not None`, not truthiness: `--cpus 0` must be rejected, not
    # silently ignored (round-8 ADVICE).
    if args.cpus is not None and args.cpus < 1:
        ap.error("--cpus must be >= 1")
    if args.cpus is not None:
        # Must land before the session module is imported: it reads
        # SPARK_GRAFT_CPUS at import time.
        import os

        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    if args.fp_sweep:
        args.names = args.names or list(FP_SENSITIVE)
        if args.sf_dir is None:
            args.sf_dir = SF01_DIR
    if args.sf_dir is None:
        args.sf_dir = SF_DIR
    results: dict[str, dict] = {}

    import duckdb

    import __spark_entry__ as entrymod
    from scats_transis_kinesis_spark.session import get_session

    spark = get_session(extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    # Auditability: the fp-sweep default redirect makes the effective
    # data directory non-obvious from the command line alone.
    print(f"== checking {len(names)} queries against {args.sf_dir}")
    # Conf probe (round-10, generalizing the round-9 Arrow-off lesson):
    # every invariance-axis run must RECORD the effective value of the
    # conf it claims to sweep — PYSPARK_SUBMIT_ARGS silently loses to
    # session-pinned confs, so a recorded matrix without this line can
    # be vacuous.  One line per run; the axis log IS the evidence.
    probe = {
        "master": spark.sparkContext.master,
        "shuffle": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "arrow": spark.conf.get("spark.sql.execution.arrow.pyspark.enabled"),
        "codegen": spark.conf.get("spark.sql.codegen.wholeStage", "true"),
        "ansi": spark.conf.get("spark.sql.ansi.enabled"),
    }
    print("== conf probe: " + " ".join(f"{k}={v}" for k, v in probe.items()))
    n_pass = n_fail = n_rowsonly = 0
    t_all = time.time()
    for name in names:
        t0 = time.time()
        # Per-query cache isolation (same as bench.py): persisted
        # frames are scoped to one query's run, never accumulated
        # across the 150-query gate process.
        spark.catalog.clearCache()
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            results[name] = {"status": "fail", "err": f"spark: {str(e)[:300]}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            results[name] = {
                "status": "rows_only",
                "rows": len(srows),
                "secs": round(time.time() - t0, 1),
            }
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            results[name] = {"status": "fail", "err": f"duckdb: {str(e)[:300]}"}
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sc, oc = canon_rows(scols, srows), canon_rows(ocols, orows)
            if sc != oc:
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
                problems.append(
                    f"values differ in {len(diffs)}/{len(sc)} rows; first: "
                    f"spark={diffs[0][0][:160]} oracle={diffs[0][1][:160]}"
                    if diffs
                    else "multiset mismatch"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {"status": "fail", "err": "; ".join(problems)[:400]}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            results[name] = {
                "status": "pass",
                "rows": len(srows),
                "secs": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(
        f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
        f"({time.time()-t_all:.1f}s total)"
    )
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rowsonly,
                    "queries": results,
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
