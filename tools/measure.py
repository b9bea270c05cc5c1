#!/usr/bin/env python
"""Isolated per-query measurement (optimization-round harness).

Times each named registry query min-of-N with the noop sink (guide
S1.4) in a fresh tuned session, optionally dumping
``.explain("formatted")`` per query, and prints one JSON line.

Usage:
    python tools/measure.py q1 q2 ... [--passes 3] [--explain-dir plans/r10]
        [--suffix _before] [--sf-dir DIR] [--json OUT]

The timing methodology matches bench.py (noop sink, clearCache between
passes, min-of-N as the spike-robust estimator on this bursty host) so
isolated numbers are comparable to suite numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from scats_transis_kinesis_spark.plans.registry import REGISTRY
    from scats_transis_kinesis_spark.session import get_session

    spark = get_session(
        app_name="measure",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # Warm JVM/parquet footers the way bench.py does.
    REGISTRY["q1_pricing_summary"].fn(spark, args.sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    times: dict[str, float] = {}
    for name in args.queries:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = REGISTRY[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        best = None
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.time()
            REGISTRY[name].fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        times[name] = round(best, 3)
        print(f"== {name}: {times[name]}s", flush=True)

    out = {"sf_dir": args.sf_dir, "passes": args.passes, "queries": times}
    line = json.dumps(out)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
