#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry (run after adding queries)."""
import re
import sys

sys.path.insert(0, ".")

from scats_transis_kinesis_spark.plans.registry import REGISTRY  # noqa: E402

lines = [
    "# QUERIES — the registered driver surface\n",
    "\nAuto-generated from `plans/registry.py` by `tools/gen_queries_md.py`;",
    " one row per `__spark_entry__.queries()` entry.",
    " **Oracle** = hash-checked against DuckDB at sf0.01 by the driver",
    " (`rows-only` = no SQL twin, weaker check).\n",
    "\n| Query | Oracle | What it covers |",
    "\n| --- | --- | --- |",
]
for name in sorted(REGISTRY):
    spec = REGISTRY[name]
    doc = " ".join((spec.doc or "").split())
    doc = re.sub(r"\s+", " ", doc)
    if len(doc) > 220:
        doc = doc[:217] + "..."
    oracle = "✓" if spec.oracle is not None else "rows-only"
    lines.append(f"\n| `{name}` | {oracle} | {doc} |")
lines.append("\n")
open("QUERIES.md", "w").write("".join(lines))
print(f"QUERIES.md: {len(REGISTRY)} queries")
