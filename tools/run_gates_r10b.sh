#!/bin/bash
# Round-10 extended-session gate + invariance-matrix refresh on the
# 285-query tree.  Each run's conf-probe line + summary is appended to
# the matrix log (the axis-evidence rule: a run only counts if its
# probe line shows the swept conf at its intended value).
set -u
cd /root/repo
LOG=MATRIX_r10b.log
: > "$LOG"

run() {  # run <tag> <extra_conf or -> <args...>
  local tag="$1"; shift
  local conf="$1"; shift
  local t0=$SECONDS
  if [ "$conf" = "-" ]; then
    out=$(python tools/check_correctness.py "$@" 2>/dev/null)
  else
    out=$(SPARK_GRAFT_EXTRA_CONF="$conf" python tools/check_correctness.py "$@" 2>/dev/null)
  fi
  local dt=$((SECONDS - t0))
  {
    echo "== axis: $tag (${dt}s)"
    echo "$out" | grep -E "^== (checking|conf probe)"
    echo "$out" | grep -E "^== [0-9]+ pass"
    echo
  } >> "$LOG"
}

# Default gates (the committed per-SF artifacts)
run "default sf0.001" - --sf-dir /root/testdata/sf0.001 --json CORRECTNESS_LOCAL_r10_sf0001.json
run "default sf0.01"  - --json CORRECTNESS_LOCAL_r10.json
run "default sf0.1"   - --sf-dir /root/testdata/sf0.1 --json CORRECTNESS_LOCAL_r10_sf01.json

# Cheap axes at sf0.001
run "local[7] sf0.001"    - --cpus 7 --sf-dir /root/testdata/sf0.001
run "local[1] sf0.001"    - --cpus 1 --sf-dir /root/testdata/sf0.001
run "codegen-off sf0.001" "spark.sql.codegen.wholeStage=false" --sf-dir /root/testdata/sf0.001
run "arrow-off sf0.001"   "spark.sql.execution.arrow.pyspark.enabled=false" --sf-dir /root/testdata/sf0.001
run "aqe-off sf0.001"     "spark.sql.adaptive.enabled=false" --sf-dir /root/testdata/sf0.001

# sf0.01 axes
run "local[7] sf0.01"   - --cpus 7
run "arrow-off sf0.01"  "spark.sql.execution.arrow.pyspark.enabled=false"
run "aqe-off sf0.01"    "spark.sql.adaptive.enabled=false"

# Heavy sf0.1 axes last (trim point if the session runs short)
run "local[7] sf0.1" - --cpus 7 --sf-dir /root/testdata/sf0.1
run "aqe-off sf0.1"  "spark.sql.adaptive.enabled=false" --sf-dir /root/testdata/sf0.1

echo "== matrix complete" >> "$LOG"
