#!/bin/bash
# Round-10 OPTIMIZATION-session gate refresh on the final tree: the
# three default-gate artifacts plus the cheap invariance axes most
# sensitive to this round's plan changes (partition layout via
# local[7]/local[1]; static plans via AQE-off; interpreted eval via
# codegen-off; arrow-off for the declared Arrow stages).  Same probe
# rule as tools/run_gates_r10b.sh: a run only counts if its conf-probe
# line shows the swept value.
set -u
cd /root/repo
LOG=MATRIX_r10_opt.log
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

run "default sf0.001" - --sf-dir /root/testdata/sf0.001 --json CORRECTNESS_LOCAL_r10_sf0001.json
run "default sf0.01"  - --json CORRECTNESS_LOCAL_r10.json
run "default sf0.1"   - --sf-dir /root/testdata/sf0.1 --json CORRECTNESS_LOCAL_r10_sf01.json
run "local[7] sf0.001"    - --cpus 7 --sf-dir /root/testdata/sf0.001
run "local[1] sf0.001"    - --cpus 1 --sf-dir /root/testdata/sf0.001
run "codegen-off sf0.001" "spark.sql.codegen.wholeStage=false" --sf-dir /root/testdata/sf0.001
run "arrow-off sf0.001"   "spark.sql.execution.arrow.pyspark.enabled=false" --sf-dir /root/testdata/sf0.001
run "aqe-off sf0.001"     "spark.sql.adaptive.enabled=false" --sf-dir /root/testdata/sf0.001
run "local[7] sf0.01"   - --cpus 7
run "aqe-off sf0.01"    "spark.sql.adaptive.enabled=false"

echo "== matrix complete" >> "$LOG"
