#!/bin/bash
# ABBA order-balanced delta-vs-replace carry A/B in the politeness-
# budgeted |wave| << |state| regime (VERDICT r03 task #2; CLAUDE.md
# protocol: any effect expected <50% needs order balancing).
# Usage: scripts/ab_carry_deltas.sh SCALE CPUS BUDGET K OUT_FILE
# Runs delta, replace, replace, delta (each diag_ab warms on a scale-1
# politeness crawl first), waiting for loadavg < 2 before each run.
set -u
SCALE=$1; CPUS=$2; BUDGET=$3; K=$4; OUT=$5
REPO=$(cd "$(dirname "$0")/.." && pwd)

wait_quiet() {
  for _ in $(seq 1 60); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    if python3 -c "import sys; sys.exit(0 if float('$L') < 2.0 else 1)"; then
      return 0
    fi
    sleep 10
  done
  echo "# never went quiet; proceeding anyway" >> "$OUT"
}

run_one() {
  local label=$1 deltas=$2
  wait_quiet
  echo "=== $label deltas=$deltas $(date +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg) ===" >> "$OUT"
  (cd "$REPO" && LCS_BENCH_POLITENESS="$BUDGET" LCS_BENCH_CARRY_DELTAS="$deltas" \
    python scripts/diag_ab.py "$SCALE" "$CPUS" base=/tmp/lcs_ab_cd) >> "$OUT" 2>&1
  rm -rf /tmp/lcs_ab_cd
}

: > "$OUT"
run_one delta1 "$K"
run_one replace1 0
run_one replace2 0
run_one delta2 "$K"
echo "=== done $(date +%H:%M:%S) ===" >> "$OUT"
