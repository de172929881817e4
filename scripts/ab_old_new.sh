#!/bin/bash
# ABBA order-balanced old-vs-new engine comparison (CLAUDE.md protocol:
# any effect expected <50% needs order balancing). Usage:
#   scripts/ab_old_new.sh SCALE CPUS OLD_DIR OUT_FILE
# Runs NEW, OLD, OLD, NEW (each diag_ab does its own scale-1 warmup),
# waiting for loadavg < 2 before each run.
set -u
SCALE=$1; CPUS=$2; OLD_DIR=$3; OUT=$4
NEW_DIR=$(cd "$(dirname "$0")/.." && pwd)

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
  local label=$1 dir=$2
  wait_quiet
  echo "=== $label $(date +%H:%M:%S) loadavg=$(cut -d' ' -f1 /proc/loadavg) ===" >> "$OUT"
  (cd "$dir" && python scripts/diag_ab.py "$SCALE" "$CPUS" base=/tmp/lcs_ab_$label) >> "$OUT" 2>&1
  rm -rf "/tmp/lcs_ab_$label"
}

: > "$OUT"
run_one new1 "$NEW_DIR"
run_one old1 "$OLD_DIR"
run_one old2 "$OLD_DIR"
run_one new2 "$NEW_DIR"
echo "=== done $(date +%H:%M:%S) ===" >> "$OUT"
