#!/bin/bash
# Record the full TPU bench suite as a committed artifact (BENCH.md).
# Run with an otherwise-idle host (the axon relay is CPU-sensitive):
#   bash tools/record_bench.sh
#
# Every section gets its own timeout and an EXPLICIT outcome line — a
# failed or timed-out section can never silently produce an empty block
# or eat a later section's budget (round-4 verdict: the boot16 block was
# committed empty and the STD192 sweep died inside an earlier section).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
export PALLAS_AXON_REMOTE_COMPILE=1
OUT=BENCH.md

section() {           # section <title> <timeout_s> <cmd...>
  local title="$1" tmo="$2"
  shift 2
  {
    echo
    echo "## $title"
    echo '```'
  } >> "$OUT"
  local t0=$SECONDS
  timeout "$tmo" "$@" 2> >(grep -v 'xla_bridge' >&2) \
    | grep -v 'xla_bridge' | tee -a "$OUT"
  local rc=${PIPESTATUS[0]}
  local dt=$((SECONDS - t0))
  {
    if [ "$rc" -eq 124 ]; then
      echo "# SECTION TIMED OUT after ${tmo}s"
    elif [ "$rc" -ne 0 ]; then
      echo "# SECTION FAILED rc=$rc after ${dt}s"
    else
      echo "# section ok (${dt}s)"
    fi
    echo '```'
  } >> "$OUT"
}

{
  echo "# BENCH — recorded TPU results (v5e-1, $(date -u +%F))"
  echo
  echo "Produced by \`bash tools/record_bench.sh\` (bench.py all + boot16 +"
  echo "tools/check_binfhe_std.py), one job at a time on an idle host."
  echo "Every section ends with an explicit ok/FAILED/TIMED-OUT marker."
} > "$OUT"

# Order: highest-evidence-value first, so a cut-short run still records
# the items the audit cares most about (post-fix LMKCDEY sweep, the
# production-scale bootstrap), with bench.py all last.
section "binfhe production paramsets (tools/check_binfhe_std.py)" 7500 \
  python tools/check_binfhe_std.py
section "bench.py boot16 (production-scale bootstrap, N=2^16)" 5400 \
  python bench.py boot16
section "bench.py all"                                    5400 \
  python bench.py all
echo "recorded to $OUT"
