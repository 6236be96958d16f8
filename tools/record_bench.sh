#!/bin/bash
# Record the full TPU bench suite as a committed artifact (BENCH.md).
# Run with an otherwise-idle host (the axon relay is CPU-sensitive):
#   bash tools/record_bench.sh
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"
OUT=BENCH.md
{
  echo "# BENCH — recorded TPU results (v5e-1, $(date -u +%F))"
  echo
  echo "Produced by \`bash tools/record_bench.sh\` (bench.py all + boot16 +"
  echo "tools/check_binfhe_std.py), one job at a time on an idle host."
  echo
  echo '## bench.py all'
  echo '```'
} > "$OUT"
timeout 5400 python bench.py all 2>&1 | grep -v 'xla_bridge' | tee -a "$OUT"
{
  echo '```'
  echo
  echo '## bench.py boot16 (production-scale bootstrap, N=2^16)'
  echo '```'
} >> "$OUT"
timeout 5400 python bench.py boot16 2>&1 | grep -v 'xla_bridge' | tee -a "$OUT"
{
  echo '```'
  echo
  echo '## binfhe production paramsets (tools/check_binfhe_std.py)'
  echo '```'
} >> "$OUT"
timeout 5400 python tools/check_binfhe_std.py 2>&1 | grep -v 'xla_bridge' | tee -a "$OUT"
echo '```' >> "$OUT"
echo "recorded to $OUT"
