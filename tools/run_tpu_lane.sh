#!/bin/bash
# Round TPU workload (run with NOTHING else touching the axon tunnel --
# two concurrent clients deadlock it):
#   1. compiled-TPU lane  -> TPU_LANE_r<N>.txt artifact
#   2. scale-ceiling sweep (tools/scale_ceiling.py)
#   3. bench.py warm-up (populates the persistent compile cache so the
#      driver's budgeted bench run lands inside its timeout)
# Usage: tools/run_tpu_lane.sh [round-number]
set -x
N=${1:-04}
cd "$(dirname "$0")/.."
GPR_TPU_TESTS=1 timeout 5400 python -m pytest tests/test_tpu.py -m tpu -q \
    > /tmp/lane_raw.txt 2>&1
rc=$?
{
  echo "# Compiled-TPU lane, round ${N#0} (GPR_TPU_TESTS=1 pytest tests/test_tpu.py -m tpu -q)"
  python - <<'PY'
import re
txt = open("/tmp/lane_raw.txt").read()
m = re.search(r"\[TPU[^\]]*\]", txt)
print(f"# chip: {m.group(0) if m else 'axon v5e'}")
PY
  date -u +"# date: %Y-%m-%dT%H:%MZ"
  tail -6 /tmp/lane_raw.txt
  echo "rc=$rc"
} > "TPU_LANE_r${N}.txt"
cat "TPU_LANE_r${N}.txt"
sleep 60
timeout 3600 python tools/scale_ceiling.py > /tmp/ceiling.txt 2>&1
grep -E "CEILING" /tmp/ceiling.txt
sleep 60
GPR_BENCH_BUDGET_S=2400 timeout 3000 python bench.py \
    2>/tmp/bench_warm_err.txt > /tmp/bench_warm.json
tail -25 /tmp/bench_warm_err.txt
cat /tmp/bench_warm.json
