#!/usr/bin/env bash
# Scaling-efficiency evidence run (BASELINE.md protocol):
# same input + same code at local[8] (N) and local[32] (4N); report
# throughput at both and efficiency = (T_4N / T_N) / 4.
set -euo pipefail
cd "$(dirname "$0")/.."

EVENTS=${BENCH_EVENTS:-1000000}
EPOCHS=${BENCH_EPOCHS:-4}

for CORES in 8 32; do
  SPARK_GRAFT_CPUS=$CORES BENCH_EVENTS=$EVENTS BENCH_EPOCHS=$EPOCHS \
  BENCH_SKIP_CDC=0 python bench.py > "BENCH/bench_${CORES}.json" 2>/dev/null
  echo "cores=$CORES -> $(cat BENCH/bench_${CORES}.json)"
done

python - <<'EOF'
import json
b8 = json.load(open("BENCH/bench_8.json"))
b32 = json.load(open("BENCH/bench_32.json"))
t8, t32 = b8["cdc_events_per_sec"], b32["cdc_events_per_sec"]
eff = (t32 / t8) / 4
print(json.dumps({"throughput_8": t8, "throughput_32": t32,
                  "scaling_efficiency": round(eff, 3)}))
EOF
