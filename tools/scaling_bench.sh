#!/usr/bin/env bash
# Orchestrates graft.ScalingBench: one JVM per parallelism level (N and 4N),
# warm-run-per-JVM measurement, efficiency computed across the two lines.
# Results land in BENCH/scaling.json. Usage: tools/scaling_bench.sh [N]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-2}"
N4=$((4 * N))
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"
mkdir -p BENCH
: > BENCH/scaling.json
for cores in "$N" "$N4"; do
  sbt -batch "runMain graft.ScalingBench single $cores" 2>&1 \
    | grep -oE '\{"metric":"kg_scaling_single".*' >> BENCH/scaling.json
  sleep 60  # burst-budget recovery between levels
done
python3 - <<'EOF'
import json
lines = [json.loads(l) for l in open("BENCH/scaling.json")]
a, b = sorted(lines, key=lambda x: x["cores"])
eff = b["docs_per_sec"] / (4.0 * a["docs_per_sec"])
summary = {"metric": "kg_scaling", "n_cores": a["cores"], "secs_n": a["secs"],
           "docs_per_sec_n": a["docs_per_sec"], "n4_cores": b["cores"],
           "secs_4n": b["secs"], "docs_per_sec_4n": b["docs_per_sec"],
           "docs": a["docs"], "triples": a["triples"],
           "scaling_efficiency": eff}
with open("BENCH/scaling.json", "a") as f:
    f.write(json.dumps(summary) + "\n")
print(json.dumps(summary))
EOF
