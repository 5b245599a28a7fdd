#!/usr/bin/env bash
# Orchestrates graft.ScalingBench: one JVM per parallelism level (N and 4N),
# each sweeping >=3 corpus sizes with warm min-of-2 measurements. The fixed
# per-job constant F is regressed out with a least-squares fit
# secs = F + day_docs/R per level; the reported scaling efficiency compares
# the DATA-PARALLEL marginal rates R across levels (north rule: N vs 4N
# executors, evidenced via parallelism levels on one host).
# Results land in BENCH/scaling.json. Usage: tools/scaling_bench.sh [N]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-2}"
N4=$((4 * N))
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"
mkdir -p BENCH
: > BENCH/scaling_sweeps.jsonl
# taskset pins the WHOLE JVM (worker threads, GC, JIT) to `cores` cpus —
# local[N] alone still enjoys full-host GC/memory bandwidth, which distorts
# the small level; pinning also keeps host load at cores/32 so the
# burstable-CPU throttle never engages.
for cores in "$N" "$N4"; do
  last=$((cores - 1))
  taskset -c "0-$last" sbt -batch "runMain graft.ScalingBench sweep $cores" 2>&1 \
    | grep -oE '\{"metric":"kg_scaling_sweep".*' >> BENCH/scaling_sweeps.jsonl
  sleep 30
done
python3 - <<'EOF'
import json
sweeps = {s["cores"]: s for s in
          (json.loads(l) for l in open("BENCH/scaling_sweeps.jsonl"))}
def fit(points):
    # least squares secs = F + day_docs / R
    xs = [p["day_docs"] for p in points]
    ys = [p["secs"] for p in points]
    n = len(xs)
    mx, my = sum(xs)/n, sum(ys)/n
    slope = sum((x-mx)*(y-my) for x, y in zip(xs, ys)) / sum((x-mx)**2 for x in xs)
    f = my - slope*mx
    resid = [y - (f + slope*x) for x, y in zip(xs, ys)]
    return {"rate_day_docs_per_sec": 1.0/slope, "fixed_overhead_sec": f,
            "residuals_sec": [round(r, 3) for r in resid], "points": points}
(nc, n4c) = sorted(sweeps)
fn, f4 = fit(sweeps[nc]["points"]), fit(sweeps[n4c]["points"])
eff = f4["rate_day_docs_per_sec"] / (4.0 * fn["rate_day_docs_per_sec"])
summary = {"metric": "kg_scaling", "n_cores": nc, "n4_cores": n4c,
           "fit_n": fn, "fit_4n": f4,
           "data_parallel_scaling_efficiency": round(eff, 3),
           "wallclock_largest_n_sec": sweeps[nc]["points"][-1]["secs"],
           "wallclock_largest_4n_sec": sweeps[n4c]["points"][-1]["secs"],
           "triples_largest": sweeps[nc]["points"][-1]["triples"],
           "note": "secs = F + day_docs/R per level; efficiency = R(4N)/(4*R(N)). "
                   "F (driver/planning/JIT constant) is regressed out; raw wall "
                   "ratios at small corpora mostly measure F."}
with open("BENCH/scaling.json", "w") as f:
    f.write(json.dumps(summary) + "\n")
print(json.dumps(summary))
EOF
