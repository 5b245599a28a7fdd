#!/usr/bin/env bash
# The N-vs-4N executor criterion with REAL separate JVMs: one taskset-pinned
# 2-core JVM vs FOUR concurrent 2-core JVMs over disjoint year shards (the
# reference's natural month/year sharding). Separate heaps/GC/code caches
# reproduce what adding executors adds; a per-size file barrier aligns the
# fleet's measured runs so host memory-bandwidth contention is included.
#
# Each level measures TWO corpus sizes in the same warm JVM(s); the
# efficiency compares MARGINAL day-doc rates, which cancels the per-run
# fixed constant F (driver planning/codegen/job-barrier latency — a
# per-job cost, not a per-byte cost, at any cluster size):
#   R(level) = d(day_docs_total) / d(wall)      [fleet: 4x docs per wall]
#   efficiency = R(4 JVMs) / (4 * R(1 JVM))
#
# JVMs are launched directly (java -cp), not via sbt — sbt serializes
# concurrent runs on the project lock. Run `sbt -batch compile` first.
# Usage: tools/multi_jvm_scaling.sh [cores_per_jvm]
set -euo pipefail
cd "$(dirname "$0")/.."
C="${1:-2}"
export SPARK_GRAFT_BENCH_ARTICLES="${SPARK_GRAFT_BENCH_ARTICLES:-2000}"
export SPARK_GRAFT_SHARD_YEARS="${SPARK_GRAFT_SHARD_YEARS:-2,8}"
OPTS=(
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED
  -Xmx8g -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC
  -cp "target/scala-2.13/classes:/opt/spark/jars/*"
)
run_shard() { # cpulist year maxyears [barrier parties]
  local cpus="$1"; shift
  taskset -c "$cpus" java "${OPTS[@]}" graft.ScalingBench shard "$@" 2>/dev/null \
    | grep -oE '\{"metric":"kg_scaling_shard".*'
}
mkdir -p BENCH
OUT=BENCH/multi_jvm_scaling.json
LAST=$((C - 1))
echo "== single JVM ($C cores): sizes $SPARK_GRAFT_SHARD_YEARS years" >&2
SINGLE=$(run_shard "0-$LAST" 2017 8 "$C")
echo "$SINGLE" >&2
sleep 20
echo "== 4 concurrent JVMs ($C cores each): disjoint year shards" >&2
BAR=$(mktemp -d)
PIDS=(); TMPS=()
for k in 0 1 2 3; do
  a=$((k * C)); b=$((a + C - 1))
  t=$(mktemp); TMPS+=("$t")
  run_shard "$a-$b" $((2017 + 8 * k)) 8 "$C" "$BAR" 4 > "$t" &
  PIDS+=($!)
done
for pid in "${PIDS[@]}"; do wait "$pid"; done
QUAD=$(cat "${TMPS[@]}")
echo "$QUAD" >&2
python3 - "$OUT" <<EOF
import json, sys
single = json.loads('''$SINGLE''')
quads = [json.loads(l) for l in '''$QUAD'''.splitlines() if l.strip()]
sp = sorted(single["points"], key=lambda p: p["day_docs"])
r1 = (sp[-1]["day_docs"] - sp[0]["day_docs"]) / (sp[-1]["secs"] - sp[0]["secs"])
# fleet wall per size = slowest shard at that size (barrier-aligned)
sizes = sorted({p["day_docs"] for q in quads for p in q["points"]})
fleet = [(4 * d, max(p["secs"] for q in quads for p in q["points"]
                     if p["day_docs"] == d)) for d in sizes]
r4 = (fleet[-1][0] - fleet[0][0]) / (fleet[-1][1] - fleet[0][1])
eff = r4 / (4.0 * r1)
out = {"metric": "kg_scaling_multi_jvm", "cores_per_jvm": single["cores"],
       "single": single, "shards": quads,
       "marginal_rate_1jvm_day_docs_per_sec": round(r1, 2),
       "marginal_rate_4jvm_day_docs_per_sec": round(r4, 2),
       "executor_scaling_efficiency": round(eff, 3),
       "note": "marginal day-doc rates between two sizes per level; F "
               "(per-run driver constant) cancels; fleet points are "
               "barrier-aligned so memory-bandwidth contention is included; "
               "each shard JVM also re-enriches its own article dictionary, "
               "so the measured efficiency is conservative."}
with open(sys.argv[1], "w") as f: f.write(json.dumps(out) + "\n")
print(json.dumps(out))
EOF
