#!/bin/bash
# Separate-executor-JVM scaling campaign (round-5 c2) — AS RUN (21:01,
# HEAD jar). POST-HOC NOTE: `ScalingCheck.main` runs a FULL interleaved
# SCALE_N -> SCALE_4N campaign per invocation (defaults 4 -> 16 cores),
# and `SparkSession.builder().master(...)` inside `session()` overrides
# spark-submit's --master — so each invocation below was one complete
# independent 4-core(2 executors) vs 16-core(8 executors) campaign and
# the run_leg worker argument was moot. The four resulting campaigns
# (effs 0.712 / 0.637 / 0.534 / 0.654, cross-best 0.649) are recorded in
# the log and BASELINE.md as the 4->16 separate-JVM evidence. To rerun
# the 2->8 form instead, export SCALE_N=2 (as r5 c1 did).
set -u
JAR=target/scala-2.13/raphtoryspark_2.13-0.1.0.jar
LOG=bench_logs/scaling_localcluster_r5_c2.log
: > "$LOG"
run_leg() {
  SPARK_HOME=/opt/spark SCALE_CLUSTER=1 SCALE_NODES=2000000 SCALE_ROUNDS=2 \
  /opt/spark/bin/spark-submit --master "local-cluster[$1,2,3072]" \
    --driver-memory 8g --class graft.tools.ScalingCheck \
    --conf spark.local.dir=/dev/shm/graft-spark "$JAR" 2>&1 | grep -a "^SCALING" >> "$LOG"
}
for pass in 1 2; do
  run_leg 1
  run_leg 4
done
python3 - "$LOG" <<'EOF'
import re, sys
best = {}
for line in open(sys.argv[1]):
    m = re.match(r"SCALING cores=(\d+) round=\d+ steps=[\d.]+ rate=(\d+)", line)
    if m:
        c, r = int(m.group(1)), int(m.group(2))
        best[c] = max(best.get(c, 0), r)
assert len(best) >= 2, f"need two core counts in the log, got {sorted(best)} — campaign incomplete"
lo, hi = min(best), max(best)
eff = best[hi] / ((hi / lo) * best[lo])
with open(sys.argv[1], "a") as f:
    f.write(f"SCALING best{lo}={best[lo]} best{hi}={best[hi]} efficiency={eff:.3f}\n")
print(f"best{lo}={best[lo]} best{hi}={best[hi]} efficiency={eff:.3f}")
EOF
