#!/bin/bash
# Separate-executor-JVM scaling campaign (round-5 c2): interleaved
# 2-core / 8-core local-cluster legs, two passes each, best-of ratio.
# Reuses the 12:50 round-5 jar (ScalingCheck path identical to HEAD —
# the only later commits touch cypher/Queries2, not the scaling path).
set -u
JAR=target/scala-2.13/raphtoryspark_2.13-0.1.0.jar
LOG=bench_logs/scaling_localcluster_r5_c2.log
: > "$LOG"
run_leg() { # $1 = workers (each 2 cores)
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
eff = best[8] / (4 * best[2])
with open(sys.argv[1], "a") as f:
    f.write(f"SCALING best2={best[2]} best8={best[8]} efficiency={eff:.3f}\n")
print(f"best2={best[2]} best8={best[8]} efficiency={eff:.3f}")
EOF
