#!/usr/bin/env bash
# Cluster-boundary certification: the full oracle gate under
# local-cluster mode — SEPARATE executor JVMs, so every path a real
# multi-executor deployment exercises and single-JVM local[N] hides
# runs for real: task/closure serialization of the custom Catalyst
# expressions and TypedImperativeAggregates, broadcast-exchange
# ship-and-deserialize, shuffle block fetch over the block-transfer
# service, executor-side media decode (ImageIO/WAV batches), and
# localCheckpoint blocks living on executors instead of the driver.
# A pass certifies no gate query depends on driver-JVM shared state.
#
# Usage: tools/cluster_gate.sh [sfDir] [workers] [coresPerWorker] [memMB]
# Defaults: /root/testdata/sf0.01, 4 workers x 8 cores x 8192 MB.
# Exit: check.py's (0 = all queries pass the DuckDB oracle).
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
WORKERS="${2:-4}"
CORES="${3:-8}"
MEM_MB="${4:-8192}"
OUT="${CLUSTER_GATE_OUT:-/tmp/vout_cluster}"
JAR=$(ls -t target/scala-2.13/modevetlspark_2.13-*.jar 2>/dev/null | head -1 || true)
if [ -z "$JAR" ] || [ -n "$(find src/main -newer "$JAR" -name '*.scala' -print -quit)" ]; then
  echo "[cluster_gate] packaging (jar stale or missing)" >&2
  sbt -batch package >&2
  JAR=$(ls -t target/scala-2.13/modevetlspark_2.13-*.jar | head -1)
fi
MASTER="local-cluster[$WORKERS,$CORES,$MEM_MB]"
echo "[cluster_gate] verify on $MASTER ($SF_DIR -> $OUT)" >&2
rm -rf "$OUT"
LOG=$(mktemp /tmp/cluster_gate.XXXX.log)
SPARK_HOME=/opt/spark SPARK_GRAFT_MASTER="$MASTER" SPARK_GRAFT_CPUS=32 \
  /opt/spark/bin/spark-submit --master "$MASTER" --driver-memory 8g \
  --class graft.Verify "$JAR" "$SF_DIR" "$OUT" >"$LOG" 2>&1 \
  || { echo "[cluster_gate] spark-submit FAILED; tail of $LOG:" >&2; tail -30 "$LOG" >&2; exit 1; }
# Verify catches per-query throws and logs them — surface any here
grep -F '[verify]' "$LOG" >&2 || true
python3 tools/check.py "$OUT"
