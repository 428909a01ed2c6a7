#!/usr/bin/env bash
# Real-cluster submission for the flagship job (north rule: spark-submit
# --py-files on a multi-executor cluster at N and 4N executors).
#
# In this sandbox there is no multi-node cluster, so the default target is a
# local[] master and the N→4N scaling evidence comes from
# tools/scaling_bench.py (two parallelism levels, same input, separate JVMs).
# On a real cluster, point MASTER at the cluster manager and the SAME
# artifact + invocation works unchanged — that is the point of this script.
#
# Usage:
#   tools/cluster_submit.sh                               # local[8] smoke
#   LOCAL_CLUSTER=1 tools/cluster_submit.sh               # 2 real executor
#       # processes (local-cluster[2,2,1024]): exercises broadcast/closure
#       # serialization and per-executor Python workers across process
#       # boundaries without real nodes — the multi-executor smoke drill
#   MASTER=spark://host:7077 EXECUTORS=8 tools/cluster_submit.sh
#   MASTER=yarn EXECUTORS=32 OUT=hdfs:///cubes/flagship tools/cluster_submit.sh
#
# Two-cluster-size scaling drill (run both, compare wall-clock from the JSON):
#   MASTER=spark://host:7077 EXECUTORS=4  OUT=s3a://bkt/run_n  tools/cluster_submit.sh
#   MASTER=spark://host:7077 EXECUTORS=16 OUT=s3a://bkt/run_4n tools/cluster_submit.sh
#
# Resume-after-loss drill (exactly-once via the chunk checkpoint):
#   kill executors / the app mid-run, then re-run with RESUME=1 — only
#   missing chunk_ids are recomputed (left-anti join on the committed set).
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
if [ -n "${LOCAL_CLUSTER:-}" ]; then
    MASTER="${MASTER:-local-cluster[2,2,1024]}"
fi
MASTER="${MASTER:-local[8]}"
EXECUTORS="${EXECUTORS:-}"          # empty → master default / local threads
N_IMAGES="${N_IMAGES:-512}"
OUT="${OUT:-/tmp/flagship_ckpt}"
RESUME="${RESUME:-}"
SPARK_SUBMIT="${SPARK_SUBMIT:-/opt/spark/bin/spark-submit}"

ARCHIVE="$(mktemp -d)/gdalcubes_spark.zip"
(cd "$REPO" && zip -qr "$ARCHIVE" gdalcubes_spark)

ARGS=(--master "$MASTER" --conf spark.sql.adaptive.enabled=true
      --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}"
      --py-files "$ARCHIVE")
[ -n "$EXECUTORS" ] && ARGS+=(--num-executors "$EXECUTORS")

exec "$SPARK_SUBMIT" "${ARGS[@]}" "$REPO/tools/submit_flagship.py" \
     --n-images "$N_IMAGES" --out "$OUT" ${RESUME:+--resume}
