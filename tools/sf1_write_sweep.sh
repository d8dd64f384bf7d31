#!/usr/bin/env bash
# sf1 write-path mini-sweep (the per-round gate distilled from the round-13
# full sf1 oracle sweep): the five write-path oracles that caught the q38
# planned-write spill-order corruption, re-run at 10x the bench scale in
# ~3 min. Catches spill-scale write regressions (sorter spills, global
# index staging, streaming-commit paths) that sf0.01 correctness cannot.
#
# Usage: tools/sf1_write_sweep.sh [sf1Dir] [outDir]
# Record the result in BASELINE.md each round.
set -euo pipefail
SF=${1:-/tmp/sf1}
OUT=${2:-/tmp/sf1-mini-verify}
cd "$(dirname "$0")/.."
if [ ! -d "$SF" ]; then
  echo "[sweep] generating $SF (10x key-shifted scale-up of sf0.1)"
  python3 tools/make_scaled_sf.py /root/testdata/sf0.1 "$SF" 10
fi
# q135-q138: the distributed-prefix-sum packing/budget/shuffle shapes —
# exactly the partitioning-sensitive ops the sweep exists to catch
QUERIES="q38_cross_partition q100_cross_partition_lookup_changelog \
q101_cross_partition_point_lookup q10_pk_upsert q120_stream_dedup_ingest \
q135_seq_packing q136_det_shuffle q137_token_budget_sample \
q138_packed_sequences"
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $SF $OUT $QUERIES"
python3 tools/check_oracle.py "$SF" "$OUT"
