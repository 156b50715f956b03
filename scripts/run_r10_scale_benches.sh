#!/usr/bin/env bash
# Round-10 scale benches. Staging is guarded by a .done MARKER written after
# a staging run completes (ADVICE r9: a bare directory check treated a
# crashed half-staged dir as complete); a dir without the marker is wiped
# and restaged. Benches run sequentially — timings must not contend.
set -euo pipefail
cd "$(dirname "$0")/.."

stage() { # dir factor [mode]
  local dir=$1 factor=$2 mode=${3:-}
  if [ ! -f "$dir/.done" ]; then
    rm -rf "$dir"
    SPARK_GRAFT_CPUS=16 scripts/run_main.sh -m32g graft.ScaleData \
      /root/testdata/sf0.1 "$dir" "$factor" $mode
    touch "$dir/.done"
  fi
}

stage target/benchdata/sf1 10
stage target/benchdata/sf10 100
stage target/benchdata/sf1s 10 salted
stage target/benchdata/sf10s 100 salted

# 1) spill re-measure (r9 verdict task 2): q_olap_heavy / q_text_keywords
#    with shuffle partitions scaled ~ data size (sf1 -> 64, sf10 -> 320),
#    so the decade ratio measures the plan, not the fixed-32-partition spill
SPARK_GRAFT_SF_DIR=target/benchdata/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  SPARK_GRAFT_ONLY=q_olap_heavy,q_text_keywords \
  scripts/run_main.sh -m64g graft.Bench > BENCH_r10_spill_sf1.json
SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
  SPARK_GRAFT_ONLY=q_olap_heavy,q_text_keywords \
  scripts/run_main.sh -m80g graft.Bench > BENCH_r10_spill_sf10.json

# 2) streaming family second decade (r9 verdict task 6): cold end-to-end
#    (staging + stream + snapshot) for the five flatMapGroupsWithState twins
SPARK_GRAFT_SF_DIR=target/benchdata/sf1 SPARK_GRAFT_CPUS=32 \
  scripts/run_main.sh -m64g graft.StreamingBench > BENCH_r10_streaming_sf1.json
SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  scripts/run_main.sh -m80g graft.StreamingBench > BENCH_r10_streaming_sf10.json

# 3) embedding-family salted decade after the index uncap / SemDeDup k-scale
#    (r9 verdict task 1)
SPARK_GRAFT_SF_DIR=target/benchdata/sf1s SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  SPARK_GRAFT_ONLY=q_similarity_knn_bounded,q_pipeline_semdedup \
  scripts/run_main.sh -m64g graft.Bench > BENCH_r10_emb_sf1s.json
SPARK_GRAFT_SF_DIR=target/benchdata/sf10s SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_ONLY=q_similarity_knn_bounded,q_pipeline_semdedup \
  scripts/run_main.sh -m80g graft.Bench > BENCH_r10_emb_sf10s.json

echo ALL_DONE
