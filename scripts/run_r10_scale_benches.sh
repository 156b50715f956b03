#!/usr/bin/env bash
# Round-10 scale benches. Staging is guarded by a .done MARKER written after
# a staging run completes (ADVICE r9: a bare directory check treated a
# crashed half-staged dir as complete); a dir without the marker is wiped
# and restaged.
#
# Measurement protocol (SCALING.md "Round 10"): ONE query per JVM (two
# queries sharing a bench JVM polluted each other at sf1+), 48g heaps (an
# 80g heap on this 125 GB box balloons during multi-pass sf10 runs and
# evicts the page cache), shuffle partitions scaled with data, runs strictly
# sequential.
set -euo pipefail
cd "$(dirname "$0")/.."

stage() { # dir factor [mode]
  local dir=$1 factor=$2 mode=${3:-}
  if [ ! -f "$dir/.done" ]; then
    rm -rf "$dir"
    # restaging changes the corpus CONTENT behind an unchanged path, and
    # ArtifactStore keys artifacts by that path — invalidate the matching
    # artifact subtree or stale centroids/codebooks/BPE models trained on
    # the old bytes would silently serve the new corpus (ADVICE r10)
    rm -rf "target/artifacts/$(printf '%s' "$dir" | md5sum | cut -d' ' -f1)"
    SPARK_GRAFT_CPUS=16 scripts/run_main.sh -m32g graft.ScaleData \
      /root/testdata/sf0.1 "$dir" "$factor" $mode
    touch "$dir/.done"
  fi
}

stage target/benchdata/sf1 10
stage target/benchdata/sf10 100
stage target/benchdata/sf1s 10 salted
stage target/benchdata/sf10s 100 salted

solo() { # sfdir partitions query outfile
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=$2 \
    SPARK_GRAFT_ONLY=$3 scripts/run_main.sh -m48g graft.Bench \
    2>/dev/null | tail -1 >> "$4"
}

# 1) spill re-measure (r9 verdict task 2): shuffle partitions ~ data size
: > BENCH_r10_spill_sf1.jsonl
solo target/benchdata/sf1 64 q_olap_heavy BENCH_r10_spill_sf1.jsonl
solo target/benchdata/sf1 64 q_text_keywords BENCH_r10_spill_sf1.jsonl
: > BENCH_r10_spill_sf10.jsonl
solo target/benchdata/sf10 320 q_olap_heavy BENCH_r10_spill_sf10.jsonl
solo target/benchdata/sf10 320 q_text_keywords BENCH_r10_spill_sf10.jsonl

# 2) streaming family second decade (r9 verdict task 6): cold end-to-end
#    (staging + stream + snapshot) for the five flatMapGroupsWithState twins
SPARK_GRAFT_SF_DIR=target/benchdata/sf1 SPARK_GRAFT_CPUS=32 \
  scripts/run_main.sh -m48g graft.StreamingBench > BENCH_r10_streaming_sf1.json
SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
  scripts/run_main.sh -m48g graft.StreamingBench > BENCH_r10_streaming_sf10.json

# 3) embedding-family salted decade after the index uncap / SemDeDup k-scale
#    / two-level assignment (r9 verdict task 1)
: > BENCH_r10_emb_sf1s.jsonl
solo target/benchdata/sf1s 64 q_pipeline_semdedup BENCH_r10_emb_sf1s.jsonl
solo target/benchdata/sf1s 64 q_similarity_knn_bounded BENCH_r10_emb_sf1s.jsonl
: > BENCH_r10_emb_sf10s.jsonl
solo target/benchdata/sf10s 256 q_pipeline_semdedup BENCH_r10_emb_sf10s.jsonl
solo target/benchdata/sf10s 256 q_similarity_knn_bounded BENCH_r10_emb_sf10s.jsonl

echo ALL_DONE
