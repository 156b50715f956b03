#!/usr/bin/env bash
# Round-12 measurements (r11 verdict tasks 4, 5, 6). Protocol: solo JVM,
# 48g fixed heap, strictly sequential, ALTERNATING A/B sides within one
# stage (SCALING.md r11: block-ordered pairs measure machine drift).
# Stages are independently invocable: run_r12_measurements.sh <stage>
#   route1|route10 — RouteBench: two-level vs forced-flat centroid
#                    assignment at production-shaped k (1024 @ sf1,
#                    2048 ≈ N/250 @ sf10), alternating cost samples +
#                    agreement line → BENCH_r12_route_k.jsonl (both stages
#                    APPEND to the shared file; to regenerate from scratch
#                    `rm BENCH_r12_route_k.jsonl` first, then route1 route10)
#   tws2_1|tws2_10 — the epoch-swept tws rate limiter vs the fMGWS
#                    primary, 3 interleaved cold pairs per scale — the
#                    re-plan's ≤~2×/decade registration gate →
#                    BENCH_r12_tws2_sf{1,10}.jsonl
#   bpe            — the BPE training decade (r11 read 3.9 → 76.2 s from
#                    single shots): 3 alternating sf1/sf10 pairs of the
#                    registered first-touch (ArtifactBench, fresh store
#                    each sample) → BENCH_r12_bpe_alt.jsonl, plus
#                    alternating train-only probes (BpeProbe, numMerges=24
#                    = the registered depth) → BENCH_r12_bpe_probe.txt
#   triage         — the r10→r11 full-bench uptick cluster, solo
#                    median-of-5 per JVM, 3 alternating passes at sf0.1
#                    → BENCH_r12_triage_sf0.1.jsonl
set -euo pipefail
cd "$(dirname "$0")/.."

case "${1:?stage}" in
  route1)
    SPARK_GRAFT_SF_DIR=target/benchdata/sf1 SPARK_GRAFT_ROUTE_K=1024 \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
      scripts/run_main.sh -m48g graft.RouteBench \
      2>/dev/null | grep '^{' >> BENCH_r12_route_k.jsonl
    ;;
  route10)
    SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_ROUTE_K=2048 \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
      scripts/run_main.sh -m48g graft.RouteBench \
      2>/dev/null | grep '^{' >> BENCH_r12_route_k.jsonl
    ;;
  bpe)
    : > BENCH_r12_bpe_alt.jsonl
    : > BENCH_r12_bpe_probe.txt
    for pair in 1 2 3; do
      for sf in sf1 sf10; do
        parts=64; [[ $sf == sf10 ]] && parts=320
        rm -rf "target/artifacts_r12bpe/$sf"
        SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
          SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts \
          SPARK_GRAFT_ARTIFACTS=target/artifacts_r12bpe/$sf \
          SPARK_GRAFT_ONLY=q_text_bpe_encode \
          scripts/run_main.sh -m48g graft.ArtifactBench \
          2>/dev/null | tail -1 >> BENCH_r12_bpe_alt.jsonl
      done
    done
    for pair in 1 2; do
      for sf in sf1 sf10; do
        SPARK_GRAFT_CPUS=32 scripts/run_main.sh -m48g graft.BpeProbe \
          target/benchdata/$sf 24 2>/dev/null \
          | grep BPE_PROBE >> BENCH_r12_bpe_probe.txt
      done
    done
    ;;
  tws2_1|tws2_10)
    # the epoch-swept tws rate limiter (RateLimitSweepProcessor) vs the
    # fMGWS primary, cold and alternating — the re-plan's decade gate
    sf=sf1; [[ "$1" == tws2_10 ]] && sf=sf10
    out="BENCH_r12_tws2_${sf}.jsonl"
    : > "$out"
    for pass in 1 2 3; do
      for q in q_streaming_rate_limit_tws q_streaming_rate_limit; do
        SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
          SPARK_GRAFT_SHUFFLE_PARTITIONS=64 SPARK_GRAFT_ONLY=$q \
          scripts/run_main.sh -m48g graft.StreamingBench \
          2>/dev/null | tail -1 >> "$out"
      done
    done
    ;;
  triage)
    # the committed artifact holds 3 passes over the six uptick suspects
    # followed by 3 q_similarity_pq samples (the one multi-second
    # full-bench delta, triaged in a follow-up block); this stage
    # reproduces the same 21 lines in one run
    : > BENCH_r12_triage_sf0.1.jsonl
    for pass in 1 2 3; do
      for q in q_similarity_knn_bounded q_sketch_window_users \
               q_window_hopping q_events_trending q_text_quality \
               q_dedup_spans_incremental; do
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
          SPARK_GRAFT_ONLY="$q" scripts/run_main.sh -m48g graft.Bench \
          2>/dev/null | tail -1 >> BENCH_r12_triage_sf0.1.jsonl
      done
    done
    for pass in 1 2 3; do
      for q in q_similarity_pq; do
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
          SPARK_GRAFT_ONLY="$q" scripts/run_main.sh -m48g graft.Bench \
          2>/dev/null | tail -1 >> BENCH_r12_triage_sf0.1.jsonl
      done
    done
    ;;
  *) echo "unknown stage $1" >&2; exit 2 ;;
esac
echo "STAGE_DONE $1"
