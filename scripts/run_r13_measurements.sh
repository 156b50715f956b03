#!/usr/bin/env bash
# Round-13 measurements (r12 verdict tasks 1, 2, 4). Protocol: solo JVM,
# 48g fixed heap, strictly sequential; shuffle partitions scale with data
# (32 @ sf0.1, 64 @ sf1, 320 @ sf10 batch; streaming stays at 64 for
# comparability with the committed r11/r12 jsonl). Stages:
#   full01 — full-registry graft.Bench at sf0.1 → BENCH_r13_sf0.1.json
#            (the decade pair's near side, same-session as full1 so the
#            ratio isn't polluted by cross-round machine drift)
#   full1  — full-registry graft.Bench at sf1 → BENCH_r13_sf1.json
#            (r12 verdict task 1: the whole registry's first record above
#            sf0.1 since the 99-query r8 era)
#   streaming1|streaming10 — the committed solo-interleaved streaming
#            record (r12 verdict task 2; replaces the contaminated
#            shared-JVM BENCH_r12_streaming_sf10.json protocol) →
#            BENCH_r13_streaming_sf{1,10}.jsonl, 3 passes × 8 queries
#   tws2_1|tws2_10 — 3 MORE interleaved cold pairs per scale for the
#            swept tws rate limiter vs the fMGWS primary (r12 verdict
#            task 4: r12 had 3 pairs, 2 storm-hit; target ≥5 total) →
#            BENCH_r13_tws2_sf{1,10}.jsonl
set -euo pipefail
cd "$(dirname "$0")/.."

case "${1:?stage}" in
  full01)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
      scripts/run_main.sh -m48g graft.Bench \
      2>/dev/null | grep '^{' > BENCH_r13_sf0.1.json
    ;;
  full1)
    SPARK_GRAFT_SF_DIR=target/benchdata/sf1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
      scripts/run_main.sh -m48g graft.Bench \
      2>/dev/null | grep '^{' > BENCH_r13_sf1.json
    ;;
  streaming1)
    # the committed record has 3 passes (the third was appended under the
    # identical protocol after the first two); run all 3 so a re-run
    # reproduces the artifact of record
    : > BENCH_r13_streaming_sf1.jsonl
    scripts/run_streaming_solo.sh target/benchdata/sf1 \
      BENCH_r13_streaming_sf1.jsonl 3
    ;;
  streaming10)
    : > BENCH_r13_streaming_sf10.jsonl
    scripts/run_streaming_solo.sh target/benchdata/sf10 \
      BENCH_r13_streaming_sf10.jsonl 3
    ;;
  tws2_1|tws2_10)
    sf=sf1; [[ "$1" == tws2_10 ]] && sf=sf10
    out="BENCH_r13_tws2_${sf}.jsonl"
    : > "$out"
    for pass in 1 2 3; do
      for q in q_streaming_rate_limit_tws q_streaming_rate_limit; do
        SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
          SPARK_GRAFT_SHUFFLE_PARTITIONS=64 SPARK_GRAFT_ONLY=$q \
          scripts/run_main.sh -m48g graft.StreamingBench \
          2>/dev/null | grep '^{' >> "$out"
      done
    done
    ;;
  triage2)
    # second-decade (sf1 -> sf10) alternation for the BENCH_r13 sf0.1->sf1
    # queries that read >3x and are neither output-bound-by-substrate
    # (containment/near/resample: salted evidence + named causes in
    # SCALING.md) nor below the sf0.1 measurement floor. Solo JVM per
    # (query, scale), scales alternated within each pass, Bench median-of-5.
    : > BENCH_r13_triage2.jsonl
    for pass in 1 2; do
      for q in q_events_funnel q_text_perplexity q_sketch_cms \
               q_text_rarity_join q_graph_triangles q_dedup_spans \
               q_dedup_span_coverage q_text_keywords; do
        for sf in sf1 sf10; do
          parts=64; [[ $sf == sf10 ]] && parts=320
          SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
            SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts SPARK_GRAFT_ONLY=$q \
            scripts/run_main.sh -m48g graft.Bench \
            2>/dev/null | grep '^{' >> BENCH_r13_triage2.jsonl
        done
      done
    done
    ;;
  spans_salted)
    # the span family's output-bound reading, measured instead of argued:
    # on the CONSTANT-duplicate-density substrate (salted — replicas share
    # zero shingles, so matched-window group sizes don't grow with N) the
    # span plans must read ~linear decades. Requires target/benchdata/
    # sf{1,10}s staged via `graft.ScaleData ... {10,100} salted`.
    : > BENCH_r13_spans_salted.jsonl
    for pass in 1 2; do
      for q in q_dedup_spans q_dedup_span_coverage; do
        for sf in sf1s sf10s; do
          parts=64; [[ $sf == sf10s ]] && parts=320
          SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
            SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts SPARK_GRAFT_ONLY=$q \
            scripts/run_main.sh -m48g graft.Bench \
            2>/dev/null | grep '^{' >> BENCH_r13_spans_salted.jsonl
        done
      done
    done
    ;;
  triage3)
    # second-decade coverage for the REST of the expensive sf1 tail (the
    # top-12 sf1 queries not already covered by triage2 or salted
    # evidence): the iterative graph plans, the output-grid resample, the
    # PQ serving scan, and the KMV pair sketch. Same protocol as triage2.
    : > BENCH_r13_triage3.jsonl
    for pass in 1 2; do
      for q in q_graph_pagerank q_graph_components q_features_resample \
               q_similarity_pq q_sketch_kmv_jaccard; do
        for sf in sf1 sf10; do
          parts=64; [[ $sf == sf10 ]] && parts=320
          SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
            SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts SPARK_GRAFT_ONLY=$q \
            scripts/run_main.sh -m48g graft.Bench \
            2>/dev/null | grep '^{' >> BENCH_r13_triage3.jsonl
        done
      done
    done
    ;;
  *) echo "unknown stage $1" >&2; exit 2 ;;
esac
echo "STAGE_DONE $1"
