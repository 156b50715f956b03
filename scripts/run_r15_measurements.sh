#!/usr/bin/env bash
# Round-15 measurements (r14 verdict tasks 2, 3 and the guarded-containment
# registration evidence). Protocol: the CANONICAL batch protocol declared in
# SCALING.md "Batch bench protocol" — solo 48g JVM, 32 cores, shuffle
# partitions scaled with data (32 @ sf0.1, 64 @ sf1, 320 @ sf10),
# graft.Bench warm-up + median-of-5, config tag on every line. Stages:
#   full01  — full-registry sf0.1 anchor → BENCH_r15_sf0.1.json (182
#             queries incl. the new q_dedup_containment_guarded; also the
#             r14 watch-item re-read of the two funnels).
#   full10  — full registry at sf10 → BENCH_r15_sf10.json with
#             SPARK_GRAFT_SKIP=q_dedup_containment: the unguarded
#             containment's disk-wall failure on THIS substrate is
#             documented + measured (r14); its registered scale evidence
#             stays the salted decades, and the scale-safe surface
#             (q_dedup_containment_guarded) runs INSIDE this record. The
#             skip is recorded in the artifact's config tag. Target:
#             errors:{} — the errors-empty record of record (r14 verdict
#             task 2).
#   guarded_decade — solo ContainmentWallBench at sf1 and sf10, 3
#             interleaved passes per scale (min = estimator) →
#             BENCH_r15_containment_guarded.jsonl: the registered guarded
#             pipeline's own decade on the wall's substrate, re-measured
#             after the r14-ADVICE timing fix (single materialization —
#             the r14 4.6 s phase B contained a duplicate execution).
#   triage  — solo alternation for regression suspects (TRIAGE_QUERIES,
#             default the r14 funnel watch pair) at sf0.1 → by default
#             BENCH_r15_triage.jsonl; set TRIAGE_OUT/TRIAGE_SUBSTRATES to
#             redirect (substrate dirs are taken literally — pass
#             /root/testdata/sf0.1 for the anchor substrate).
set -euo pipefail
cd "$(dirname "$0")/.."

case "${1:?stage}" in
  full01)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
      scripts/run_main.sh -m48g graft.Bench \
      2> >(grep '^\[bench\]' > /tmp/bench_r15_sf01_progress.log) \
      | grep '^{' > BENCH_r15_sf0.1.json
    ;;
  full10)
    SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
      SPARK_GRAFT_SKIP=q_dedup_containment \
      scripts/run_main.sh -m48g graft.Bench \
      2> >(grep '^\[bench\]' > /tmp/bench_r15_sf10_progress.log) \
      | grep '^{' > BENCH_r15_sf10.json
    ;;
  guarded_decade)
    : > BENCH_r15_containment_guarded.jsonl
    for pass in 1 2 3; do
      for sf in sf1 sf10; do
        parts=64; [[ $sf == sf10 ]] && parts=320
        SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
          SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts \
          scripts/run_main.sh -m48g graft.ContainmentWallBench \
          2>/dev/null | grep '^{' >> BENCH_r15_containment_guarded.jsonl
      done
    done
    ;;
  triage)
    qs="${TRIAGE_QUERIES:-q_streaming_funnel,q_events_funnel}"
    subs="${TRIAGE_SUBSTRATES:-/root/testdata/sf0.1}"
    out="${TRIAGE_OUT:-BENCH_r15_triage.jsonl}"
    : > "$out"
    for pass in 1 2 3; do
      for q in ${qs//,/ }; do
        for sf in $subs; do
          parts=32; [[ $sf == *sf10* ]] && parts=320; [[ $sf == *sf1 ]] && parts=64
          SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 \
            SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts SPARK_GRAFT_ONLY=$q \
            scripts/run_main.sh -m48g graft.Bench \
            2>/dev/null | grep '^{' >> "$out"
        done
      done
    done
    ;;
  *) echo "unknown stage $1" >&2; exit 2 ;;
esac
echo "STAGE_DONE $1"
