#!/usr/bin/env bash
# Round-14 measurements (r13 verdict tasks 1 and 3). Protocol: the CANONICAL
# batch protocol declared in SCALING.md "Batch bench protocol" — solo 48g
# JVM, 32 cores, shuffle partitions scaled with data (32 @ sf0.1, 64 @ sf1,
# 320 @ sf10), graft.Bench median-of-5 after one warm-up; every output line
# now carries a "config" tag recording exactly that. Stages:
#   full10  — full-registry graft.Bench at sf10 → BENCH_r14_sf10.json
#             (r13 verdict task 1: the registry's first COMPLETE record at
#             sf10 — before this, only the ~13-query expensive tail and the
#             8 streaming plans had sf1→sf10 evidence). NOTE: the committed
#             artifact records q_dedup_containment's substrate-constructed
#             disk-wall failure verbatim in "errors", so Bench (and this
#             stage) exits nonzero on this box — see SCALING.md "Round 14 —
#             the full registry's SECOND decade" before re-running.
#   stage_fixed — stage the FIXED-KEYS substrates (ScaleData fixedkeys mode:
#             events replicate with user_id UNSHIFTED, so the resample
#             output grid keys×hours is CONSTANT across scales) →
#             target/benchdata/sf1f (10×) and sf10f (100×)
#   resample_fixed — the resample analogue of the r13 salted span study
#             (r13 verdict task 3): alternate q_features_resample between
#             sf1f and sf10f, 3 passes, solo JVM per (query, scale), Bench
#             median-of-5 → BENCH_r14_resample_fixed.jsonl. (The committed
#             r14 artifacts carry 3 interleaved passes; the third was
#             appended out-of-band in commit 5a2ec59 while the stage still
#             said 2 — the loops below now match the artifact of record,
#             ADVICE r14.) If time is
#             ~flat while input grows 10× (output constant by construction),
#             the replica substrate's 10.71×/decade is MEASURED to be
#             output-grid rows, closing the last argued-not-measured trend.
#   triage  — second-look alternation for any NEW >3×/decade non-output-
#             bound query surfaced by full10 vs BENCH_r13_sf1.json (queries
#             listed via TRIAGE_QUERIES env) → BENCH_r14_triage.jsonl
set -euo pipefail
cd "$(dirname "$0")/.."

case "${1:?stage}" in
  full10)
    SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
      scripts/run_main.sh -m48g graft.Bench \
      2> >(grep '^\[bench\]' > /tmp/bench_r14_sf10_progress.log) \
      | grep '^{' > BENCH_r14_sf10.json
    ;;
  stage_fixed)
    SPARK_GRAFT_CPUS=16 scripts/run_main.sh -m24g graft.ScaleData \
      /root/testdata/sf0.1 target/benchdata/sf1f 10 fixedkeys
    SPARK_GRAFT_CPUS=16 scripts/run_main.sh -m24g graft.ScaleData \
      /root/testdata/sf0.1 target/benchdata/sf10f 100 fixedkeys
    ;;
  resample_fixed)
    : > BENCH_r14_resample_fixed.jsonl
    for pass in 1 2 3; do
      for sf in sf1f sf10f; do
        parts=64; [[ $sf == sf10f ]] && parts=320
        SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
          SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts \
          SPARK_GRAFT_ONLY=q_features_resample \
          scripts/run_main.sh -m48g graft.Bench \
          2>/dev/null | grep '^{' >> BENCH_r14_resample_fixed.jsonl
      done
    done
    ;;
  triage)
    # TRIAGE_SUBSTRATES defaults to the replica pair; pass "sf1s sf10s" to
    # re-measure a substrate-adversarial query on the constant-density
    # salted twins (the r13 span-study move)
    : "${TRIAGE_QUERIES:?set TRIAGE_QUERIES=q_a,q_b}"
    subs="${TRIAGE_SUBSTRATES:-sf1 sf10}"
    out="${TRIAGE_OUT:-BENCH_r14_triage.jsonl}"
    : > "$out"
    for pass in 1 2 3; do
      for q in ${TRIAGE_QUERIES//,/ }; do
        for sf in $subs; do
          parts=64; [[ $sf == sf10* ]] && parts=320
          SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
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
