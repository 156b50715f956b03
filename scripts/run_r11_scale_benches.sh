#!/usr/bin/env bash
# Round-11 scale benches (r10 verdict tasks 4, 5d, 7). Protocol: solo JVM,
# 48g fixed heap, shuffle partitions scaled with data, strictly sequential.
# Each stage is independently invocable so no single run exceeds the
# harness's background window: run_r11_scale_benches.sh <stage>
#   streaming1|streaming10 — cold StreamingBench re-record post rate-limit
#                            TTL fix (BENCH_r10_streaming_sf10.json predates
#                            the fix; the artifact of record must match
#                            SCALING.md)
#   spill1|spill10         — re-record the r10 spill solo pairs as COMMITTED
#                            jsonl (ADVICE: SCALING.md's spill table cited
#                            uncommitted solo runs)
#   perplexity             — re-record the post-broadcast-fix perplexity
#                            solos the r9 salted table cites
#   artifact1|artifact10   — ArtifactBench: fresh store (train) then
#                            populated store (load); the delta is the
#                            persistence win
set -euo pipefail
cd "$(dirname "$0")/.."

solo() { # sfdir partitions query outfile
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS=$2 \
    SPARK_GRAFT_ONLY=$3 scripts/run_main.sh -m48g graft.Bench \
    2>/dev/null | tail -1 >> "$4"
}

case "${1:?stage}" in
  streaming1)
    SPARK_GRAFT_SF_DIR=target/benchdata/sf1 SPARK_GRAFT_CPUS=32 \
      scripts/run_main.sh -m48g graft.StreamingBench > BENCH_r11_streaming_sf1.json
    ;;
  streaming10)
    SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
      scripts/run_main.sh -m48g graft.StreamingBench > BENCH_r11_streaming_sf10.json
    ;;
  spill1)
    : > BENCH_r11_spill_sf1.jsonl
    solo target/benchdata/sf1 64 q_olap_heavy BENCH_r11_spill_sf1.jsonl
    solo target/benchdata/sf1 64 q_text_keywords BENCH_r11_spill_sf1.jsonl
    ;;
  spill10)
    : > BENCH_r11_spill_sf10.jsonl
    solo target/benchdata/sf10 320 q_olap_heavy BENCH_r11_spill_sf10.jsonl
    solo target/benchdata/sf10 320 q_text_keywords BENCH_r11_spill_sf10.jsonl
    ;;
  perplexity)
    : > BENCH_r11_perplexity.jsonl
    solo target/benchdata/sf1s 64 q_text_perplexity BENCH_r11_perplexity.jsonl
    solo target/benchdata/sf10s 256 q_text_perplexity BENCH_r11_perplexity.jsonl
    ;;
  artifact1)
    rm -rf target/artifacts_bench/sf1
    : > BENCH_r11_artifact_sf1.jsonl
    for pass in train load; do
      SPARK_GRAFT_SF_DIR=target/benchdata/sf1 SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
        SPARK_GRAFT_ARTIFACTS=target/artifacts_bench/sf1 \
        scripts/run_main.sh -m48g graft.ArtifactBench \
        2>/dev/null | tail -1 >> BENCH_r11_artifact_sf1.jsonl
    done
    ;;
  artifact10)
    rm -rf target/artifacts_bench/sf10
    : > BENCH_r11_artifact_sf10.jsonl
    for pass in train load; do
      SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
        SPARK_GRAFT_ARTIFACTS=target/artifacts_bench/sf10 \
        scripts/run_main.sh -m48g graft.ArtifactBench \
        2>/dev/null | tail -1 >> BENCH_r11_artifact_sf10.jsonl
    done
    ;;
  tws1|tws10)
    # HISTORICAL (r11): these stages measured the r11 tws twins under the
    # r11 registry names. Round 12 retired q_streaming_trending_tws
    # (promoted to q_streaming_trending; fMGWS twin = _fmgws) and rebound
    # q_streaming_rate_limit_tws to the epoch-swept re-plan — so re-running
    # this stage would error on the retired name AND measure different
    # plans than the r11 file names imply, after truncating the committed
    # evidence (BENCH_r11_tws_sf{1,10}.jsonl) that the r12 registry moves
    # cite. The r12 equivalents live in run_r12_measurements.sh
    # (tws2_1|tws2_10 and the trending pairs → BENCH_r12_tws2_* /
    # BENCH_r12_trending_*).
    echo "stage $1 is a historical r11 record; refusing to overwrite" \
      "BENCH_r11_tws_*.jsonl — use run_r12_measurements.sh" >&2
    exit 2
    ;;
  restore)
    # the S6 restore-and-continue path, cold solo at both scales
    : > BENCH_r11_restore.jsonl
    for sf in sf1 sf10; do
      SPARK_GRAFT_SF_DIR=target/benchdata/$sf SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_SHUFFLE_PARTITIONS=64 SPARK_GRAFT_ONLY=q_streaming_restore \
        scripts/run_main.sh -m48g graft.StreamingBench \
        2>/dev/null | tail -1 >> BENCH_r11_restore.jsonl
    done
    ;;
  *) echo "unknown stage $1" >&2; exit 2 ;;
esac
echo "STAGE_DONE $1"
