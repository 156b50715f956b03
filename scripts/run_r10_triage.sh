#!/usr/bin/env bash
# Round-10 regression triage (r9 verdict task 3): SOLO-bench each r8→r9
# common-set regression suspect at sf0.1 — one query per JVM, Bench's
# median-of-5 — so long-JVM effects can't pollute the numbers.
set -euo pipefail
cd "$(dirname "$0")/.."
QS="q_statestore_query q_graph_components q_text_mlt q_pipeline_curation_full q_window_hopping q_similarity_ivf"
out=BENCH_r10_triage_sf0.1.jsonl
: > "$out"
for q in $QS; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$q" scripts/run_main.sh -m32g graft.Bench \
    2>/dev/null | tail -1 >> "$out"
done
echo TRIAGE_DONE
cat "$out"
