#!/usr/bin/env bash
# Round-11 regression triage (r10 verdict task 1): SOLO-bench each r9→r10
# common-set regression suspect at sf0.1 — one query per JVM (fresh JVM,
# 48g fixed heap, Bench median-of-5) — then the SAME benches on the r9
# bench commit's code (e59d794) rebuilt in target/wt_r9. Same machine,
# same hour; never two Spark JVMs at once.
#
# Usage: run_r11_triage.sh <repo-or-worktree-dir> <out.jsonl> <q1> [q2 ...]
set -euo pipefail
dir="$1"; out="$2"; shift 2
cd "$dir"
for q in "$@"; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY="$q" scripts/run_main.sh -m48g graft.Bench \
    2>/dev/null | tail -1 >> "$out"
done
echo "TRIAGE_STAGE_DONE $out"
