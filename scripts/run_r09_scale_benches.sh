#!/usr/bin/env bash
# Round-9 second-decade benches: stage the salted (constant-duplicate-density)
# twins and run the three scale-subset benches sequentially (never
# concurrently — timings must not contend). Artifacts land in the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

# constant-density subset: the dedup/text/graph families whose sf0.1->sf1s
# story SCALING.md already records, plus the round-9 LSH calibration curve
SALTED_QS=q_dedup_containment,q_dedup_near,q_dedup_incremental,q_dedup_lsh_curve,q_text_mlt,q_text_perplexity,q_text_rarity_join,q_fuzzy_customers,q_sketch_kmv_jaccard,q_graph_pagerank,q_graph_components,q_graph_triangles,q_features_resample
# default-substrate subset: input-bound scale paths (graph, resample,
# sketches, trained-model text scoring, ANN audits, OLAP, calibration)
DEFAULT_QS=q_graph_pagerank,q_graph_components,q_graph_triangles,q_features_resample,q_sketch_kmv_jaccard,q_text_mlt,q_text_perplexity,q_text_rarity_join,q_text_keywords,q_similarity_ann,q_similarity_ivf,q_dedup_lsh_curve,q_olap_pricing,q_olap_heavy,q_fuzzy_customers

# staging guarded by the post-completion .done marker (a bare directory
# check treats a crashed half-staged dir as complete — ADVICE r9), and a
# restage invalidates the path-keyed artifact subtree (ADVICE r10)
stage() { # dir mem factor mode
  local dir=$1 mem=$2 factor=$3 mode=$4
  if [ ! -f "$dir/.done" ]; then
    rm -rf "$dir"
    rm -rf "target/artifacts/$(printf '%s' "$dir" | md5sum | cut -d' ' -f1)"
    SPARK_GRAFT_CPUS=16 scripts/run_main.sh -m"$mem" graft.ScaleData \
      /root/testdata/sf0.1 "$dir" "$factor" $mode
    touch "$dir/.done"
  fi
}
stage target/benchdata/sf1s 24g 10 salted
stage target/benchdata/sf10s 32g 100 salted

SPARK_GRAFT_SF_DIR=target/benchdata/sf1s SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$SALTED_QS \
  scripts/run_main.sh -m64g graft.Bench > BENCH_r09_salted_sf1s_v2.json
SPARK_GRAFT_SF_DIR=target/benchdata/sf10s SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$SALTED_QS \
  scripts/run_main.sh -m80g graft.Bench > BENCH_r09_salted_sf10s.json
SPARK_GRAFT_SF_DIR=target/benchdata/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$DEFAULT_QS \
  scripts/run_main.sh -m80g graft.Bench > BENCH_r09_sf10_subset.json
echo ALL_DONE
