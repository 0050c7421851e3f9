#!/bin/sh
# Copy the round-4 harvest artifacts out of the untracked outputs/ tree into
# docs/results_r4/ so they survive host re-images in git (round 3 lost its
# whole harvest to a wipe). Run after tools/harvest_r4.sh; then `git add
# docs/results_r4 docs/samples && git commit`. Idempotent, copies only what
# exists.
set -u
cd "$(dirname "$0")/.."
DEST=docs/results_r4
mkdir -p "$DEST" docs/samples

cp_if() { [ -e "$1" ] && cp "$1" "$2" && echo "  + $2"; }

echo "collecting round-4 artifacts:"
for ARM in ddim50_leading_e0 ddim50_trailing_e0 dpm20_trailing_e0 \
           dpm25_trailing_e0 sde25_trailing_e0 sde35_trailing_e0 \
           ddim50_trailing_e1 ddim100_trailing_e1; do
  cp_if "outputs/flagship/ab_r4_${ARM}/vectorization_stats.json" \
        "$DEST/ab_${ARM}_stats.json"
done
cp_if outputs/flagship/e2e5k_r4/vectorization_stats.json "$DEST/e2e5k_r4_stats.json"
cp_if outputs/flagship/e2e5k_r4q/vectorization_stats.json "$DEST/e2e5k_r4q_stats.json"
cp_if outputs/flagship/e2e5k_r4_budget.json "$DEST/e2e5k_r4_budget.json"
cp_if outputs/flagship/metrics_model_r4.json "$DEST/metrics_model_r4.json"
cp_if outputs/flagship/metrics_model_r4q.json "$DEST/metrics_model_r4q.json"
cp_if outputs/flagship/e2e5k_r4cal/vectorization_stats.json "$DEST/e2e5k_r4cal_stats.json"
cp_if outputs/flagship/metrics_model_r4cal.json "$DEST/metrics_model_r4cal.json"
cp_if outputs/flagship/e2e5k_r4sde/vectorization_stats.json "$DEST/e2e5k_r4sde_stats.json"
cp_if outputs/flagship/metrics_model_r4sde.json "$DEST/metrics_model_r4sde.json"
cp_if outputs/flagship/metrics_roundtrip_r4.json "$DEST/metrics_roundtrip_r4.json"
cp_if outputs/flagship/metrics_noise_floor_r4.json "$DEST/metrics_noise_floor_r4.json"
cp_if outputs/cond128n/cfg_eval.json "$DEST/cfg_eval_128native.json"
cp_if outputs/flagship/orientation_r4.txt "$DEST/orientation_r4.txt"
cp_if outputs/flagship/orientation_r4q.txt "$DEST/orientation_r4q.txt"
cp_if outputs/probe_sweep_r4.log "$DEST/probe_sweep_r4.log"
cp_if outputs/microbench_r4.md "$DEST/microbench_r4.md"
cp_if outputs/cond128/cfg_eval.json "$DEST/cfg_eval_128.json"
cp_if BENCH_local_r4.json "$DEST/BENCH_local_r4.json"
cp_if BENCH_local_r4_final.json "$DEST/BENCH_local_r4_final.json"
cp_if outputs/flagship/harvest_r4.log "$DEST/harvest_r4.log"
cp_if outputs/flagship/model/quality_probe.jsonl "$DEST/quality_probe.jsonl"

# A few representative sample rasters (small PNGs) for the docs.
i=0
for f in outputs/flagship/e2e5k_r4/diffusion/*.png; do
  [ -e "$f" ] || break
  cp "$f" "docs/samples/r4_sample_$i.png" && echo "  + docs/samples/r4_sample_$i.png"
  i=$((i + 1))
  [ "$i" -ge 4 ] && break
done

echo "done; review then: git add docs/results_r4 docs/samples && git commit"
