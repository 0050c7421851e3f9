#!/bin/sh
# Round-3 final harvest — run AFTER the flagship continuation reaches its
# final step (tools/watch_and_harvest.sh invokes this unattended). Stages
# are separately resumable; each skips itself if its output already exists.
set -x
cd "$(dirname "$0")/.."

CFG=drivescenegen_tpu/configs/flagship_256_r3.yaml

# 0. Sampler A/B at deterministic settings: DDIM-50 (both spacings, the
#    north-star) vs DPM-Solver++(2M) at 20/25 steps (second-order solver —
#    DDIM-50-class quality at 2.5x fewer UNet evals). 64 scenes each; the
#    arm with the lowest noise-rejection rate wins the 5k run (ties prefer
#    fewer steps).
for ARM in "ddim 50 leading" "ddim 50 trailing" "dpm 20 trailing" "dpm 25 trailing"; do
  set -- $ARM
  TAG=$1$2_$3
  [ -f outputs/flagship/ab_r3_${TAG}/vectorization_stats.json ] && continue
  python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file "$CFG" \
      --output_dir outputs/flagship/ab_r3_${TAG} \
      --num_scenes 64 --batch_size 8 --sampler "$1" --steps "$2" --eta 0 \
      --spacing "$3" --n_workers 1 2>&1 | tail -3
done
WINNER=$(python - <<'EOF'
import json
arms = [("ddim", 50, "leading"), ("ddim", 50, "trailing"),
        ("dpm", 20, "trailing"), ("dpm", 25, "trailing")]
best, best_key = ("ddim", 50, "trailing"), (1e9, 1e9)
for s, n, sp in arms:
    try:
        st = json.load(open(f"outputs/flagship/ab_r3_{s}{n}_{sp}/vectorization_stats.json"))
        rej = (st["n_rejected"] + st["n_failed"]) / max(st["n_images"], 1)
    except Exception:
        continue
    if (rej, n) < best_key:
        best, best_key = (s, n, sp), (rej, n)
print(*best)
EOF
)
set -- $WINNER
SAMPLER=$1; STEPS=$2; SPACING=$3
echo "A/B winner: $SAMPLER-$STEPS $SPACING"

# 1. Fused 5k at the A/B-winning deterministic sampler setting. Retried
#    with --resume after TPU-worker crashes: completed batches reload from
#    disk and skip the sampler.
ATTEMPT=0
while [ ! -f outputs/flagship/e2e5k_r3/vectorization_stats.json ] \
      && [ $ATTEMPT -lt 5 ]; do
  ATTEMPT=$((ATTEMPT + 1))
  python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file "$CFG" \
      --output_dir outputs/flagship/e2e5k_r3 \
      --num_scenes 5120 --batch_size 8 --sampler "$SAMPLER" --steps "$STEPS" \
      --eta 0 --spacing "$SPACING" --resume \
      --n_workers 1 2>&1 | tee -a outputs/flagship/e2e5k_r3.log | tail -3
  [ -f outputs/flagship/e2e5k_r3/vectorization_stats.json ] && break
  echo "e2e5k attempt $ATTEMPT failed; waiting for device health"
  until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    sleep 120
  done
done

# 1b. Quality fallback: if DDIM-50 eta=0 still rejects >15% as speckle, also
#     harvest at DDIM-100 eta=1 (the r2 quality sampler) so the metrics table
#     has a usable model-vs-GT read either way. ~28 min of chip.
NEED_FALLBACK=$(python - <<'EOF'
import json
try:
    s = json.load(open("outputs/flagship/e2e5k_r3/vectorization_stats.json"))
    print(1 if (s["n_rejected"] + s["n_failed"]) / max(s["n_images"], 1) > 0.15 else 0)
except Exception:
    print(0)
EOF
)
if [ "$NEED_FALLBACK" = "1" ] && [ ! -f outputs/flagship/e2e5k_r3q/vectorization_stats.json ]; then
  python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file "$CFG" \
      --output_dir outputs/flagship/e2e5k_r3q \
      --num_scenes 5120 --batch_size 8 --sampler ddim --steps 100 --eta 1 \
      --spacing "$SPACING" \
      --n_workers 1 2>&1 | tee outputs/flagship/e2e5k_r3q.log | tail -3
fi

# 1c. Host-side metrics on whatever 5k harvests exist, in the BACKGROUND:
#     they need no chip, so they overlap the perf/config-5 chip stages below
#     and the quality table lands even if the session is cut mid-harvest.
(
  for RUN in e2e5k_r3 e2e5k_r3q; do
    [ -d "outputs/flagship/$RUN/graph" ] || continue
    [ -f "outputs/flagship/metrics_model_${RUN#e2e5k_}.json" ] && continue
    python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir "outputs/flagship/$RUN" \
        --json_out "outputs/flagship/metrics_model_${RUN#e2e5k_}.json" \
        > "outputs/flagship/metrics_${RUN#e2e5k_}.log" 2>&1
    python tools/orientation_probe.py outputs/flagship/gt/graph \
        "outputs/flagship/$RUN/graph" \
        > "outputs/flagship/orientation_${RUN#e2e5k_}.txt" 2>&1
  done
) &
METRICS_PID=$!

# 2. Chip-cheap perf evidence FIRST (~20 min total): per-op microbench
#    (fills the PERF_ANALYSIS table), the split-skip-concat A/B, and the
#    headline bench — so if the tunnel dies again mid-harvest, the perf
#    record (VERDICT item 3) is already on disk before the long config-5
#    training block.
if [ ! -f outputs/microbench_r3.md ]; then
  python tools/stage_microbench.py 8 > outputs/microbench_r3.md 2>&1
fi
if [ ! -f outputs/probe_sweep_r3c.log ]; then
  python tools/probe_sweep.py split 2>&1 | tee outputs/probe_sweep_r3c.log
fi
python bench.py | tee BENCH_local_r3.json

# 3. Config-5 @128: 20k steps on the chip (decoded-corpus sidecar prebuilt
#    host-side by tools/watch_and_harvest.sh's round-3 session).
if [ ! -d outputs/cond128/model/params ]; then
  python -m drivescenegen_tpu.scripts.train \
      --cfg_file drivescenegen_tpu/configs/config5_cond_128.yaml \
      --max_steps 20000 --supervise 4 2>&1 | tail -5
fi

# 4. CFG guidance sweep eval for config-5.
if [ ! -f outputs/cond128/cfg_eval.json ]; then
  python -m drivescenegen_tpu.scripts.eval_cond_agents \
      --cfg_file drivescenegen_tpu/configs/config5_cond_128.yaml \
      --raster_dir outputs/cond128/heldout_ras/GT_70k_s80_dxdy_agents_img \
      --guidance 1,2,3,5 --num 128 \
      --json_out outputs/cond128/cfg_eval.json 2>&1 | tail -8

  # Re-run the headline bench after config-5 so BENCH_local_r3 reflects a
  # warm cache uncontended by training (keep the earlier one as a floor).
  python bench.py | tee BENCH_local_r3_final.json
fi

wait "$METRICS_PID" 2>/dev/null || true
