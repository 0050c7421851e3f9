#!/bin/sh
# Round-4 follow-on: once the main harvest chain finishes (marker: its
# final bench artifact), run the fused 5k at SDE-DPM++(2M)-25 — the fast
# sampler the bench detail rows advertise (11.8 scenes/s/chip vs 3.0 at
# DDIM-100) — so the fast path gets an AT-SCALE quality record
# (rejection rate + FD table), not just a 64-scene A/B row. bench.py
# embeds it as quality_record.fast_arm.
set -u
cd "$(dirname "$0")/.."

echo "$(date -u +%FT%TZ) sde5k_r4: waiting for the main chain's final bench"
while [ ! -f BENCH_local_r4_final.json ]; do
    sleep 60
done
echo "$(date -u +%FT%TZ) sde5k_r4: chain done; starting SDE-25 5k"

ATTEMPT=0
while [ ! -f outputs/flagship/e2e5k_r4sde/vectorization_stats.json ] \
      && [ $ATTEMPT -lt 4 ]; do
  ATTEMPT=$((ATTEMPT + 1))
  python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file drivescenegen_tpu/configs/flagship_256_r4.yaml \
      --output_dir outputs/flagship/e2e5k_r4sde \
      --num_scenes 5120 --batch_size 8 --sampler sde --steps 25 \
      --spacing trailing --resume \
      --n_workers 1 2>&1 | tee -a outputs/flagship/e2e5k_r4sde.log | tail -3
  [ -f outputs/flagship/e2e5k_r4sde/vectorization_stats.json ] && break
  echo "sde5k attempt $ATTEMPT failed; waiting for device health"
  until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    sleep 120
  done
done

if [ -f outputs/flagship/e2e5k_r4sde/vectorization_stats.json ] \
   && [ ! -f outputs/flagship/metrics_model_r4sde.json ]; then
  nice -n 15 python -m drivescenegen_tpu.scripts.compute_map_metrics \
      --gt_dir outputs/flagship/gt \
      --gen_dir outputs/flagship/e2e5k_r4sde \
      --json_out outputs/flagship/metrics_model_r4sde.json \
      > outputs/flagship/metrics_r4sde.log 2>&1
fi
echo "$(date -u +%FT%TZ) sde5k_r4: DONE"
