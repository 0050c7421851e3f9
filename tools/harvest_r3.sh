#!/bin/sh
# Round-3 final harvest — run AFTER the flagship continuation is stopped
# (checkpoint 100000 saved + params exported). Stages are separately
# resumable; comment out what already ran. Total ~2h on the chip + host.
set -x
cd "$(dirname "$0")/.."

# 0. Spacing A/B at the north-star setting (DDIM-50 eta=0): 64 scenes each,
#    pick the spacing with the lower noise-rejection rate for the 5k run.
for SP in leading trailing; do
  python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file drivescenegen_tpu/configs/flagship_256_r3.yaml \
      --output_dir outputs/flagship/ab_${SP} \
      --num_scenes 64 --batch_size 8 --sampler ddim --steps 50 --eta 0 \
      --spacing ${SP} --n_workers 1 2>&1 | tail -3
  cat outputs/flagship/ab_${SP}/vectorization_stats.json
done

# 1. Fused 5k at DDIM-50 eta=0 (spacing per A/B winner — edit if leading).
python -m drivescenegen_tpu.scripts.end_to_end \
    --cfg_file drivescenegen_tpu/configs/flagship_256_r3.yaml \
    --output_dir outputs/flagship/e2e5k_r3 \
    --num_scenes 5120 --batch_size 8 --sampler ddim --steps 50 --eta 0 \
    --spacing trailing \
    --n_workers 1 2>&1 | tee outputs/flagship/e2e5k_r3.log | tail -3

# 2. Config-5 @128: upload prebuilt sidecar + 20k steps (chip), while the
#    map metrics (host) run concurrently in another shell.
python -m drivescenegen_tpu.scripts.train \
    --cfg_file drivescenegen_tpu/configs/config5_cond_128.yaml \
    --max_steps 20000 --supervise 4 2>&1 | tail -5

# 2b. (host, concurrent) Map metrics: model vs GT.
# python -m drivescenegen_tpu.scripts.compute_map_metrics \
#     --gt_dir outputs/flagship/gt --gen_dir outputs/flagship/e2e5k_r3 \
#     --json_out outputs/flagship/metrics_model_r3.json
# python outputs/orientation_probe.py outputs/flagship/gt/graph \
#     outputs/flagship/e2e5k_r3/graph | tee outputs/flagship/orientation_r3.txt

# 3. CFG guidance sweep eval for config-5.
python -m drivescenegen_tpu.scripts.eval_cond_agents \
    --cfg_file drivescenegen_tpu/configs/config5_cond_128.yaml \
    --raster_dir outputs/cond128/heldout_ras/GT_70k_s80_dxdy_agents_img \
    --guidance 1,2,3,5 --num 128 \
    --json_out outputs/cond128/cfg_eval.json 2>&1 | tail -8

# 4. Headline bench (warm compile cache).
python bench.py | tee BENCH_local_r3.json
