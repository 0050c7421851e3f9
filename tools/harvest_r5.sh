#!/bin/sh
# Round-5 final harvest — runs AFTER the flagship fine-tune on the rot180-
# augmented 140k corpus reaches its final step / deadline
# (tools/watch_and_harvest_r5.sh invokes this unattended). Stages are
# separately resumable; each skips itself if its output already exists.
# Order puts the round's TARGET METRIC (two-way pairing) and the quality
# record first, the SDE fast arm second, config-5 sweep third, bench last.
set -x
cd "$(dirname "$0")/.."

CFG=${1:-drivescenegen_tpu/configs/flagship_256_r5.yaml}
# GT raster dir for the pairing probes: the r5b recovery corpus (80k) when
# present, else the original 140k plan's path.
RAS_DIR=${RAS_DIR:-outputs/flagship/ras80k/GT_70k_s80_dxdy_agents_img}
[ -d "$RAS_DIR" ] || RAS_DIR=outputs/flagship/ras140k/GT_70k_s80_dxdy_agents_img

# 0. Sampler A/B. Trimmed to TWO arms for the recovery harvest: the wiped
#    compile cache makes every sampler config a cold ~5-10 min remote
#    compile, and the round has ~95 min left after training — the r4 winner
#    (ddim100 eta1) and the fast stochastic arm (sde 25) are the two the
#    record needs. (ddim50-eta0 answers nothing at a 48k from-scratch
#    budget: it speckles for budget reasons regardless of direction
#    balance.) 64 scenes each; lowest noise-rejection rate wins the 5k.
for ARM in "ddim 100 trailing 1" "sde 25 trailing 0"; do
  set -- $ARM
  TAG=$1$2_$3_e$4
  [ -f outputs/flagship/ab_r5_${TAG}/vectorization_stats.json ] && continue
  python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file "$CFG" \
      --output_dir outputs/flagship/ab_r5_${TAG} \
      --num_scenes 64 --batch_size 8 --sampler "$1" --steps "$2" --eta "$4" \
      --spacing "$3" --n_workers 1 2>&1 | tail -3
done
WINNER=$(python - <<'EOF'
import json
arms = [("ddim", 100, "trailing", 1), ("sde", 25, "trailing", 0)]
best, best_key = ("ddim", 100, "trailing", 1), (1e9, 1e9)
for s, n, sp, eta in arms:
    try:
        st = json.load(open(
            f"outputs/flagship/ab_r5_{s}{n}_{sp}_e{eta}/vectorization_stats.json"))
        rej = (st["n_rejected"] + st["n_failed"]) / max(st["n_images"], 1)
    except Exception:
        continue
    if (rej, n) < best_key:
        best, best_key = (s, n, sp, eta), (rej, n)
print(*best)
EOF
)
set -- $WINNER
SAMPLER=$1; STEPS=$2; SPACING=$3; ETA=$4
echo "A/B winner: $SAMPLER-$STEPS $SPACING eta=$ETA"

# 0b. THE ROUND'S TARGET METRIC, measured the moment the first arm exists:
#     raster-level pairing on the A/B arms' sample images (host-side, fast).
#     r4 model: 0.056; GT: 0.750. Movement here IS the augmentation verdict.
for ARM_DIR in outputs/flagship/ab_r5_*; do
  [ -d "$ARM_DIR/diffusion" ] || continue
  TAG=$(basename "$ARM_DIR")
  [ -f "outputs/flagship/pairing_${TAG}.txt" ] && continue
  python tools/raster_pair_probe.py \
      "$RAS_DIR" \
      "$ARM_DIR/diffusion" 64 \
      > "outputs/flagship/pairing_${TAG}.txt" 2>&1
done

# 1. Fused 5k at the A/B winner, with the wall-clock budget record.
T5K0=$(date +%s)
ATTEMPT=0
while [ ! -f outputs/flagship/e2e5k_r5/vectorization_stats.json ] \
      && [ $ATTEMPT -lt 5 ]; do
  ATTEMPT=$((ATTEMPT + 1))
  python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file "$CFG" \
      --output_dir outputs/flagship/e2e5k_r5 \
      --num_scenes 5120 --batch_size 8 --sampler "$SAMPLER" --steps "$STEPS" \
      --eta "$ETA" --spacing "$SPACING" --resume \
      --n_workers 1 2>&1 | tee -a outputs/flagship/e2e5k_r5.log | tail -3
  [ -f outputs/flagship/e2e5k_r5/vectorization_stats.json ] && break
  echo "e2e5k attempt $ATTEMPT failed; waiting for device health"
  until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    sleep 120
  done
done
python - "$T5K0" <<'EOF'
# Budget record: single-chip wall clock + the v5e-8 extrapolation (both the
# sampler and the fused pipeline are batch-sharded over the data axis, so 8
# chips divide the sampling wall; host vectorization is overlapped).
import json, sys, time
try:
    st = json.load(open("outputs/flagship/e2e5k_r5/vectorization_stats.json"))
except Exception:
    sys.exit(0)
rec = {
    "n_scenes": st.get("n_images"),
    "sampler": st.get("sampler"),
    "wall_time_s": st.get("wall_time_s"),
    "sampling_wall_s": st.get("sampling_wall_s"),
    "scenes_per_s": st.get("scenes_per_s"),
    "ok_scenes_per_s": st.get("ok_scenes_per_s"),
    "retry_wall_s": int(time.time()) - int(sys.argv[1]),
    "v5e8_extrapolated_wall_s": round(st["sampling_wall_s"] / 8.0
                                      + (st["wall_time_s"] - st["sampling_wall_s"]), 1)
                                if st.get("sampling_wall_s") else None,
    "extrapolation_assumes": (
        "batch-sharded sampling divides by 8 (mesh-identical paths, "
        "tests/test_sharded_sampling.py); host vectorization at the "
        "measured ~50-70 ms/image needs >=1 worker per ~19 scenes/s of "
        "sampler throughput to stay overlapped — a v5e-8 host runs the "
        "reference's own 8-worker setting (config/vectorization.yaml:2)"
    ),
    "baseline_target_s": 900,
}
json.dump(rec, open("outputs/flagship/e2e5k_r5_budget.json", "w"), indent=1)
print(rec)
EOF

# 1b. Host-side metrics + BOTH pairing probes on the 5k, in the BACKGROUND.
(
  RUN=e2e5k_r5
  if [ -d "outputs/flagship/$RUN/graph" ]; then
    python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir "outputs/flagship/$RUN" \
        --json_out "outputs/flagship/metrics_model_${RUN#e2e5k_}.json" \
        > "outputs/flagship/metrics_${RUN#e2e5k_}.log" 2>&1
    python tools/orientation_probe.py outputs/flagship/gt/graph \
        "outputs/flagship/$RUN/graph" \
        > "outputs/flagship/orientation_${RUN#e2e5k_}.txt" 2>&1
    python tools/twoway_probe.py outputs/flagship/gt/graph \
        "outputs/flagship/$RUN/graph" \
        > "outputs/flagship/twoway_${RUN#e2e5k_}.txt" 2>&1
    python tools/raster_pair_probe.py \
        "$RAS_DIR" \
        "outputs/flagship/$RUN/diffusion" 200 \
        > "outputs/flagship/pairing_${RUN}.txt" 2>&1
    # Accepted-only raster probe: dense speckle noise pairs by chance
    # (measured 0.975 on a pure-noise epoch-1 eval sample), so the
    # all-images probe above over-reads whenever arms contain rejected
    # noise. Probing only images that produced graphs is the honest
    # raster-side pairing number (the graph-side twoway probe is
    # rejection-gated by construction).
    python - <<'EOF'
import glob, os, shutil
run = "outputs/flagship/e2e5k_r5"
ok = {os.path.basename(g).replace("_graph.pickle", "")
      for g in glob.glob(f"{run}/graph/*_graph.pickle")}
dst = f"{run}/diffusion_ok"
os.makedirs(dst, exist_ok=True)
n = 0
for p in sorted(glob.glob(f"{run}/diffusion/*.png")):
    if os.path.splitext(os.path.basename(p))[0] in ok:
        shutil.copy(p, dst)
        n += 1
        if n >= 200:
            break
print(f"accepted-only probe set: {n} images")
EOF
    python tools/raster_pair_probe.py \
        "$RAS_DIR" \
        "outputs/flagship/$RUN/diffusion_ok" 200 \
        > "outputs/flagship/pairing_${RUN}_ok.txt" 2>&1
  fi
) &
METRICS_PID=$!

# 2. SDE-25 fast-arm 5k (the accepted-volume record), unless SDE-25 already
#    was the winner. Skipped when less than 75 min remain before the
#    round-end guard (ROUND_END epoch, optional).
if [ "$SAMPLER$STEPS" != "sde25" ] \
   && [ ! -f outputs/flagship/e2e5k_r5sde/vectorization_stats.json ]; then
  RE=${ROUND_END:-0}
  if [ "$RE" -eq 0 ] || [ $(( RE - $(date +%s) )) -gt 4500 ]; then
    python -m drivescenegen_tpu.scripts.end_to_end \
        --cfg_file "$CFG" \
        --output_dir outputs/flagship/e2e5k_r5sde \
        --num_scenes 5120 --batch_size 8 --sampler sde --steps 25 \
        --spacing trailing --resume \
        --n_workers 1 2>&1 | tee outputs/flagship/e2e5k_r5sde.log | tail -3
    python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir outputs/flagship/e2e5k_r5sde \
        --json_out outputs/flagship/metrics_model_r5sde.json \
        > outputs/flagship/metrics_r5sde.log 2>&1
    python tools/twoway_probe.py outputs/flagship/gt/graph \
        outputs/flagship/e2e5k_r5sde/graph \
        > outputs/flagship/twoway_r5sde.txt 2>&1
  fi
fi

# 3. Config-5 guidance sweep on the 55k-step native-128 model trained
#    earlier this round (configs/config5_cond_128n_r5.yaml).
if [ -d outputs/cond128n/model_r5/params ] \
   && [ ! -f outputs/cond128n/cfg_eval_r5.json ]; then
  python -m drivescenegen_tpu.scripts.eval_cond_agents \
      --cfg_file drivescenegen_tpu/configs/config5_cond_128n_r5.yaml \
      --raster_dir outputs/cond128n/heldout_ras/GT_70k_s80_dxdy_agents_img \
      --guidance 1,2,3,5 --num 128 \
      --json_out outputs/cond128n/cfg_eval_r5.json 2>&1 | tail -8
fi

# 4. Headline bench on the freed, warm-cached chip.
python bench.py | tee BENCH_local_r5.json

wait "$METRICS_PID" 2>/dev/null || true
