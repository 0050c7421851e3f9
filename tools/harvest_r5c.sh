#!/bin/sh
# Round-5 session-d harvest (128px recovery flagship). Runs after
# tools/watch_and_harvest_r5.sh sees the trainer finish / deadline-stop.
# Sized to the ~25 min left after training: NO sampler A/B (the r4 A/B
# already established the stochastic-path winners; cold compiles are the
# scarce resource) — one DDIM-100-eta1 quality arm (the r4 winner) and one
# SDE-25 fast arm, then the round's probes. Stages are resumable.
set -x
cd "$(dirname "$0")/.."

CFG=${1:-drivescenegen_tpu/configs/flagship_128_r5c.yaml}
RAS_DIR=${RAS_DIR:-outputs/flagship/ras128/GT_70k_s80_dxdy_agents_img}

# 0. Recalibrate the max_scene_nodes gate at 128 from GT-side data only
#    (r4 protocol: 2x the max over the GT roundtrip graphs; default 32 if
#    the roundtrip isn't ready).
GCFG=drivescenegen_tpu/configs/flagship_128_r5c_gate.yaml
GATE=$(python - <<'EOF'
import glob, pickle
files = glob.glob("outputs/flagship/roundtrip/graph/*.pickle")
if len(files) < 500:
    print(32)
else:
    mx = max(pickle.load(open(f, "rb")).number_of_nodes() for f in files)
    print(max(2 * mx, 8))
EOF
)
cp "$CFG" "$GCFG"
printf '  max_scene_nodes: %s\n' "$GATE" >> "$GCFG"
echo "128 gate calibrated: max_scene_nodes=$GATE (roundtrip n=$(ls outputs/flagship/roundtrip/graph 2>/dev/null | wc -l))"

# 1. Quality arm: DDIM-100 eta=1 (the r4 A/B winner), 2048 scenes.
ATTEMPT=0
while [ ! -f outputs/flagship/e2e5k_r5/vectorization_stats.json ] \
      && [ $ATTEMPT -lt 4 ]; do
  ATTEMPT=$((ATTEMPT + 1))
  timeout 2100 python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file "$GCFG" \
      --output_dir outputs/flagship/e2e5k_r5 \
      --num_scenes 2048 --batch_size 32 --sampler ddim --steps 100 \
      --eta 1 --spacing trailing --resume \
      --n_workers 1 2>&1 | tee -a outputs/flagship/e2e5k_r5.log | tail -3
  [ -f outputs/flagship/e2e5k_r5/vectorization_stats.json ] && break
  until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    sleep 60
  done
done

# 1b. Probes + metrics on the quality arm, in the BACKGROUND (host-side).
(
  RUN=e2e5k_r5
  if [ -d "outputs/flagship/$RUN/graph" ]; then
    python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir "outputs/flagship/$RUN" \
        --json_out outputs/flagship/metrics_model_r5.json \
        > outputs/flagship/metrics_r5.log 2>&1
    python tools/twoway_probe.py outputs/flagship/gt/graph \
        "outputs/flagship/$RUN/graph" \
        > outputs/flagship/twoway_r5.txt 2>&1
    python tools/orientation_probe.py outputs/flagship/gt/graph \
        "outputs/flagship/$RUN/graph" \
        > outputs/flagship/orientation_r5.txt 2>&1
    # Accepted-only raster pairing (the honest raster-side number; dense
    # noise pairs by chance, so all-images probes over-read).
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
    python tools/raster_pair_probe.py "$RAS_DIR" \
        "outputs/flagship/$RUN/diffusion_ok" 200 \
        > "outputs/flagship/pairing_${RUN}_ok.txt" 2>&1
    python tools/raster_pair_probe.py "$RAS_DIR" \
        "outputs/flagship/$RUN/diffusion" 200 \
        > "outputs/flagship/pairing_${RUN}.txt" 2>&1
    # 128 calibration rows: roundtrip ceiling + noise floor (usually
    # precomputed during training; skip if present).
    [ -f outputs/flagship/metrics_roundtrip_r5.json ] || \
    python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir outputs/flagship/roundtrip \
        --json_out outputs/flagship/metrics_roundtrip_r5.json \
        > outputs/flagship/metrics_roundtrip_r5.log 2>&1
    [ -f outputs/flagship/twoway_roundtrip_r5.txt ] || \
    python tools/twoway_probe.py outputs/flagship/gt/graph \
        outputs/flagship/roundtrip/graph \
        > outputs/flagship/twoway_roundtrip_r5.txt 2>&1
  fi
) > outputs/flagship/probes_r5.log 2>&1 &
METRICS_PID=$!

# 2. Fast arm: SDE-DPM++(2M)-25, 1024 scenes (accepted-volume record).
if [ ! -f outputs/flagship/e2e5k_r5sde/vectorization_stats.json ]; then
  timeout 1500 python -m drivescenegen_tpu.scripts.end_to_end \
      --cfg_file "$GCFG" \
      --output_dir outputs/flagship/e2e5k_r5sde \
      --num_scenes 1024 --batch_size 32 --sampler sde --steps 25 \
      --spacing trailing --resume \
      --n_workers 1 2>&1 | tee outputs/flagship/e2e5k_r5sde.log | tail -3
  if [ -d outputs/flagship/e2e5k_r5sde/graph ]; then
    python tools/twoway_probe.py outputs/flagship/gt/graph \
        outputs/flagship/e2e5k_r5sde/graph \
        > outputs/flagship/twoway_r5sde.txt 2>&1
    python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir outputs/flagship/e2e5k_r5sde \
        --json_out outputs/flagship/metrics_model_r5sde.json \
        > outputs/flagship/metrics_r5sde.log 2>&1
  fi
fi

# 3. Headline bench moved to tools/post_harvest_r5d.sh (runs LAST, after
#    the fused-kernel A/B and the config-5 retrain, so the quality record
#    embeds every r5 artifact).

wait "$METRICS_PID" 2>/dev/null || true
echo "harvest_r5c done"
