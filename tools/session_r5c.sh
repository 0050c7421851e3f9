#!/bin/sh
# Round-5 session-d FINAL-WINDOW orchestrator. The FOURTH host re-image
# (02:15Z) destroyed the 48k-step 256px rot180 run minutes before its last
# step; only the mid-run pairing probe survived (docs/results_r5/
# pairing_probe_r5.log: model raster pairing 0.74-0.98 vs GT 0.83 — but
# mid-training all-images probes over-read on noise, so not conclusive).
#
# <2 h remain. Plan: answer the round's target metric (two-way lane
# pairing, VERDICT r4 #1) decisively at native 128px where a converged
# ~35k-step from-scratch model + a low-rejection harvest fits the window:
#   1. wait for the 40k rich preprocess (running);
#   2. rasterize ONCE at 128px with --augment rot180 --save_sidecar
#      -> 80k direction-balanced images (outputs/flagship/ras128);
#   3. launch the from-scratch 128 flagship (configs/flagship_128_r5c.yaml)
#      with max_steps sized to the harvest deadline at a conservative
#      10 steps/s (measured ~12 on the config-5 native-128 recipe) so the
#      cosine completes BEFORE the deadline;
#   4. background (nice'd): held-out 4k preprocess, GT graph exports
#      (2k gt + 2k gt_b), held-out 128 rasters (1 worker -> 0_k.png names),
#      roundtrip vectorization of the first 2000 (the 128 ceiling +
#      max_scene_nodes recalibration corpus);
#   5. pairing watcher on the per-epoch eval samples;
#   6. exec the r5 watcher (deadline STOP + tools/harvest_r5c.sh).
#
# Usage: HARVEST_DEADLINE=<epoch> nohup sh tools/session_r5c.sh \
#            > outputs/session_r5c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CFG=drivescenegen_tpu/configs/flagship_128_r5c.yaml
PIDFILE=/tmp/flagship_r5_sup.pid
RAS=outputs/flagship/ras128/GT_70k_s80_dxdy_agents_img
export HARVEST_DEADLINE=${HARVEST_DEADLINE:?set HARVEST_DEADLINE epoch}
export RAS_DIR=$RAS
echo "$HARVEST_DEADLINE" > /tmp/harvest_deadline_r5

hb() { echo "$(date -u +%FT%TZ) session_r5c: $*"; }

# --- 1. wait for the running 40k preprocess (bounded, heartbeat) ---
WAITED=0
while [ "$(ls outputs/flagship/pre 2>/dev/null | wc -l)" -lt 40000 ]; do
    if [ "$WAITED" -ge 1800 ]; then
        hb "ERROR: 40k preprocess not done after 30 min; proceeding with what exists"
        break
    fi
    hb "waiting for 40k preprocess ($(ls outputs/flagship/pre 2>/dev/null | wc -l) pickles)"
    sleep 30
    WAITED=$((WAITED + 30))
done
hb "pickles ready ($(ls outputs/flagship/pre | wc -l))"

# --- 2. 128px rot180 raster + sidecar ---
if [ "$(ls "$RAS" 2>/dev/null | grep -c '\.png$')" -lt 79000 ] \
   || ! ls "$RAS"/.devcache_*.npy >/dev/null 2>&1; then
    python -m drivescenegen_tpu.scripts.data_rasterization \
        --load_path outputs/flagship/pre \
        --save_path outputs/flagship/ras128 --cfg_file "$CFG" \
        --n_workers 2 --save_sidecar --augment rot180 \
        || { hb "ERROR: 128 rasterization failed"; exit 1; }
fi
hb "128 corpus ready ($(ls "$RAS" | grep -c '\.png$') images)"

# --- 3. launch the from-scratch 128 flagship, cosine sized to the window ---
until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    hb "device unhealthy; retrying in 120s"
    sleep 120
done
NOW=$(date +%s)
TARGET_STEP=$(( (HARVEST_DEADLINE - NOW - 420) * 10 ))
TARGET_STEP=$(( TARGET_STEP / 500 * 500 ))
[ "$TARGET_STEP" -lt 10000 ] && TARGET_STEP=10000
[ "$TARGET_STEP" -gt 45000 ] && TARGET_STEP=45000
export TARGET_STEP
hb "flagship 128 launch: max_steps=$TARGET_STEP (deadline in $(( (HARVEST_DEADLINE - NOW) / 60 )) min)"
mkdir -p outputs/flagship/model_r5
setsid python -m drivescenegen_tpu.scripts.train \
    --cfg_file "$CFG" --max_steps "$TARGET_STEP" --supervise 6 \
    > outputs/flagship/train_r5.log 2>&1 &
echo $! > "$PIDFILE"
hb "flagship launched (pgid $(cat "$PIDFILE"))"

# --- 4. host-side harvest prerequisites (nice'd) ---
(
    if [ "$(ls outputs/flagship/pre_heldout 2>/dev/null | wc -l)" -lt 4000 ]; then
        nice -n 10 python -m drivescenegen_tpu.scripts.data_preprocess \
            --synthetic 4000 --synthetic_rich --synthetic_offset 100000 \
            --save_path outputs/flagship/pre_heldout \
            || hb "WARN: held-out preprocess failed (metrics stage will fail)"
    fi
    if [ "$(ls outputs/flagship/gt/graph 2>/dev/null | wc -l)" -lt 2000 ]; then
        nice -n 10 python - <<'EOF' || hb "WARN: GT graph export failed"
import glob, pickle
from drivescenegen_tpu.data.graph_export import export_scenario

files = sorted(glob.glob("outputs/flagship/pre_heldout/sample_*.pkl"))
for i, path in enumerate(files[:4000]):
    with open(path, "rb") as f:
        info = pickle.load(f)
    dest = "outputs/flagship/gt" if i < 2000 else "outputs/flagship/gt_b"
    export_scenario(info, dest, i, save_track=False, save_scenario=False)
print("GT graphs exported: 2000 + 2000")
EOF
    fi
    # Held-out 128 rasters with ONE worker: names 0_k.png in sorted-pickle
    # order, so "first 2000" needs no worker-count link dance.
    HELD=outputs/flagship/heldout_ras128/GT_70k_s80_dxdy_agents_img
    if [ "$(ls "$HELD" 2>/dev/null | grep -c '\.png$')" -lt 4000 ]; then
        nice -n 10 timeout 2400 python -m drivescenegen_tpu.scripts.data_rasterization \
            --load_path outputs/flagship/pre_heldout \
            --save_path outputs/flagship/heldout_ras128 \
            --cfg_file "$CFG" --n_workers 1 \
            || hb "WARN: held-out 128 rasterization failed"
    fi
    # Roundtrip input = first 2000 held-out scenes.
    RT_IN=outputs/flagship/roundtrip_in
    if [ "$(ls "$RT_IN" 2>/dev/null | wc -l)" -lt 2000 ]; then
        mkdir -p "$RT_IN"
        k=0
        while [ "$k" -lt 2000 ]; do
            ln -sf "../../../$HELD/0_${k}.png" "$RT_IN/0_${k}.png"
            k=$((k + 1))
        done
    fi
    if [ "$(ls outputs/flagship/roundtrip/graph 2>/dev/null | wc -l)" -lt 2000 ]; then
        nice -n 19 python -m drivescenegen_tpu.scripts.vectorization \
            --load_path "$RT_IN" --save_path outputs/flagship/roundtrip \
            --cfg_file "$CFG" --no_device_skeleton --n_workers 1 2>&1 | tail -3
    fi
    hb "held-out + GT + 128 roundtrip harvest prerequisites ready"
) > outputs/heldout_prep_r5.log 2>&1 &

# pairing watcher: the round's target-metric signal, from the first epoch
nohup sh tools/pairing_watch_r5.sh > /dev/null 2>&1 &

# --- 5. watcher (deadline stop + harvest) ---
HARVEST_SCRIPT=tools/harvest_r5c.sh exec sh tools/watch_and_harvest_r5.sh "$CFG"
