#!/bin/sh
# Round-5 RECOVERY orchestrator — the 21:37Z host re-image wiped every
# untracked artifact (r4 donor checkpoint, 140k corpus, the finished r5
# fine-tune, all harvest outputs; none were committed). Rebuild from zero
# with the chip-idle critical path minimized, sized to the final-session
# wall window:
#
#   1. wait for the (already running) 40k rich preprocess;
#   2. config-5 native-128 raster (+sidecar) from the same pickles, then
#      LAUNCH the config-5 20k-step retrain on the chip (VERDICT r4 #5)
#      — it finishes right as the flagship corpus becomes ready;
#   3. meanwhile (host): ONE rasterization pass with --augment rot180
#      --save_sidecar -> 80k direction-balanced rasters;
#   4. wait for the chip, launch the FROM-SCRATCH flagship run
#      (configs/flagship_256_r5b.yaml, cosine sized via TARGET_STEP);
#   5. background (nice'd): held-out 4k preprocess, GT graph exports,
#      config-5 held-out 128px rasters — everything the harvest needs;
#   6. exec the round-5 watcher (deadline STOP + harvest chain).
#
# Usage: HARVEST_DEADLINE=<epoch> ROUND_END=<epoch> TARGET_STEP=45000 \
#            nohup sh tools/session_r5b.sh > outputs/session_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CFG=drivescenegen_tpu/configs/flagship_256_r5b.yaml
C5CFG=drivescenegen_tpu/configs/config5_cond_128n_r5.yaml
PIDFILE=/tmp/flagship_r5_sup.pid
RAS=outputs/flagship/ras80k/GT_70k_s80_dxdy_agents_img
C5RAS=outputs/cond128n/ras/GT_70k_s80_dxdy_agents_img
C5HELD=outputs/cond128n/heldout_ras/GT_70k_s80_dxdy_agents_img
export TARGET_STEP=${TARGET_STEP:-45000}
export HARVEST_DEADLINE=${HARVEST_DEADLINE:-0}
export RAS_DIR=$RAS
[ "$HARVEST_DEADLINE" -gt 0 ] && echo "$HARVEST_DEADLINE" > /tmp/harvest_deadline_r5

hb() { echo "$(date -u +%FT%TZ) session_r5b: $*"; }

# --- 1. wait for the running 40k preprocess (bounded, heartbeat) ---
WAITED=0
while [ "$(ls outputs/flagship/pre 2>/dev/null | grep -c '^sample_')" -lt 40000 ]; do
    if [ "$WAITED" -ge 4200 ]; then
        hb "ERROR: 40k preprocess not done after 70 min; launching it myself"
        python -m drivescenegen_tpu.scripts.data_preprocess \
            --synthetic 40000 --synthetic_rich --save_path outputs/flagship/pre \
            >> outputs/pre40k.log 2>&1
        break
    fi
    hb "waiting for 40k preprocess ($(ls outputs/flagship/pre 2>/dev/null | grep -c '^sample_') pickles)"
    sleep 60
    WAITED=$((WAITED + 60))
done
hb "40k pickles ready"

# --- 2. config-5 data + chip-overlapped retrain ---
if [ "$(ls "$C5RAS" 2>/dev/null | grep -c '\.png$')" -lt 40000 ]; then
    timeout 1800 python -m drivescenegen_tpu.scripts.data_rasterization \
        --load_path outputs/flagship/pre --save_path outputs/cond128n/ras \
        --cfg_file "$C5CFG" --n_workers 4 --save_sidecar \
        || hb "WARN: config-5 rasterization failed (sweep will be skipped)"
fi
if [ "$(ls "$C5RAS" 2>/dev/null | grep -c '\.png$')" -ge 40000 ] \
   && [ ! -d outputs/cond128n/model_r5/params ]; then
    setsid python -m drivescenegen_tpu.scripts.train \
        --cfg_file "$C5CFG" --max_steps 20000 --supervise 2 \
        > outputs/cond128n_train_r5.log 2>&1 &
    echo $! > /tmp/cond128r5.pid
    hb "config-5 retrain launched on the chip (pid $(cat /tmp/cond128r5.pid))"
fi

# --- 3. flagship 80k rot180 raster + sidecar (host, chip trains meanwhile) ---
if [ "$(ls "$RAS" 2>/dev/null | grep -c '\.png$')" -lt 80000 ] \
   || [ "$(ls "$RAS"/.devcache_*.npy 2>/dev/null | grep -cv tmp)" -lt 1 ]; then
    python -m drivescenegen_tpu.scripts.data_rasterization \
        --load_path outputs/flagship/pre \
        --save_path outputs/flagship/ras80k --n_workers 4 --save_sidecar \
        --augment rot180 \
        || { hb "ERROR: 80k rasterization failed"; exit 1; }
fi
hb "80k corpus ready (sidecar: $(ls "$RAS"/.devcache_*.npy 2>/dev/null | head -1))"

# --- 4. wait for the config-5 trainer to free the chip (bounded) ---
C5PID=$(cat /tmp/cond128r5.pid 2>/dev/null || echo 0)
WAITED=0
while [ "$C5PID" -gt 0 ] && kill -0 "$C5PID" 2>/dev/null; do
    if [ "$WAITED" -ge 2400 ]; then
        hb "config-5 trainer ($C5PID) still alive 40 min after corpus ready;" \
           "stopping it gracefully (STOP) to free the chip for the flagship"
        touch outputs/cond128n/model_r5/STOP
        sleep 240
        kill -0 "$C5PID" 2>/dev/null \
            && { kill -- -"$C5PID" 2>/dev/null || kill "$C5PID" 2>/dev/null; }
        sleep 30
        break
    fi
    hb "waiting for config-5 trainer (pid $C5PID)"
    sleep 120
    WAITED=$((WAITED + 120))
done
hb "chip free"

# --- 5. launch the from-scratch flagship run ---
until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    hb "device unhealthy; retrying in 120s"
    sleep 120
done
mkdir -p outputs/flagship/model_r5
setsid python -m drivescenegen_tpu.scripts.train \
    --cfg_file "$CFG" --max_steps "$TARGET_STEP" --supervise 6 \
    > outputs/flagship/train_r5.log 2>&1 &
echo $! > "$PIDFILE"
hb "flagship from-scratch launched (pgid $(cat "$PIDFILE"), max_steps $TARGET_STEP)"

# --- 6. host-side harvest prerequisites (nice'd under the trainer feeder) ---
(
    if [ "$(ls outputs/flagship/pre_heldout 2>/dev/null | grep -c '^sample_')" -lt 4000 ]; then
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
    if [ "$(ls "$C5HELD" 2>/dev/null | grep -c '\.png$')" -lt 4000 ]; then
        nice -n 10 timeout 900 python -m drivescenegen_tpu.scripts.data_rasterization \
            --load_path outputs/flagship/pre_heldout \
            --save_path outputs/cond128n/heldout_ras \
            --cfg_file "$C5CFG" --n_workers 2 \
            || hb "WARN: config-5 held-out rasterization failed"
    fi
    hb "held-out + GT harvest prerequisites ready"
) > outputs/heldout_prep_r5.log 2>&1 &

# pairing watcher: the round's target-metric signal, hours before harvest
nohup sh tools/pairing_watch_r5.sh > /dev/null 2>&1 &

# --- 7. watcher (deadline stop + harvest) ---
exec sh tools/watch_and_harvest_r5.sh "$CFG"
