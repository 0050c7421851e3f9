#!/bin/sh
# Round-4 (resumed session) orchestrator — the host was re-imaged again, so
# everything untracked is rebuilt from zero, this time with the chip-idle
# critical path minimized:
#
#   1. wait for the (already running) 40k preprocess;
#   2. 40k rasterize WITH --save_sidecar (sidecar written at rasterization
#      time: no 35-min PNG re-decode before training);
#   3. 30k widened preprocess + rasterize (+ its own sidecar);
#   4. ras70k symlink combine + sidecar stitch (pure memmap copies now);
#   5. LAUNCH the 70k flagship run from scratch (max_steps sized so the
#      cosine completes inside the wall-clock window, unlike a truncated
#      150k schedule) in its own process group;
#   6. while the chip trains: held-out pre/ras, GT graph exports, the
#      config-5 128px sidecar prebuild — everything the harvest needs;
#   7. exec the round-4 watcher (deadline STOP + harvest chain).
#
# Usage: HARVEST_DEADLINE=<epoch> TARGET_STEP=90000 \
#            nohup sh tools/session_r4b.sh > outputs/session_r4b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CFG=drivescenegen_tpu/configs/flagship_256_r4.yaml
PIDFILE=/tmp/flagship_sup.pid
export TARGET_STEP=${TARGET_STEP:-90000}
export HARVEST_DEADLINE=${HARVEST_DEADLINE:-0}
[ "$HARVEST_DEADLINE" -gt 0 ] && echo "$HARVEST_DEADLINE" > /tmp/harvest_deadline
RAS40K=outputs/flagship/ras/GT_70k_s80_dxdy_agents_img
RAS30K=outputs/flagship/ras_w30k/GT_70k_s80_dxdy_agents_img
RAS70K=outputs/flagship/ras70k/GT_70k_s80_dxdy_agents_img

hb() { echo "$(date -u +%FT%TZ) session_r4b: $*"; }

# --- 1. wait for the running 40k preprocess (bounded, heartbeat) ---
WAITED=0
while [ "$(ls outputs/flagship/pre 2>/dev/null | grep -c '^sample_')" -lt 40000 ]; do
    if [ "$WAITED" -ge 5400 ]; then
        hb "ERROR: 40k preprocess not done after 90 min; launching it myself"
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

# --- 2. 40k rasterize + sidecar ---
if [ "$(ls "$RAS40K" 2>/dev/null | grep -c '\.png$')" -lt 40000 ]; then
    python -m drivescenegen_tpu.scripts.data_rasterization \
        --load_path outputs/flagship/pre \
        --save_path outputs/flagship/ras --n_workers 4 --save_sidecar \
        || { hb "ERROR: 40k rasterization failed"; exit 1; }
fi
hb "40k rasters ready ($(ls "$RAS40K"/.devcache_*.npy 2>/dev/null | head -1))"

# --- 3. 30k widened preprocess + rasterize ---
if [ "$(ls outputs/flagship/pre_w30k 2>/dev/null | grep -c '^sample_')" -lt 30000 ]; then
    python -m drivescenegen_tpu.scripts.data_preprocess \
        --synthetic 30000 --synthetic_rich --synthetic_offset 40000 \
        --save_path outputs/flagship/pre_w30k \
        || { hb "ERROR: 30k preprocess failed"; exit 1; }
fi
if [ "$(ls "$RAS30K" 2>/dev/null | grep -c '\.png$')" -lt 30000 ]; then
    python -m drivescenegen_tpu.scripts.data_rasterization \
        --load_path outputs/flagship/pre_w30k \
        --save_path outputs/flagship/ras_w30k --n_workers 4 --save_sidecar \
        || { hb "ERROR: 30k rasterization failed"; exit 1; }
fi
hb "30k rasters ready"

# --- 4. ras70k combine + stitch (memmap copies: both source sidecars exist) ---
if [ "$(ls "$RAS70K" 2>/dev/null | grep -c '\.png$')" -lt 70000 ]; then
    mkdir -p "$RAS70K"
    for f in "$RAS40K"/*.png; do
        ln -sf "../../../../$f" "$RAS70K/$(basename "$f")"
    done
    for f in "$RAS30K"/*.png; do
        ln -sf "../../../../$f" "$RAS70K/w_$(basename "$f")"
    done
    hb "ras70k: $(ls "$RAS70K" | grep -c '\.png$') links"
fi
python tools/stitch_sidecar70k.py "$CFG" \
    || { hb "ERROR: sidecar stitch failed"; exit 1; }
SIDECAR=$(ls "$RAS70K"/.devcache_*.npy 2>/dev/null | head -1)
hb "70k corpus ready (sidecar: $SIDECAR)"

# --- 5. launch the 70k flagship run ---
until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    hb "device unhealthy; retrying in 120s"
    sleep 120
done
hb "launching 70k flagship from scratch (max_steps $TARGET_STEP)"
mkdir -p outputs/flagship/model
setsid python -m drivescenegen_tpu.scripts.train \
    --cfg_file "$CFG" --max_steps "$TARGET_STEP" --supervise 8 \
    >> outputs/flagship/train_r4.log 2>&1 &
echo $! > "$PIDFILE"
hb "training launched (pgid $(cat $PIDFILE))"

# --- 6. host-side harvest prerequisites (nice'd under the trainer's feeder) ---
if [ ! -f outputs/flagship/pre_heldout/processed_scenarios_20s.pkl ] || \
   [ "$(ls outputs/flagship/pre_heldout 2>/dev/null | grep -c '^sample_')" -lt 4000 ]; then
    nice -n 10 python -m drivescenegen_tpu.scripts.data_preprocess \
        --synthetic 4000 --synthetic_rich --synthetic_offset 100000 \
        --save_path outputs/flagship/pre_heldout \
        || hb "WARN: held-out preprocess failed (metrics stage will fail)"
fi
if [ "$(ls outputs/cond128/heldout_ras/GT_70k_s80_dxdy_agents_img 2>/dev/null | wc -l)" -lt 4000 ]; then
    nice -n 10 python -m drivescenegen_tpu.scripts.data_rasterization \
        --load_path outputs/flagship/pre_heldout \
        --save_path outputs/cond128/heldout_ras --n_workers 2 \
        || hb "WARN: held-out rasterization failed"
fi
if [ "$(ls outputs/flagship/gt/graph 2>/dev/null | wc -l)" -lt 2000 ] || \
   [ "$(ls outputs/flagship/gt_b/graph 2>/dev/null | wc -l)" -lt 2000 ]; then
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
hb "held-out + GT artifacts ready"
# config-5 prebuild: its dataset is the 40k corpus decoded at 128px, which
# no rasterization-time sidecar covers (resize) — build it now, host-side,
# so the harvest's config-5 trainer doesn't pay a 35-min foreground decode.
nice -n 10 python -m drivescenegen_tpu.data.dataset \
    --cfg_file drivescenegen_tpu/configs/config5_cond_128.yaml \
    >> outputs/cond128_sidecar.log 2>&1 \
    || hb "WARN: config-5 sidecar prebuild failed (harvest decodes inline)"
hb "config-5 sidecar ready"

# --- 7. watcher (deadline stop + harvest) ---
exec sh tools/watch_and_harvest_r4.sh "$CFG"
