#!/bin/sh
# Round-5 orchestrator. Preconditions handled elsewhere this round:
#   - the 140k rot180-augmented corpus is being rasterized in one pass
#     (data_rasterization --augment rot180 --save_sidecar -> ras140k);
#   - a 55k-step config-5 native-128 retrain occupies the chip meanwhile
#     (configs/config5_cond_128n_r5.yaml; VERDICT r4 item 5).
# This script:
#   1. waits for the 140k corpus (PNGs + sidecar) AND for the config-5
#      trainer to free the chip;
#   2. launches the flagship fine-tune (train --init_from the r4 model,
#      fresh 60k cosine on ras140k) in its own process group;
#   3. execs the round-5 watcher (deadline STOP + harvest chain).
#
# Usage: HARVEST_DEADLINE=<epoch> TARGET_STEP=60000 \
#            nohup sh tools/session_r5.sh > outputs/session_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CFG=drivescenegen_tpu/configs/flagship_256_r5.yaml
PIDFILE=/tmp/flagship_r5_sup.pid
RAS=outputs/flagship/ras140k/GT_70k_s80_dxdy_agents_img
export TARGET_STEP=${TARGET_STEP:-60000}
export HARVEST_DEADLINE=${HARVEST_DEADLINE:-0}
[ "$HARVEST_DEADLINE" -gt 0 ] && echo "$HARVEST_DEADLINE" > /tmp/harvest_deadline_r5

hb() { echo "$(date -u +%FT%TZ) session_r5: $*"; }

# --- 1a. wait for the 140k rasterization (PNG count + final sidecar) ---
WAITED=0
while :; do
    NPNG=$(ls "$RAS" 2>/dev/null | grep -c '\.png$')
    NSC=$(ls "$RAS"/.devcache_*.npy 2>/dev/null | grep -cv tmp)
    [ "$NPNG" -ge 140000 ] && [ "$NSC" -ge 1 ] && break
    if [ "$WAITED" -ge 10800 ]; then
        hb "ERROR: 140k corpus not ready after 3 h (png=$NPNG sidecar=$NSC)"
        exit 1
    fi
    hb "waiting for 140k corpus (png=$NPNG sidecar=$NSC)"
    sleep 120
    WAITED=$((WAITED + 120))
done
hb "140k corpus ready"

# --- 1b. wait for the config-5 trainer to free the chip (liveness via the
#         recorded supervisor PID; never pattern-match process names) ---
C5PID=$(cat /tmp/cond128r5.pid 2>/dev/null || echo 0)
WAITED=0
while [ "$C5PID" -gt 0 ] && kill -0 "$C5PID" 2>/dev/null; do
    if [ "$WAITED" -ge 9000 ]; then
        hb "config-5 trainer ($C5PID) still alive after 2.5 h; stopping it" \
           "gracefully (STOP file) to free the chip for the flagship"
        touch outputs/cond128n/model_r5/STOP
        sleep 300
        kill -0 "$C5PID" 2>/dev/null \
            && { kill -- -"$C5PID" 2>/dev/null || kill "$C5PID" 2>/dev/null; }
        sleep 60
        break
    fi
    hb "waiting for config-5 trainer (pid $C5PID)"
    sleep 120
    WAITED=$((WAITED + 120))
done
hb "chip free"

# --- 2. launch the flagship fine-tune ---
setsid python -m drivescenegen_tpu.scripts.train \
    --cfg_file "$CFG" --init_from outputs/flagship/model \
    --max_steps "$TARGET_STEP" --supervise 6 \
    > outputs/flagship/train_r5.log 2>&1 &
echo $! > "$PIDFILE"
hb "flagship fine-tune launched (pgid $(cat "$PIDFILE"), max_steps $TARGET_STEP)"

# --- 3. watcher + harvest ---
exec sh tools/watch_and_harvest_r5.sh "$CFG"
