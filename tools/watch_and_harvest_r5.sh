#!/bin/sh
# Round-5 watcher: babysit the flagship fine-tune (model_r5), then run the
# round-5 harvest the moment the chip frees. Same shape as the r4 watcher;
# differences: r5 paths, relaunches preserve --init_from (harmless once a
# model_r5 checkpoint exists — --resume takes precedence in train.py).
#
# Usage: sh tools/watch_and_harvest_r5.sh <cfg_yaml>   (exec'd by session_r5)
set -u
cd "$(dirname "$0")/.."

CFG=${1:-drivescenegen_tpu/configs/flagship_256_r5.yaml}
PIDFILE=/tmp/flagship_r5_sup.pid
TRAIN_LOG=outputs/flagship/train_r5.log
MODEL_DIR=outputs/flagship/model_r5
TARGET_STEP=${TARGET_STEP:-60000}
DEADLINE=${HARVEST_DEADLINE:-$(cat /tmp/harvest_deadline_r5 2>/dev/null || echo 0)}

alive() {
    [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null
}

kill_group() {
    kill -- -"$(cat "$PIDFILE")" 2>/dev/null || kill "$(cat "$PIDFILE")" 2>/dev/null
}

done_training() {
    grep -q "step ${TARGET_STEP}/${TARGET_STEP}" "$TRAIN_LOG" 2>/dev/null || \
    grep -q "step ${TARGET_STEP}/${TARGET_STEP}" "$MODEL_DIR"/logs/*.log 2>/dev/null
}

past_deadline() {
    [ "$DEADLINE" -gt 0 ] 2>/dev/null && [ "$(date +%s)" -ge "$DEADLINE" ]
}

has_export() {
    [ -d "$MODEL_DIR"/params ]
}

device_healthy() {
    timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1
}

echo "$(date -u +%FT%TZ) watcher_r5 started (pidfile=$PIDFILE, deadline=$DEADLINE, cfg=$CFG)"
while :; do
    if past_deadline; then
        echo "$(date -u +%FT%TZ) harvest deadline reached; requesting graceful trainer stop"
        touch "$MODEL_DIR"/STOP
        WAITED=0
        while alive && [ "$WAITED" -lt 1800 ]; do
            sleep 30
            WAITED=$((WAITED + 30))
        done
        if alive; then
            echo "$(date -u +%FT%TZ) trainer ignored STOP for 30 min; killing its process group"
            kill_group
            sleep 60
        fi
        rm -f "$MODEL_DIR"/STOP
        if has_export; then
            echo "$(date -u +%FT%TZ) export present; starting harvest"
            break
        fi
        echo "$(date -u +%FT%TZ) no export yet; waiting for first save before harvest"
        sleep 120
        continue
    fi
    if alive; then
        sleep 120
        continue
    fi
    if done_training; then
        echo "$(date -u +%FT%TZ) training reached step $TARGET_STEP; starting harvest"
        break
    fi
    echo "$(date -u +%FT%TZ) trainer process gone, target not reached; probing device"
    until device_healthy; do
        echo "$(date -u +%FT%TZ) device unhealthy; retrying in 120s"
        sleep 120
    done
    echo "$(date -u +%FT%TZ) device healthy; relaunching supervised training"
    # --init_from only when the r4 donor survived (the 21:37Z re-image wiped
    # it; the r5b recovery run trains from scratch) — --resume of THIS run's
    # checkpoints takes precedence in train.py either way.
    INIT_FROM=""
    [ -d outputs/flagship/model ] && INIT_FROM="--init_from outputs/flagship/model"
    setsid python -m drivescenegen_tpu.scripts.train \
        --cfg_file "$CFG" $INIT_FROM \
        --resume --max_steps "$TARGET_STEP" --supervise 8 \
        >> "$TRAIN_LOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 300
done

HARVEST=${HARVEST_SCRIPT:-tools/harvest_r5.sh}
sh "$HARVEST" "$CFG" > outputs/flagship/harvest_r5.log 2>&1
echo "$(date -u +%FT%TZ) $HARVEST finished rc=$?"
