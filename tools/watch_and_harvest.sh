#!/bin/sh
# Round-3 unattended chain: babysit the flagship continuation, then run the
# quality/perf harvest the moment the chip frees.
#
#   - While the supervised trainer (PID in $PIDFILE) is alive: sleep.
#   - Trainer exited + target step reached  -> run the harvest chain.
#   - Trainer exited early (supervisor gave up waiting for device health,
#     scripts/train.py:155-157) -> probe the device ourselves and relaunch
#     the supervised run, then keep watching.
#
# Usage: sh tools/watch_and_harvest.sh   (run inside tmux; it logs to
#        outputs/flagship/watch.log via the caller's redirection)
set -u
cd "$(dirname "$0")/.."

PIDFILE=/tmp/flagship_sup.pid
TRAIN_LOG=outputs/flagship/train_r3.log
TARGET_STEP=150000
CFG=drivescenegen_tpu/configs/flagship_256_r3.yaml
# Wall-clock budget guard: the harvest (5k fused run, config-5 training,
# bench) needs ~2.5 h of chip; if the trainer hasn't reached TARGET_STEP by
# the deadline (epoch seconds, set by the launcher via $HARVEST_DEADLINE or
# a /tmp file), stop it at its latest checkpoint — params are exported at
# every save (scripts/train.py:417-423) — and harvest what we have.
DEADLINE=${HARVEST_DEADLINE:-$(cat /tmp/harvest_deadline 2>/dev/null || echo 0)}

alive() {
    [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null
}

done_training() {
    grep -q "step ${TARGET_STEP}/${TARGET_STEP}" "$TRAIN_LOG" 2>/dev/null || \
    grep -q "step ${TARGET_STEP}/${TARGET_STEP}" outputs/flagship/model/logs/*.log 2>/dev/null
}

past_deadline() {
    [ "$DEADLINE" -gt 0 ] 2>/dev/null && [ "$(date +%s)" -ge "$DEADLINE" ]
}

has_export() {
    [ -d outputs/flagship/model/params ]
}

device_healthy() {
    timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1
}

echo "$(date -u +%FT%TZ) watcher started (pidfile=$PIDFILE, deadline=$DEADLINE)"
while :; do
    if past_deadline; then
        echo "$(date -u +%FT%TZ) harvest deadline reached; requesting graceful trainer stop"
        touch outputs/flagship/model/STOP
        # The trainer saves a checkpoint + params export and exits 0 at its
        # next log boundary (scripts/train.py stop-file); the save itself can
        # take 10+ min over the narrow tunnel. Wait up to 30 min.
        WAITED=0
        while alive && [ "$WAITED" -lt 1800 ]; do
            sleep 30
            WAITED=$((WAITED + 30))
        done
        if alive; then
            echo "$(date -u +%FT%TZ) trainer ignored STOP for 30 min; killing supervisor pid"
            kill "$(cat "$PIDFILE")" 2>/dev/null
            sleep 60
        fi
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
    python -m drivescenegen_tpu.scripts.train \
        --cfg_file "$CFG" --resume --supervise 8 \
        >> "$TRAIN_LOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 300
done

# ---- harvest chain (chip + host) ----
sh tools/harvest_r3b.sh > outputs/flagship/harvest_r3b.log 2>&1
echo "$(date -u +%FT%TZ) harvest_r3b.sh finished rc=$?"

# Host-side metrics on the new 5k harvest(s) (chip already free by now).
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
echo "$(date -u +%FT%TZ) metrics done; ALL DONE"
