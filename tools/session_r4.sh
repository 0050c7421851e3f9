#!/bin/sh
# Round-4 orchestrator: switch the in-flight 40k-corpus flagship run onto the
# 70k corpus (the reference's training scale) at its next checkpoint, then
# hand off to the round-4 watcher + harvest chain.
#
#   1. Wait for tools/rebuild_w30k.sh products (ras70k + stitched sidecar),
#      with heartbeat + hard timeout (ADVICE r3: no silent forever-polls).
#   2. Graceful-stop the running 40k trainer via its STOP file (full-state
#      save + params export, exit 0).
#   3. Relaunch on flagship_256_r4.yaml with --resume --max_steps 150000 in
#      its OWN process group (setsid), so the watcher's deadline kill
#      reaches the trainer child, not just the supervisor wrapper
#      (ADVICE r3: PIDFILE held only the wrapper pid).
#   4. exec the round-4 watcher (deadline stop + harvest).
#
# Usage: HARVEST_DEADLINE=<epoch> nohup sh tools/session_r4.sh \
#            > outputs/session_r4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CFG=drivescenegen_tpu/configs/flagship_256_r4.yaml
PIDFILE=/tmp/flagship_sup.pid
MODEL_DIR=outputs/flagship/model
RAS70K=outputs/flagship/ras70k/GT_70k_s80_dxdy_agents_img

hb() { echo "$(date -u +%FT%TZ) session_r4: $*"; }

# --- 1. wait for the 70k corpus + sidecar (bounded, with heartbeat) ---
WAITED=0
until grep -q "rebuild_w30k: DONE" outputs/rebuild_w30k.log 2>/dev/null; do
    if [ "$WAITED" -ge 7200 ]; then
        hb "ERROR: 70k rebuild not done after 2h; continuing the 40k run unswitched"
        exec sh tools/watch_and_harvest_r4.sh drivescenegen_tpu/configs/flagship_256_r3.yaml
    fi
    hb "waiting for 70k rebuild ($(ls "$RAS70K" 2>/dev/null | grep -c '\.png$' || echo 0) links, log: $(tail -1 outputs/rebuild_w30k.log 2>/dev/null))"
    sleep 60
    WAITED=$((WAITED + 60))
done
SIDECAR=$(ls "$RAS70K"/.devcache_*.npy 2>/dev/null | head -1)
if [ -z "$SIDECAR" ]; then
    hb "ERROR: rebuild reported DONE but no sidecar; continuing 40k unswitched"
    exec sh tools/watch_and_harvest_r4.sh drivescenegen_tpu/configs/flagship_256_r3.yaml
fi
hb "70k corpus ready (sidecar: $SIDECAR)"

# --- 2. graceful-stop the 40k run ---
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    hb "requesting graceful stop of the 40k run (STOP file)"
    touch "$MODEL_DIR/STOP"
    WAITED=0
    while kill -0 "$(cat "$PIDFILE")" 2>/dev/null && [ "$WAITED" -lt 2400 ]; do
        sleep 30; WAITED=$((WAITED + 30))
        hb "waiting for trainer save+exit (${WAITED}s)"
    done
    if kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
        hb "trainer ignored STOP for 40 min; killing its process group"
        kill -- -"$(cat "$PIDFILE")" 2>/dev/null || kill "$(cat "$PIDFILE")" 2>/dev/null
        sleep 30
    fi
fi
rm -f "$MODEL_DIR/STOP"
if [ ! -d "$MODEL_DIR/checkpoints" ] || \
   [ -z "$(ls "$MODEL_DIR/checkpoints" 2>/dev/null)" ]; then
    hb "ERROR: no checkpoint after stop — the 70k run would restart from 0."
    hb "launching anyway (fresh 70k run is still the round-4 objective)"
fi

# --- 3. relaunch on the 70k corpus ---
until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    hb "device unhealthy; retrying in 120s"
    sleep 120
done
hb "launching 70k continuation (resume + max_steps 150000)"
setsid python -m drivescenegen_tpu.scripts.train \
    --cfg_file "$CFG" --resume --max_steps 150000 --supervise 8 \
    >> outputs/flagship/train_r4.log 2>&1 &
echo $! > "$PIDFILE"
hb "training launched (pgid $(cat $PIDFILE))"

# --- 4. watcher (deadline stop + harvest) ---
exec sh tools/watch_and_harvest_r4.sh "$CFG"
