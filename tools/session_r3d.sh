#!/bin/sh
# Round-3 session-d orchestrator: after the second host re-image, rebuild
# everything and restart the unattended training + harvest chain.
#
#   sh tools/rebuild_r3_data.sh   (launched separately; this script waits on
#                                  its products, not its pid)
#   -> prebuild the flagship decoded-corpus sidecar (host-only, ~35 min)
#   -> launch supervised flagship training (150k-step budget, from scratch;
#      the round-2 checkpoint died with the re-image)
#   -> hand off to tools/watch_and_harvest.sh (deadline-stop + harvest)
#
# Usage: HARVEST_DEADLINE=<epoch> nohup sh tools/session_r3d.sh \
#            > outputs/session_r3d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

CFG=drivescenegen_tpu/configs/flagship_256_r3.yaml
PIDFILE=/tmp/flagship_sup.pid

echo "$(date -u +%FT%TZ) session_r3d: waiting for data rebuild products"
while [ "$(ls outputs/flagship/ras/GT_70k_s80_dxdy_agents_img 2>/dev/null | wc -l)" -lt 40000 ] || \
      [ "$(ls outputs/flagship/gt_b/graph 2>/dev/null | wc -l)" -lt 2000 ]; do
    sleep 120
done
echo "$(date -u +%FT%TZ) session_r3d: rebuild products present"

python -m drivescenegen_tpu.data.dataset --cfg_file "$CFG" \
    && echo "$(date -u +%FT%TZ) session_r3d: flagship sidecar ready"

until timeout 180 python -c "import jax; jax.devices(); import jax.numpy as j; j.ones(4).sum().block_until_ready()" >/dev/null 2>&1; do
    echo "$(date -u +%FT%TZ) session_r3d: device unhealthy; retrying in 120s"
    sleep 120
done

python -m drivescenegen_tpu.scripts.train \
    --cfg_file "$CFG" --supervise 8 \
    >> outputs/flagship/train_r3.log 2>&1 &
echo $! > "$PIDFILE"
echo "$(date -u +%FT%TZ) session_r3d: training launched (pid $(cat $PIDFILE))"

# config-5 sidecar can decode while the chip trains (host-only).
python -m drivescenegen_tpu.data.dataset \
    --cfg_file drivescenegen_tpu/configs/config5_cond_128.yaml \
    && echo "$(date -u +%FT%TZ) session_r3d: cond128 sidecar ready"

exec sh tools/watch_and_harvest.sh
