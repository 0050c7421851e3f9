#!/bin/sh
# Round-5 session-e post-harvest chip chain. Fires when watch_and_harvest_r5
# logs that tools/harvest_r5c.sh finished (chip free), then spends the
# remaining window in VERDICT priority order:
#   1. config-5 native-128 retrain, steps sized to the clock (floor 12k,
#      cap 25k; r4's 20k-step run measured 0.285 F1 — VERDICT r4 next #5
#      asks for longer training), + guidance {1,2,3,5} sweep.
#   2. fused GN+SiLU+conv Pallas A/B (tools/probe_sweep.py base / gn_conv;
#      VERDICT r4 next #8 — kernel landed in session b, measurement wiped
#      twice by host re-images).
#   3. local bench insurance record (the driver also runs bench.py at
#      round end, so this is skipped when the window is tight).
# Usage: END_BUDGET=<epoch> nohup sh tools/post_harvest_r5d.sh &
set -ux
cd "$(dirname "$0")/.."
SESSION_LOG=outputs/session_r5c.log
END_BUDGET=${END_BUDGET:?epoch when chip work must stop}
CFG=drivescenegen_tpu/configs/config5_cond_128n.yaml
RAS=outputs/cond128n/ras/GT_70k_s80_dxdy_agents_img
HELD=outputs/cond128n/heldout_ras/GT_70k_s80_dxdy_agents_img

WAITED=0
until grep -q "tools/harvest_r5c.sh finished" "$SESSION_LOG" 2>/dev/null; do
    [ "$WAITED" -ge 9000 ] && { echo "post_harvest_r5d: harvest timeout"; exit 1; }
    sleep 60
    WAITED=$((WAITED + 60))
done
echo "post_harvest_r5d: chip free at $(date -u +%FT%TZ)"

# 1. Config-5 retrain: wait (bounded) for the host-side data prep that
#    launched in parallel with the flagship training.
WAITED=0
until [ -f "$RAS/.raster_done" ] && [ -f "$HELD/.raster_done" ]; do
    [ "$WAITED" -ge 2400 ] && break
    sleep 60
    WAITED=$((WAITED + 60))
done

NOW=$(date +%s)
STEPS=$(( (END_BUDGET - NOW - 2400) * 11 ))
[ "$STEPS" -gt 25000 ] && STEPS=25000
if [ "$STEPS" -ge 12000 ] && [ -f "$RAS/.raster_done" ] \
        && [ ! -d outputs/cond128n/model/params ]; then
    echo "post_harvest_r5d: config-5 retrain, max_steps=$STEPS"
    setsid timeout $(( STEPS / 9 + 900 )) python -m drivescenegen_tpu.scripts.train \
        --cfg_file "$CFG" --max_steps "$STEPS" --supervise 3 \
        > outputs/cond128n/train.log 2>&1
    echo "post_harvest_r5d: config-5 train rc=$? at $(date -u +%FT%TZ)"
else
    echo "post_harvest_r5d: skipping config-5 train (STEPS=$STEPS)"
fi
if [ -d outputs/cond128n/model/params ] && [ -f "$HELD/.raster_done" ] \
        && [ ! -f outputs/cond128n/cfg_eval.json ]; then
    timeout 1500 python -m drivescenegen_tpu.scripts.eval_cond_agents \
        --cfg_file "$CFG" --raster_dir "$HELD" \
        --guidance 1,2,3,5 --num 128 \
        --json_out outputs/cond128n/cfg_eval.json \
        > outputs/cond128n/cfg_eval.log 2>&1
    tail -8 outputs/cond128n/cfg_eval.log
fi

# 2. Fused GN+SiLU+conv A/B.
NOW=$(date +%s)
if [ $(( END_BUDGET - NOW )) -ge 1000 ]; then
    timeout 700 python tools/probe_sweep.py base \
        > outputs/probe_base_r5.log 2>&1
    tail -2 outputs/probe_base_r5.log
    timeout 700 python tools/probe_sweep.py gn_conv \
        > outputs/probe_gnconv_r5.log 2>&1
    tail -2 outputs/probe_gnconv_r5.log
fi

# 3. Local bench insurance (driver runs its own at round end).
NOW=$(date +%s)
if [ $(( END_BUDGET - NOW )) -ge 600 ]; then
    timeout $(( END_BUDGET - NOW )) python bench.py | tee BENCH_local_r5.json
fi
echo "post_harvest_r5d done at $(date -u +%FT%TZ)"
