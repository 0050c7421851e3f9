#!/bin/sh
# Recompute the two metric calibration rows host-side (no chip):
#   - noise floor: gt vs gt_b (2k vs 2k disjoint held-out GT splits)
#   - roundtrip ceiling: gt graphs vs graphs vectorized from the SAME 2k
#     held-out scenes' rasters (the ceiling any model's samples can reach
#     under the raster->vectorize protocol)
# Needed fresh in round 4 because the stat schema gained OrientationR.
# Waits for the 70k sidecar stitch to finish first so the two CPU-heavy
# jobs don't compete on the 1-core host; runs under nice so the trainer's
# hybrid streaming keeps priority. Idempotent.
set -u
cd "$(dirname "$0")/.."

HELD=outputs/cond128/heldout_ras/GT_70k_s80_dxdy_agents_img
RT_IN=outputs/flagship/roundtrip_in
RT=outputs/flagship/roundtrip

hb() { echo "$(date -u +%FT%TZ) calibration: $*"; }

stitch_done() {
    grep -q "rebuild_w30k: DONE" outputs/rebuild_w30k.log 2>/dev/null && return 0
    # session_r4b rebuild path: the stitched 70k sidecar existing IS done.
    ls outputs/flagship/ras70k/GT_70k_s80_dxdy_agents_img/.devcache_*.npy \
        >/dev/null 2>&1
}

WAITED=0
until stitch_done; do
    [ "$WAITED" -ge 5400 ] && { hb "stitch never finished; proceeding anyway"; break; }
    sleep 60; WAITED=$((WAITED + 60))
done

# The gt split = first 2000 sorted held-out pickles; rasterization with W
# round-robin workers named global scene k as "{k%W}_{k//W}.png". Detect W
# from the prefixes actually on disk (the r4b rebuild used 2 workers where
# an earlier pass used 4 — assuming 4 left 1000 dangling links and halved
# the ceiling sample).
if [ "$(find "$RT_IN" -xtype l 2>/dev/null | wc -l)" -gt 0 ]; then
    hb "removing dangling roundtrip links from a wrong worker-count guess"
    find "$RT_IN" -xtype l -delete
fi
if [ "$(ls "$RT_IN" 2>/dev/null | wc -l)" -lt 2000 ]; then
    hb "building roundtrip input links"
    mkdir -p "$RT_IN"
    W=$(ls "$HELD" | sed 's/_.*//' | sort -u | wc -l)
    hb "detected $W rasterization workers"
    k=0
    while [ "$k" -lt 2000 ]; do
        p=$((k % W)); j=$((k / W))
        ln -sf "../../../$HELD/${p}_${j}.png" "$RT_IN/${p}_${j}.png"
        k=$((k + 1))
    done
fi

if [ "$(ls "$RT/graph" 2>/dev/null | wc -l)" -lt 2000 ]; then
    hb "vectorizing 2000 GT rasters (CPU, niced)"
    JAX_PLATFORMS=cpu nice -n 19 python -m drivescenegen_tpu.scripts.vectorization \
        --load_path "$RT_IN" --save_path "$RT" \
        --no_device_skeleton --n_workers 2 2>&1 | tail -3
fi

if [ ! -f outputs/flagship/metrics_roundtrip_r4.json ]; then
    hb "roundtrip ceiling row"
    nice -n 19 python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir "$RT" \
        --json_out outputs/flagship/metrics_roundtrip_r4.json \
        > outputs/flagship/metrics_roundtrip_r4.log 2>&1
fi

if [ ! -f outputs/flagship/metrics_noise_floor_r4.json ]; then
    hb "noise floor row"
    nice -n 19 python -m drivescenegen_tpu.scripts.compute_map_metrics \
        --gt_dir outputs/flagship/gt --gen_dir outputs/flagship/gt_b \
        --gen_world_frame \
        --json_out outputs/flagship/metrics_noise_floor_r4.json \
        > outputs/flagship/metrics_noise_floor_r4.log 2>&1
fi

hb "DONE"
