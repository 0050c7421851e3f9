#!/bin/sh
# Mid-run pairing probe for the round-5 flagship fine-tune: every 10 min,
# run the raster-level two-way-pair probe (tools/raster_pair_probe.py) over
# the trainer's per-epoch eval samples (outputs/flagship/model_r5/samples/)
# against the 140k GT rasters. Host-side, niced — never touches the chip.
# Reference signal: GT paired-pixel fraction ~0.75, r4 model ~0.056; any
# sustained move toward GT is the rot180-augmentation verdict arriving
# hours before the harvest.
set -u
cd "$(dirname "$0")/.."

GT=${RAS_DIR:-outputs/flagship/ras80k/GT_70k_s80_dxdy_agents_img}
[ -d "$GT" ] || GT=outputs/flagship/ras140k/GT_70k_s80_dxdy_agents_img
SAMPLES=outputs/flagship/model_r5/samples
LOG=outputs/flagship/pairing_probe_r5.log

while :; do
    N=$(ls "$SAMPLES" 2>/dev/null | grep -c '\.png$')
    if [ "$N" -gt 0 ]; then
        {
            echo "=== $(date -u +%FT%TZ) n_samples=$N"
            nice -n 15 python tools/raster_pair_probe.py "$GT" "$SAMPLES" 16 \
                2>&1 | tail -3
        } >> "$LOG"
    fi
    sleep 600
done
