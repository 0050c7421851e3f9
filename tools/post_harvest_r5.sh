#!/bin/sh
# Post-harvest chip session (round 5): runs the moment watch_and_harvest_r5
# logs that harvest_r5.sh finished (the chip is then free and warm).
#   1. probe_sweep base + gn_conv — the fused GN+SiLU+conv Pallas A/B
#      (VERDICT r4 next #8; docs/PERF_ANALYSIS.md candidate lever 2).
#   2. stage_microbench — fills the per-op table PERF_ANALYSIS never got.
#   3. If the fused arm wins by >3%, re-run bench with the flag to record
#      the candidate headline next to the default one.
# All output -> outputs/post_harvest_r5.log (driven by session watcher).
set -ux
cd "$(dirname "$0")/.."

SESSION_LOG=outputs/session_r5.log

# Wait (up to 6 h) for the harvest-finished line.
WAITED=0
until grep -q "harvest_r5.sh finished" "$SESSION_LOG" 2>/dev/null; do
    [ "$WAITED" -ge 21600 ] && { echo "post_harvest: timed out"; exit 1; }
    sleep 120
    WAITED=$((WAITED + 120))
done
echo "post_harvest_r5: chip free at $(date -u +%FT%TZ)"

python tools/probe_sweep.py base 2>&1 | tee outputs/probe_base_r5.log
python tools/probe_sweep.py gn_conv 2>&1 | tee outputs/probe_gnconv_r5.log

python tools/stage_microbench.py 8 > outputs/microbench_r5.md 2>&1 || true
tail -5 outputs/microbench_r5.md

BASE=$(grep -o '[0-9.]* scenes/s' outputs/probe_base_r5.log | head -1 | cut -d' ' -f1)
FUSED=$(grep -o '[0-9.]* scenes/s' outputs/probe_gnconv_r5.log | head -1 | cut -d' ' -f1)
echo "post_harvest_r5: base=$BASE fused=$FUSED"
WIN=$(python - "$BASE" "$FUSED" <<'EOF'
import sys
try:
    b, f = float(sys.argv[1]), float(sys.argv[2])
    print("yes" if f > b * 1.03 else "no")
except Exception:
    print("no")
EOF
)
if [ "$WIN" = "yes" ]; then
    DSG_USE_PALLAS_GN_CONV=1 python bench.py | tee BENCH_gnconv_r5.json
fi
echo "post_harvest_r5: done at $(date -u +%FT%TZ)"
