#!/bin/sh
# Rebuild the round-3 data artifacts from scratch after a host re-image
# (outputs/ is untracked and was wiped with the VM). Stages are idempotent:
# each skips itself when its output already exists. Run from the repo root:
#
#   sh tools/rebuild_r3_data.sh && <launch training + watcher>
#
# Products:
#   outputs/flagship/pre/            40k training scenario pickles (seeds 0-39999, rich)
#   outputs/flagship/ras/GT_70k_s80_dxdy_agents_img/   40k 256x256 rasters (7.9 GB as uint8 -> device-resident)
#   outputs/flagship/pre_heldout/    4k held-out pickles (seeds 100000-103999)
#   outputs/cond128/heldout_ras/GT_70k_s80_dxdy_agents_img/  held-out rasters (config-5 eval + roundtrip)
#   outputs/flagship/gt/graph/       2k GT graphs (metrics GT side)
#   outputs/flagship/gt_b/graph/     2k disjoint GT graphs (noise-floor row)
set -eu
cd "$(dirname "$0")/.."

N_TRAIN=40000
N_HELD=4000
HELD_OFFSET=100000

if [ ! -f outputs/flagship/pre/processed_scenarios_20s.pkl ] || \
   [ "$(ls outputs/flagship/pre | wc -l)" -lt "$N_TRAIN" ]; then
  python -m drivescenegen_tpu.scripts.data_preprocess \
      --synthetic "$N_TRAIN" --synthetic_rich \
      --save_path outputs/flagship/pre
fi

if [ "$(ls outputs/flagship/ras/GT_70k_s80_dxdy_agents_img 2>/dev/null | wc -l)" -lt "$N_TRAIN" ]; then
  python -m drivescenegen_tpu.scripts.data_rasterization \
      --load_path outputs/flagship/pre \
      --save_path outputs/flagship/ras --n_workers 4 --save_sidecar
fi

if [ ! -f outputs/flagship/pre_heldout/processed_scenarios_20s.pkl ] || \
   [ "$(ls outputs/flagship/pre_heldout | wc -l)" -lt "$N_HELD" ]; then
  python -m drivescenegen_tpu.scripts.data_preprocess \
      --synthetic "$N_HELD" --synthetic_rich --synthetic_offset "$HELD_OFFSET" \
      --save_path outputs/flagship/pre_heldout
fi

if [ "$(ls outputs/cond128/heldout_ras/GT_70k_s80_dxdy_agents_img 2>/dev/null | wc -l)" -lt "$N_HELD" ]; then
  python -m drivescenegen_tpu.scripts.data_rasterization \
      --load_path outputs/flagship/pre_heldout \
      --save_path outputs/cond128/heldout_ras --n_workers 4
fi

# GT graphs for the metrics protocol: two disjoint 2k splits of the held-out
# seeds (gt = metrics GT side; gt_b = the noise-floor comparison row).
if [ "$(ls outputs/flagship/gt/graph 2>/dev/null | wc -l)" -lt 2000 ] || \
   [ "$(ls outputs/flagship/gt_b/graph 2>/dev/null | wc -l)" -lt 2000 ]; then
  python - <<'EOF'
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

echo "rebuild_r3_data: all artifacts present"
