#!/bin/bash
# Round-4 config-5 fix: rebuild the conditional model on NATIVELY
# rasterized 128px data and rerun the guidance sweep.
#
# Why: the harvest's cfg_eval.json came back all-zeros with n_gt_agents=0 —
# the 256->128 bilinear downscale in the original recipe destroys the agent
# channel relative to the extractor's gates (a perfect generator roundtrip
# scores 0/89). Native 128px analytic rasterization keeps agents crisp and
# extractable (19 vs 18 agents over 8 scenes, 17 cross-matched at 3 m).
#
# Each step is idempotent (skips if its artifact exists) so a crashed run
# can simply be relaunched.
set -u
cd /root/repo

log() { echo "$(date -u +%FT%TZ) cond128n: $*"; }

RAS=outputs/cond128n/ras/GT_70k_s80_dxdy_agents_img
HELD=outputs/cond128n/heldout_ras/GT_70k_s80_dxdy_agents_img
CFG=drivescenegen_tpu/configs/config5_cond_128n.yaml

if [ ! -f "$RAS/.raster_done" ]; then
  log "rasterizing 40k training scenes at native 128"
  timeout 1800 python -m drivescenegen_tpu.scripts.data_rasterization \
      --load_path outputs/flagship/pre --save_path outputs/cond128n/ras \
      --cfg_file "$CFG" --n_workers 8 --save_sidecar \
    || { log "ERROR: training rasterization failed rc=$?"; exit 1; }
  touch "$RAS/.raster_done"
fi

if [ ! -f "$HELD/.raster_done" ]; then
  log "rasterizing 4k held-out scenes at native 128"
  timeout 600 python -m drivescenegen_tpu.scripts.data_rasterization \
      --load_path outputs/flagship/pre_heldout \
      --save_path outputs/cond128n/heldout_ras \
      --cfg_file "$CFG" --n_workers 8 \
    || { log "ERROR: held-out rasterization failed rc=$?"; exit 1; }
  touch "$HELD/.raster_done"
fi

if [ ! -d outputs/cond128n/model/params ]; then
  log "training config-5 native-128: 20k steps"
  setsid python -m drivescenegen_tpu.scripts.train \
      --cfg_file "$CFG" --max_steps 20000 --supervise 4 2>&1 | tail -5
fi
[ -d outputs/cond128n/model/params ] \
  || { log "ERROR: training produced no params export"; exit 1; }

if [ ! -f outputs/cond128n/cfg_eval.json ]; then
  log "guidance sweep {1,2,3,5} x 128 held-out scenes"
  timeout 1800 python -m drivescenegen_tpu.scripts.eval_cond_agents \
      --cfg_file "$CFG" --raster_dir "$HELD" \
      --guidance 1,2,3,5 --num 128 \
      --json_out outputs/cond128n/cfg_eval.json 2>&1 | tail -8
fi
log "DONE"
