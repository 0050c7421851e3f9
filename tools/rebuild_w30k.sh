#!/bin/sh
# Round-4: stage the 70k-scene corpus (the reference's training scale,
# scripts/train.py:26) while the 40k flagship run keeps the chip busy.
# Host-only — rasterization workers pin themselves to the CPU platform and
# the sidecar stitch never touches a device. Idempotent: each stage skips
# itself when its product exists.
#
#   nohup sh tools/rebuild_w30k.sh > outputs/rebuild_w30k.log 2>&1 &
#
# Products:
#   outputs/flagship/pre_w30k/   30k widened-family pickles (seeds 40000-69999)
#   outputs/flagship/ras_w30k/GT_70k_s80_dxdy_agents_img/  30k 256x256 rasters
#   outputs/flagship/ras70k/GT_70k_s80_dxdy_agents_img/    70k symlink combine
#   <ras70k>/.devcache_<digest>.npy                        13.8 GB sidecar
set -eu
cd "$(dirname "$0")/.."

N=30000
OFFSET=40000
RAS70K=outputs/flagship/ras70k/GT_70k_s80_dxdy_agents_img

if [ "$(ls outputs/flagship/pre_w30k 2>/dev/null | grep -c '^sample_')" -lt "$N" ]; then
  echo "$(date -u +%FT%TZ) rebuild_w30k: preprocessing $N scenes (seeds $OFFSET..)"
  python -m drivescenegen_tpu.scripts.data_preprocess \
      --synthetic "$N" --synthetic_rich --synthetic_offset "$OFFSET" \
      --save_path outputs/flagship/pre_w30k
fi

if [ "$(ls outputs/flagship/ras_w30k/GT_70k_s80_dxdy_agents_img 2>/dev/null | wc -l)" -lt "$N" ]; then
  echo "$(date -u +%FT%TZ) rebuild_w30k: rasterizing"
  python -m drivescenegen_tpu.scripts.data_rasterization \
      --load_path outputs/flagship/pre_w30k \
      --save_path outputs/flagship/ras_w30k --n_workers 4 --save_sidecar
fi

if [ "$(ls "$RAS70K" 2>/dev/null | grep -c '\.png$')" -lt 70000 ]; then
  echo "$(date -u +%FT%TZ) rebuild_w30k: building ras70k symlink combine"
  mkdir -p "$RAS70K"
  # Originals keep their basenames; the widened set gets a "w_" prefix that
  # sorts AFTER "0_".."3_", so sorted(ras70k) = sorted(ras) ++ sorted(ras_w30k)
  # and the sidecar stitch can reuse the 40k rows verbatim.
  for f in outputs/flagship/ras/GT_70k_s80_dxdy_agents_img/*.png; do
    ln -sf "../../../../$f" "$RAS70K/$(basename "$f")"
  done
  for f in outputs/flagship/ras_w30k/GT_70k_s80_dxdy_agents_img/*.png; do
    ln -sf "../../../../$f" "$RAS70K/w_$(basename "$f")"
  done
  echo "$(date -u +%FT%TZ) rebuild_w30k: $(ls "$RAS70K" | grep -c '\.png$') links"
fi

echo "$(date -u +%FT%TZ) rebuild_w30k: stitching 70k sidecar"
python tools/stitch_sidecar70k.py drivescenegen_tpu/configs/flagship_256_r4.yaml

echo "$(date -u +%FT%TZ) rebuild_w30k: DONE"
