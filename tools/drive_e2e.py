"""Manual CPU drive of the fused generation+vectorization pipeline on a
tiny 1-step-trained model (file-based __main__ so spawn workers can
re-import safely)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

if __name__ == "__main__":
    wd = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_drive"
    import os

    os.makedirs(f"{wd}/imgs", exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)).save(
            f"{wd}/imgs/{i}.png"
        )
    with open(f"{wd}/cfg.yaml", "w") as f:
        f.write(
            "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
            "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
            "  dtype: float32\n"
            f"train:\n  batch_size: 4\n  output_dir: {wd}/out\n"
            f"  dataset_glob: '{wd}/imgs/*.png'\n  ema_decay: 0.0\n"
        )
    from drivescenegen_tpu.scripts import end_to_end, train

    train.main(["--cfg_file", f"{wd}/cfg.yaml", "--max_steps", "1"])
    end_to_end.main([
        "--cfg_file", f"{wd}/cfg.yaml", "--model_dir", f"{wd}/out",
        "--output_dir", f"{wd}/e2e", "--num_scenes", "5", "--batch_size", "2",
        "--steps", "2", "--n_workers", "2",
    ])
    import glob
    import json

    pngs = glob.glob(f"{wd}/e2e/diffusion/*.png")
    stats = json.load(open(f"{wd}/e2e/vectorization_stats.json"))
    print(f"DRIVE RESULT: {len(pngs)} pngs, stats={stats}")
    assert len(pngs) == 5 and stats["n_images"] == 5
    assert stats["n_ok"] + stats["n_rejected"] + stats["n_failed"] == 5
    print("DRIVE OK")
