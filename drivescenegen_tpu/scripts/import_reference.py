"""Import a reference diffusers UNet2DModel checkpoint for TPU sampling.

The reference publishes its trained model via DDPMPipeline.save_pretrained
(reference: pipeline/training_pipeline.py:106-107) — config.json +
diffusion_pytorch_model.safetensors/.bin. This CLI converts that directory
into this repo's model_dir layout (config.yaml + orbax params export), after
which every downstream stage works unchanged:

  python -m drivescenegen_tpu.scripts.import_reference \
      --src /path/to/model_dxdy_agents_256_s80/unet \
      --dst ./outputs/imported_reference
  python -m drivescenegen_tpu.scripts.generation \
      --model_dir ./outputs/imported_reference ...

The imported config pins torch_pad_downsample=True and the diffusers
attention_head_dim so the flax forward reproduces the torch forward
numerically (tests/test_import_diffusers.py pins eps-parity against a
pure-torch replica of the reference architecture).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="diffusers -> flax import")
    parser.add_argument("--src", required=True,
                        help="diffusers UNet2DModel dir (or pipeline dir "
                             "containing unet/)")
    parser.add_argument("--dst", required=True,
                        help="output model_dir (config.yaml + params/)")
    args = parser.parse_args(argv)

    import jax

    # Import/export is pure host work; never touch (or wait on) the TPU.
    jax.config.update("jax_platforms", "cpu")

    from drivescenegen_tpu.config import load_config, save_config
    from drivescenegen_tpu.models.import_diffusers import import_unet2d
    from drivescenegen_tpu.training.checkpoint import save_params_only

    model_cfg, params = import_unet2d(args.src)

    os.makedirs(args.dst, exist_ok=True)
    cfg = load_config(None)
    cfg.model = model_cfg
    save_config(cfg, os.path.join(args.dst, "config.yaml"))
    save_params_only(args.dst, params)

    import numpy as np

    n = sum(int(np.prod(np.shape(p))) for p in jax.tree.leaves(params))
    print(f"imported {n:,} parameters from {args.src} -> {args.dst}")
    print("sample with: python -m drivescenegen_tpu.scripts.generation "
          f"--model_dir {args.dst}")


if __name__ == "__main__":
    main()
