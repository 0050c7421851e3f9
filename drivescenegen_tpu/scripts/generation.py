"""Stage 1b: sample new scene rasters from the trained model
(reference: scripts/generation.py — batch 5 x 20 loops of 750-step DDPM).

TPU-native: the sampling batch is sharded over the mesh "data" axis
(batch-parallel generation over ICI); the sampler is a single lax.scan.
Supports DDPM-750 (reference parity) and DDIM-50 (fast path).

  python -m drivescenegen_tpu.scripts.generation --model_dir <dir> \
      --sampler ddim --steps 50 --batch_size 40 --num_batches 4
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import load_config
from drivescenegen_tpu.diffusion import (
    ddim_sample,
    ddpm_sample,
    dpmpp_2m_sample,
    make_schedule,
)
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.parallel import make_mesh
from drivescenegen_tpu.training.checkpoint import restore_params_only
from drivescenegen_tpu.utils.logging import get_logger

logger = get_logger("generation")


def load_model_for_sampling(cfg, model_dir: str):
    """Build the UNet + schedule and restore exported weights.

    The model/diffusion config sections are spliced from the config saved
    alongside the weights (they must match the checkpoint); everything else
    stays with the caller's cfg. Returns (model, schedule, params); cfg is
    updated in place. Shared by this CLI and scripts/end_to_end.py."""
    model_cfg_path = os.path.join(model_dir, "config.yaml")
    if os.path.exists(model_cfg_path):
        trained = load_config(model_cfg_path)
        cfg.model = trained.model
        cfg.diffusion = trained.diffusion
    model = UNet2D(cfg.model)
    schedule = make_schedule(cfg.diffusion)

    res = cfg.model.sample_size
    template = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, res, res, cfg.model.in_channels)),
            jnp.zeros((1,), jnp.int32),
        )
    )
    # Orbax deserialization needs a concrete sharding per leaf; eval_shape
    # structs carry none (observed failing on the CPU backend). Restore onto
    # the default device — callers re-place params afterwards as needed.
    dev_sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=dev_sharding),
        template,
    )
    try:
        params = restore_params_only(model_dir, template)
    except FileNotFoundError:
        raise SystemExit(
            f"no exported weights under {model_dir}/params — train first "
            f"(scripts.train exports them every save_model_epochs)"
        )
    return model, schedule, params


def main(argv=None):
    parser = argparse.ArgumentParser(description="Scene generation")
    parser.add_argument("--cfg_file", default=None, type=str)
    parser.add_argument("--model_dir", default=None, type=str)
    parser.add_argument("--output_dir", default=None, type=str)
    parser.add_argument("--sampler", default=None,
                        choices=[None, "ddpm", "ddim", "dpm", "sde"])
    parser.add_argument("--steps", default=0, type=int)
    parser.add_argument("--batch_size", default=0, type=int)
    parser.add_argument("--num_batches", default=0, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--eta", default=None, type=float,
                        help="DDIM stochasticity (0 = deterministic; 1 = "
                             "ancestral-strength noise — markedly better for "
                             "briefly-trained models at the same step count)")
    parser.add_argument("--spacing", default=None,
                        choices=[None, "leading", "trailing"],
                        help="timestep spacing; trailing visits t=T-1 "
                             "(better at low step counts, arXiv:2305.08891). "
                             "Default: leading for ddim/ddpm (diffusers "
                             "parity), trailing for dpm")
    parser.add_argument("--cond_dir", default=None, type=str,
                        help="conditional mode: directory of rasters whose R/G "
                             "map channels condition agent generation (config-5)")
    parser.add_argument("--guidance", default=None, type=float,
                        help="classifier-free guidance scale (conditional mode; "
                             "0 = pure unconditional)")
    args = parser.parse_args(argv)

    from drivescenegen_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(args.cfg_file)
    gcfg = cfg.generation
    model_dir = args.model_dir or gcfg.model_dir
    output_dir = args.output_dir or gcfg.output_dir
    sampler = args.sampler or gcfg.sampler
    steps = args.steps or (
        gcfg.ddim_steps if sampler == "ddim"
        else 20 if sampler == "dpm"
        else 25 if sampler == "sde"
        else gcfg.num_inference_steps
    )
    batch_size = args.batch_size or gcfg.batch_size
    num_batches = args.num_batches or gcfg.num_batches
    os.makedirs(output_dir, exist_ok=True)

    # Splice the trained model config early so CLI validation sees it
    # (load_model_for_sampling re-splices; it is idempotent).
    model_cfg_path = os.path.join(model_dir, "config.yaml")
    if os.path.exists(model_cfg_path):
        trained = load_config(model_cfg_path)
        cfg.model = trained.model
    if args.cond_dir is not None and cfg.model.cond_channels <= 0:
        raise SystemExit("--cond_dir given but the model has cond_channels=0")

    model, schedule, params = load_model_for_sampling(cfg, model_dir)
    res = cfg.model.sample_size

    mesh = make_mesh(cfg.mesh)
    n_data = mesh.shape["data"]
    if batch_size % n_data != 0:
        batch_size = max(n_data, (batch_size // n_data) * n_data)
        logger.info(f"rounded batch to {batch_size} (data axis {n_data})")

    shape = (batch_size, res, res, cfg.model.out_channels)
    if sampler == "ddim":
        import functools

        eta = args.eta if args.eta is not None else cfg.generation.ddim_eta
        fn = functools.partial(
            ddim_sample, eta=eta, spacing=args.spacing or "leading"
        )
    elif sampler == "dpm":
        import functools

        # Deterministic second-order solver; trailing spacing unless the
        # user asked otherwise (leading spacing never visits the pure-noise
        # end, which hurts most at DPM's low step counts).
        fn = functools.partial(dpmpp_2m_sample, spacing=args.spacing or "trailing")
    elif sampler == "sde":
        import functools

        from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

        # Stochastic second-order solver: ancestral-quality output (no
        # deterministic-path speckle) at ~4x fewer steps than DDIM eta=1.
        fn = functools.partial(
            dpmpp_2m_sde_sample, spacing=args.spacing or "trailing"
        )
    else:
        fn = ddpm_sample

    # Batch-parallel sampling: constrain the output to be sharded over the
    # "data" axis; XLA propagates the sharding back through the whole scan,
    # so each chip denoises its slice of the batch independently over ICI.
    from drivescenegen_tpu.parallel import batch_sharding

    conditional = args.cond_dir is not None
    if conditional:
        from drivescenegen_tpu.data.dataset import load_image
        from drivescenegen_tpu.diffusion.cfg import make_guided_denoise

        cond_files = sorted(glob.glob(os.path.join(args.cond_dir, "*.png")))
        if not cond_files:
            raise SystemExit(f"no cond rasters under {args.cond_dir}")
        guidance = (
            args.guidance if args.guidance is not None
            else cfg.generation.guidance_scale
        )

        def run(key, cond):
            denoise = make_guided_denoise(model.apply, params, cond, guidance)
            return fn(denoise, schedule, shape, key, steps)

        run = jax.jit(run, out_shardings=batch_sharding(mesh, 4))

        def cond_batch(num):
            sel = [cond_files[(num * batch_size + i) % len(cond_files)]
                   for i in range(batch_size)]
            maps = np.stack([load_image(p, res)[..., : cfg.model.cond_channels]
                             for p in sel])
            return jnp.asarray((maps - 0.5) / 0.5)
    else:
        def denoise(x, t):
            return model.apply(params, x, t)

        run_uncond = jax.jit(
            lambda key: fn(denoise, schedule, shape, key, steps),
            out_shardings=batch_sharding(mesh, 4),
        )

    from PIL import Image

    def dispatch(num):
        key = jax.random.fold_in(jax.random.key(args.seed), num)
        if conditional:
            cond = cond_batch(num)
            return run(key, cond), cond
        return run_uncond(key), None

    def save(num, imgs, cond):
        # np.asarray blocks on this batch only; the next batch is already
        # dispatched, so device compute overlaps PNG encoding on the host.
        arr01 = np.clip(np.asarray(imgs) / 2 + 0.5, 0.0, 1.0)
        if cond is not None:
            cond01 = np.clip(np.asarray(cond) / 2 + 0.5, 0.0, 1.0)
            arr01 = np.concatenate([cond01, arr01], axis=-1)  # map R/G + agent B
        for i in range(arr01.shape[0]):
            # round (not truncate) to match the fused pipeline's on-device
            # quantization (end_to_end.py run()) bit for bit.
            Image.fromarray(np.round(arr01[i] * 255).astype(np.uint8)).save(
                os.path.join(output_dir, f"loop_{num:03d}_batch_{i:03d}.png")
            )
        return arr01.shape[0]

    total = 0
    t0 = time.perf_counter()
    pending = None
    for num in range(num_batches):
        current = (num, *dispatch(num))
        if pending is not None:
            total += save(*pending)
        pending = current
        if num == 0:
            current[1].block_until_ready()
            dt0 = time.perf_counter() - t0
            logger.info(f"first batch ({batch_size}) in {dt0:.1f}s incl. compile")
    if pending is not None:
        total += save(*pending)
    dt = time.perf_counter() - t0
    mode = f"cfg(g={guidance})" if conditional else "uncond"
    logger.info(
        f"generated {total} scenes with {sampler}-{steps} {mode} in {dt:.1f}s "
        f"({total/dt:.2f} scenes/s)"
    )


if __name__ == "__main__":
    main()
