"""Fused stage 1b+2: sample scene rasters on the TPU while host workers
vectorize finished batches CONCURRENTLY.

The reference runs scripts/generation.py to completion, then
scripts/vectorization.py — a serial GPU-then-CPU pipeline. Here the two
stages overlap: per batch N the sampler for batch N+1 is dispatched first
(async), then the host blocks on batch N's pixels, saves PNGs, runs one
batched TPU skeletonization call (queued on the device behind the sampler,
so the chip never idles), and enqueues the irregular per-image graph passes
to spawned CPU workers. End-to-end wall clock for 5k scenes is therefore
~max(sampling, vectorization) + one batch tail, instead of their sum.

Artifacts match the two-stage path bit for bit: PNGs are quantized before
the lane mask is computed, so the skeletons equal what vectorization.py
would derive from the saved files.

  python -m drivescenegen_tpu.scripts.end_to_end --model_dir <dir> \
      --output_dir <dir> --num_scenes 5000 --n_workers 2
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import queue
import time

import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import load_config
from drivescenegen_tpu.diffusion import ddim_sample, ddpm_sample
from drivescenegen_tpu.utils.logging import get_logger

logger = get_logger("end_to_end")

# Worker-process state, set once by the pool initializer (spawn context:
# module globals, not closures, so they pickle).
_POOL_STATE: dict = {}


def _pool_init(vcfg, dirs):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    _POOL_STATE["vcfg"] = vcfg
    _POOL_STATE["dirs"] = dirs


def _pool_entry(job):
    img_id, path, skel = job
    from drivescenegen_tpu.scripts.vectorization import process_one

    return process_one(img_id, path, skel, _POOL_STATE["vcfg"], _POOL_STATE["dirs"])


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fused generation+vectorization")
    parser.add_argument("--cfg_file", default=None, type=str)
    parser.add_argument("--model_dir", default=None, type=str)
    parser.add_argument("--output_dir", required=True, type=str)
    parser.add_argument("--num_scenes", default=5000, type=int)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--sampler", default="ddim", choices=["ddpm", "ddim"])
    parser.add_argument("--steps", default=0, type=int)
    parser.add_argument("--eta", default=None, type=float,
                        help="DDIM stochasticity (see generation --eta)")
    parser.add_argument("--spacing", default="leading",
                        choices=["leading", "trailing"],
                        help="DDIM timestep spacing (see generation --spacing)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--n_workers", default=2, type=int)
    args = parser.parse_args(argv)

    from drivescenegen_tpu.ops.morphology import skeletonize_batch
    from drivescenegen_tpu.scripts.generation import load_model_for_sampling
    from drivescenegen_tpu.utils.profiling import enable_compilation_cache
    from drivescenegen_tpu.vectorize.image_utils import get_lane_mask

    enable_compilation_cache()

    cfg = load_config(args.cfg_file)
    vcfg = cfg.vectorize
    # The fused drain path (PNG encode + lane-mask channel indexing) only
    # handles unconditional 3-channel models; fail fast for others (they go
    # through the two-stage generation -> vectorization CLIs instead).
    if cfg.model.out_channels != 3 or cfg.model.cond_channels != 0:
        raise SystemExit(
            "end_to_end supports unconditional 3-channel models only "
            f"(got out_channels={cfg.model.out_channels}, "
            f"cond_channels={cfg.model.cond_channels}); use "
            "scripts.generation + scripts.vectorization for this model."
        )
    model, schedule, params = load_model_for_sampling(
        cfg, args.model_dir or cfg.generation.model_dir
    )
    res = cfg.model.sample_size
    batch = args.batch_size
    steps = args.steps or (
        cfg.generation.ddim_steps if args.sampler == "ddim"
        else cfg.generation.num_inference_steps
    )

    out_dir = args.output_dir
    png_dir = os.path.join(out_dir, "diffusion")
    dirs = tuple(
        os.path.join(out_dir, d)
        for d in ("vectorized", "vectorized_pics", "graph", "agent")
    )
    for d in (png_dir, *dirs):
        os.makedirs(d, exist_ok=True)

    def denoise(x, t):
        return model.apply(params, x, t)

    if args.sampler == "ddim":
        import functools

        eta = args.eta if args.eta is not None else cfg.generation.ddim_eta
        fn = functools.partial(ddim_sample, eta=eta, spacing=args.spacing)
    else:
        fn = ddpm_sample
    shape = (batch, res, res, cfg.model.out_channels)

    @jax.jit
    def run(key):
        # Quantize to uint8 ON DEVICE: the samples leave the chip 4x
        # smaller, which matters on a narrow device link (measured ~6 MB/s
        # here — a float32 batch costs ~1 s of D2H per 8 scenes).
        x = fn(denoise, schedule, shape, key, steps)
        return jnp.round(jnp.clip(x / 2 + 0.5, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    # Host workers (spawn, TPU-plugin env scrubbed — see vectorization.main).
    saved_env = {}
    for var in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS"):
        saved_env[var] = os.environ.pop(var, None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        ctx = multiprocessing.get_context("spawn")
        pool = ctx.Pool(
            max(1, args.n_workers), initializer=_pool_init, initargs=(vcfg, dirs)
        )
    finally:
        for var, val in saved_env.items():
            if val is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = val

    # Jobs flow through a blocking queue; Pool.imap's task-handler thread
    # consumes the generator, so the main thread never blocks on dispatch.
    job_q: queue.Queue = queue.Queue()

    def jobs():
        while True:
            item = job_q.get()
            if item is None:
                return
            yield item

    results = pool.imap_unordered(_pool_entry, jobs(), chunksize=1)

    from PIL import Image

    n_enqueued = 0

    def drain(num: int, imgs) -> None:
        """Block on batch `num`'s pixels, save PNGs, skeletonize on-device,
        hand the graph passes to the workers."""
        nonlocal n_enqueued
        quant = np.asarray(imgs)  # uint8 straight off the device
        keep = min(batch, args.num_scenes - num * batch)
        quant = quant[:keep]
        # Lane masks from the QUANTIZED pixels (identical to reloading the
        # PNG, so skeletons match the two-stage path bit for bit).
        masks = np.stack(
            [get_lane_mask(q.astype(np.float32) / 255.0).T for q in quant]
        )
        if masks.shape[0] < batch:  # pad: one compiled executable for all
            masks = np.concatenate(
                [masks, np.zeros((batch - masks.shape[0], *masks.shape[1:]), bool)]
            )
        skel_dev = skeletonize_batch(jnp.asarray(masks))  # queued behind sampler
        paths = []
        for i in range(keep):
            p = os.path.join(png_dir, f"loop_{num:03d}_batch_{i:03d}.png")
            Image.fromarray(quant[i]).save(p)
            paths.append(p)
        skels = np.asarray(skel_dev)[:keep]
        for i, p in enumerate(paths):
            job_q.put((num * batch + i, p, skels[i]))
            n_enqueued += 1

    t0 = time.perf_counter()
    n_batches = (args.num_scenes + batch - 1) // batch
    pending = None
    for num in range(n_batches):
        current = (num, run(jax.random.fold_in(jax.random.key(args.seed), num)))
        if pending is not None:
            drain(*pending)
        pending = current
        if num == 0:
            current[1].block_until_ready()
            logger.info(
                f"first batch ({batch}) in {time.perf_counter() - t0:.1f}s "
                f"incl. compile"
            )
    drain(*pending)
    sampling_wall = time.perf_counter() - t0
    logger.info(
        f"sampling done: {n_enqueued} scenes in {sampling_wall:.1f}s "
        f"({n_enqueued / sampling_wall:.2f} scenes/s) — waiting for workers"
    )

    job_q.put(None)
    pool.close()
    counts = {"n_ok": 0, "n_rejected": 0, "n_failed": 0}
    for r in results:
        counts[f"n_{r}"] += 1
    pool.join()
    total_wall = time.perf_counter() - t0

    stats = {
        "n_images": n_enqueued,
        **counts,
        "sampling_wall_s": round(sampling_wall, 1),
        "wall_time_s": round(total_wall, 1),
        "scenes_per_s": round(n_enqueued / total_wall, 2),
        "sampler": f"{args.sampler}-{steps}",
        "batch_size": batch,
        "n_workers": args.n_workers,
    }
    # Same filename/keys as vectorization.py so compute_map_metrics picks up
    # the survivorship accounting unchanged.
    with open(os.path.join(out_dir, "vectorization_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(
        f"end-to-end: {n_enqueued} scenes sampled+vectorized in {total_wall:.1f}s "
        f"({n_enqueued / total_wall:.2f} scenes/s) "
        f"[ok {counts['n_ok']}, rejected {counts['n_rejected']}, "
        f"failed {counts['n_failed']}] -> {out_dir}"
    )


if __name__ == "__main__":
    main()
