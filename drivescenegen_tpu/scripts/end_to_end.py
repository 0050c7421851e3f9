"""Fused stage 1b+2: sample scene rasters on the TPU while host workers
vectorize finished batches CONCURRENTLY.

The reference runs scripts/generation.py to completion, then
scripts/vectorization.py — a serial GPU-then-CPU pipeline. Here the two
stages overlap, and the per-batch device work is ONE jitted call: sample,
quantize to uint8, lane-mask (ops/lane_mask.py — integer-exact vs the host
path), skeletonize, and bit-pack the skeletons. Per batch N the call for
batch N+1 is dispatched first (async), then the host copies batch N's
(pixels, packed skeletons) off the device — ~1.6 MB per 8 scenes on the
narrow link — and enqueues the irregular per-image graph passes (plus the
PNG encode) to spawned CPU workers. End-to-end wall clock for 5k scenes is
therefore ~max(sampling+skeletonize, host vectorization) + one batch tail,
instead of their sum. (An earlier revision computed masks on host and
shipped them BACK to the chip for skeletonization, and blocked each drain
on a skeletonize queued behind the next batch's full sampler — measured
3.2 scenes/s against the sampler's own 6.15.)

Artifacts match the two-stage path bit for bit: PNGs are quantized before
the lane mask is computed, the device mask is integer-exact against
get_lane_mask (tests/test_lane_mask_device.py), so the skeletons equal what
vectorization.py would derive from the saved files.

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
from drivescenegen_tpu.diffusion import ddim_sample, ddpm_sample, dpmpp_2m_sample
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
    img_id, path, skel, pixels = job
    from drivescenegen_tpu.scripts.vectorization import process_one

    if pixels is not None:
        # PNG encode happens here, off the sampler loop's critical path.
        from PIL import Image

        Image.fromarray(pixels).save(path)
    return process_one(img_id, path, skel, _POOL_STATE["vcfg"], _POOL_STATE["dirs"])


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fused generation+vectorization")
    parser.add_argument("--cfg_file", default=None, type=str)
    parser.add_argument("--model_dir", default=None, type=str)
    parser.add_argument("--output_dir", required=True, type=str)
    parser.add_argument("--num_scenes", default=5000, type=int)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--sampler", default="ddim",
                        choices=["ddpm", "ddim", "dpm", "sde"])
    parser.add_argument("--steps", default=0, type=int)
    parser.add_argument("--eta", default=None, type=float,
                        help="DDIM stochasticity (see generation --eta)")
    parser.add_argument("--spacing", default=None,
                        choices=["leading", "trailing"],
                        help="DDIM timestep spacing (see generation --spacing)")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--n_workers", default=2, type=int)
    parser.add_argument("--resume", action="store_true",
                        help="skip sampling for batches whose PNGs are all "
                             "on disk (crash recovery for long runs); their "
                             "images are still vectorized, so the stats "
                             "stay complete")
    args = parser.parse_args(argv)

    from drivescenegen_tpu.ops.lane_mask import lane_mask_batch
    from drivescenegen_tpu.ops.morphology import skeletonize_batch
    from drivescenegen_tpu.scripts.generation import load_model_for_sampling
    from drivescenegen_tpu.utils.profiling import enable_compilation_cache

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
        else 20 if args.sampler == "dpm"
        else 25 if args.sampler == "sde"
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

    import functools

    if args.sampler == "ddim":
        eta = args.eta if args.eta is not None else cfg.generation.ddim_eta
        fn = functools.partial(
            ddim_sample, eta=eta, spacing=args.spacing or "leading"
        )
    elif args.sampler == "dpm":
        fn = functools.partial(
            dpmpp_2m_sample, spacing=args.spacing or "trailing"
        )
    elif args.sampler == "sde":
        from drivescenegen_tpu.diffusion import dpmpp_2m_sde_sample

        # Stochastic second-order solver: ancestral-quality output (no
        # deterministic-path speckle) at ~4x fewer steps than DDIM eta=1.
        fn = functools.partial(
            dpmpp_2m_sde_sample, spacing=args.spacing or "trailing"
        )
    else:
        fn = ddpm_sample

    # Batch-parallel over the data mesh axis, exactly like scripts.generation:
    # constraining the outputs propagates the sharding back through the scan,
    # so each chip samples+skeletonizes its slice of the batch. Keeping the
    # two paths' compiled programs identical is also what makes their PNGs
    # byte-identical (tests/test_cli.py::test_fused_and_two_stage_paths...).
    from drivescenegen_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh(cfg.mesh)
    n_data = mesh.shape["data"]
    if batch % n_data != 0:
        batch = max(n_data, (batch // n_data) * n_data)
        logger.info(f"rounded batch to {batch} (data axis {n_data})")
    shape = (batch, res, res, cfg.model.out_channels)

    _BIT_W = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)

    @functools.partial(
        jax.jit,
        out_shardings=(batch_sharding(mesh, 4), batch_sharding(mesh, 3)),
    )
    def run(key):
        # The whole per-batch device pipeline in one call. Quantize to uint8
        # on device (samples leave the chip 4x smaller — the link sustains
        # ~6 MB/s), lane-mask with the integer-exact kernel, skeletonize,
        # and bit-pack the skeletons 8x (np.unpackbits on the host side).
        x = fn(denoise, schedule, shape, key, steps)
        q = jnp.round(jnp.clip(x / 2 + 0.5, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        # transpose(0,2,1) mirrors the host path's get_lane_mask(...).T
        # ([x][y]-indexed skeletons).
        return q, _skel_pack(q)

    def _skel_pack(q):
        skel = skeletonize_batch(lane_mask_batch(q).transpose(0, 2, 1))
        bsz, sh, sw = skel.shape
        return jnp.sum(
            skel.reshape(bsz, sh, sw // 8, 8).astype(jnp.uint8) * _BIT_W,
            axis=-1,
            dtype=jnp.uint8,
        )

    # Crash recovery: a batch whose PNGs are all on disk skips the sampler —
    # pixels reload from the files (byte-identical by the determinism the
    # parity test pins) and only the cheap mask+skeleton call runs on device.
    skel_only = jax.jit(_skel_pack, out_shardings=batch_sharding(mesh, 3))

    def try_resume(num: int):
        if not args.resume:
            return None
        keep = min(batch, args.num_scenes - num * batch)
        from PIL import Image

        pixels = []
        try:
            for i in range(keep):
                p = os.path.join(png_dir, f"loop_{num:03d}_batch_{i:03d}.png")
                pixels.append(np.asarray(Image.open(p).convert("RGB")))
        except (OSError, ValueError):
            return None  # missing/truncated/wrong-size: resample this batch
        q = np.stack(pixels)
        if q.shape[1:] != (res, res, 3):
            return None  # stale files from a different-resolution run
        if q.shape[0] < batch:  # pad: one compiled executable for all batches
            q = np.concatenate(
                [q, np.zeros((batch - q.shape[0], *q.shape[1:]), np.uint8)]
            )
        return q, skel_only(jnp.asarray(q))

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

    n_enqueued = 0

    def drain(num: int, handles, resumed: bool = False) -> None:
        """Copy batch `num`'s (pixels, packed skeletons) off the device —
        both were computed inside run() — and hand PNG encode + graph passes
        to the workers. Resumed batches already have their PNGs on disk, so
        workers get pixels=None and read the files."""
        nonlocal n_enqueued
        quant, packed = (np.asarray(h) for h in handles)
        skels = np.unpackbits(packed, axis=-1).astype(bool)
        keep = min(batch, args.num_scenes - num * batch)
        for i in range(keep):
            p = os.path.join(png_dir, f"loop_{num:03d}_batch_{i:03d}.png")
            job_q.put((num * batch + i, p, skels[i],
                       None if resumed else quant[i]))
            n_enqueued += 1

    t0 = time.perf_counter()
    n_batches = (args.num_scenes + batch - 1) // batch
    pending = None
    n_resumed = 0
    try:
        for num in range(n_batches):
            r = try_resume(num)
            if r is not None:
                n_resumed += 1
            current = (
                num,
                r if r is not None
                else run(jax.random.fold_in(jax.random.key(args.seed), num)),
                r is not None,
            )
            if pending is not None:
                drain(*pending)
            pending = current
            if num == 0:
                jax.block_until_ready(current[1])
                logger.info(
                    f"first batch ({batch}) in {time.perf_counter() - t0:.1f}s "
                    f"incl. compile"
                )
        drain(*pending)
        if n_resumed:
            logger.info(f"resumed {n_resumed}/{n_batches} batches from disk")
    except BaseException:
        # Without this, a sampling/compile error leaves the pool's
        # non-daemon worker threads alive and the interpreter (or a pytest
        # run hosting several CLI invocations) hangs on exit.
        job_q.put(None)
        pool.terminate()
        pool.join()
        raise
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
        # The honest end-to-end figure: ACCEPTED scenes per second. Rejected
        # scenes are sampled-then-discarded chip time (the reference has no
        # rejection concept), so throughput claims must not count them.
        "ok_scenes_per_s": round(counts["n_ok"] / total_wall, 2),
        "sampler": f"{args.sampler}-{steps}",
        # Full sampler setting, so quality records distinguish e.g.
        # ddim-100 eta=1 (ancestral-class) from ddim-100 eta=0. eta only
        # affects the DDIM path; null otherwise so A/B tables don't treat a
        # dead config knob as a meaningful axis (ADVICE r4).
        "eta": ((args.eta if args.eta is not None else cfg.generation.ddim_eta)
                if args.sampler == "ddim" else None),
        "spacing": args.spacing or ("trailing" if args.sampler in ("dpm", "sde")
                                    else "leading"),
        "seed": args.seed,
        "batch_size": batch,
        "n_workers": args.n_workers,
        # Sampling resolution, so records from different model configs
        # (e.g. the r5 128px recovery flagship) are distinguishable.
        "img_res": cfg.model.sample_size,
        # Rejection-gate settings, so every record is self-describing
        # (ADVICE r4: the calibrated max_scene_nodes gate changes metric
        # comparability and must travel with the stats).
        "gates": {
            "noise_mask_frac": cfg.vectorize.noise_mask_frac,
            "max_graph_nodes": cfg.vectorize.max_graph_nodes,
            "max_scene_nodes": cfg.vectorize.max_scene_nodes,
            "despeckle_px": cfg.vectorize.despeckle_px,
        },
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
