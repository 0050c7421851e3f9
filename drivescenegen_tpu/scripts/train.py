"""Stage 1a: DDPM UNet training (reference: scripts/train.py +
pipeline/training_pipeline.py:46-107).

Data-parallel over the ICI mesh: the global batch is sharded on the "data"
axis, params replicated (TP rules applied when mesh.model > 1); XLA inserts
the gradient psum. Mixed precision bf16; AdamW + cosine warmup; per-epoch
sample image + orbax checkpoint (full state: params/opt_state/step — the
reference only saved weights and could not resume optimization).

  python -m drivescenegen_tpu.scripts.train --cfg_file cfg.yaml
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import load_config, save_config
from drivescenegen_tpu.data.dataset import RasterDataset, batch_iterator
from drivescenegen_tpu.diffusion import ddim_sample, ddpm_sample, make_schedule
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.parallel import make_mesh, param_shardings
from drivescenegen_tpu.training import (
    create_optimizer,
    init_train_state,
    make_train_step,
)
from drivescenegen_tpu.training.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
    save_params_only,
)
from drivescenegen_tpu.utils import prng
from drivescenegen_tpu.utils.logging import MetricWriter, get_logger

logger = get_logger("train")


# Eval-sampler jit cache: params flow in as an ARGUMENT so every epoch's
# EMA weights reuse one traced/compiled executable instead of retracing the
# whole 50/750-step scan per eval (tracing alone costs tens of seconds on a
# small host). Keyed by model identity + sampler settings; the model object
# lives for the whole training process.
_SAMPLE_FN_CACHE: dict = {}


def save_sample_image(params, model, schedule, cfg, out_dir: str, seed: int,
                      sampler: str = "ddpm", steps: int = 750) -> str:
    """Per-epoch eval sample (reference: training_pipeline.py:16-43)."""
    from PIL import Image

    shape = (1, cfg.model.sample_size, cfg.model.sample_size, cfg.model.out_channels)
    # Key on config VALUES, not id(model): after a model object is GC'd
    # (multiple train.main() calls in one process) CPython can reuse the id
    # and a stale jitted sampler closing over the old model/schedule would be
    # served (ADVICE r2).
    cache_key = (repr(cfg.model), repr(cfg.diffusion), sampler, steps, shape)
    if cache_key not in _SAMPLE_FN_CACHE:
        fn = ddpm_sample if sampler == "ddpm" else ddim_sample

        def run(params, k):
            def denoise(x, t):
                return model.apply(params, x, t)

            return fn(denoise, schedule, shape, k, steps)

        _SAMPLE_FN_CACHE[cache_key] = jax.jit(run)
    key = jax.random.key(seed)
    img = np.asarray(_SAMPLE_FN_CACHE[cache_key](params, key))
    img01 = np.clip(img[0] / 2 + 0.5, 0, 1)
    os.makedirs(out_dir, exist_ok=True)
    count = len([f for f in os.listdir(out_dir) if f.endswith(".png")])
    path = os.path.join(out_dir, f"{count:03d}.png")
    arr = (img01 * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]  # single-channel (conditional) models save as gray
    Image.fromarray(arr).save(path)
    return path


def supervise(cmd, retries: int, health_check, sleep_s: float = 60.0,
              max_wait_s: float = 7200.0, resume_cmd=None,
              progress_path: str | None = None,
              stall_s: float = 1800.0) -> int:
    """Failure-recovery wrapper: run `cmd` (a subprocess argv list), and on a
    non-zero exit — e.g. the remote TPU worker crashing mid-run — wait until
    `health_check()` reports the device is back, then relaunch (with
    `resume_cmd` if given: the first attempt honors the user's own --resume
    choice; only relaunches force a resume, so a supervised fresh run on a
    dir holding older checkpoints doesn't silently adopt those weights).
    The trainer's full-state checkpoints make each relaunch a true resume,
    so an infra fault costs at most the steps since the last save
    (SURVEY.md §5, failure detection/recovery). Returns the final exit
    code.

    A dead tunnel doesn't always kill the client: a device op can block on a
    futex forever with the child process alive (observed live: worker died
    mid-run, child sat 20+ min at 0% CPU and the step log stopped). When
    `progress_path` is given (the trainer's log dir), the newest-file mtime
    under it is a liveness signal; no progress for `stall_s` seconds kills
    the child and treats it as a crash, entering the same health-wait +
    resume path."""
    import glob as _glob
    import subprocess
    import time as _time

    def _progress_mtime() -> float:
        files = _glob.glob(os.path.join(progress_path, "*")) if progress_path else []
        return max((os.path.getmtime(f) for f in files), default=0.0)

    def _run(argv) -> int:
        proc = subprocess.Popen(argv)
        if not progress_path:
            return proc.wait()
        deadline_base = _time.time()
        while True:
            try:
                return proc.wait(timeout=30.0)
            except subprocess.TimeoutExpired:
                pass
            last = max(_progress_mtime(), deadline_base)
            if _time.time() - last > stall_s:
                logger.error(
                    f"no training progress for {stall_s:.0f}s with the child "
                    f"alive (hung device op?); killing pid {proc.pid}"
                )
                proc.kill()
                proc.wait()
                return -9

    attempt = 0
    while True:
        rc = _run(cmd)
        if rc == 0 or attempt >= retries:
            return rc
        attempt += 1
        if resume_cmd is not None:
            if cmd != resume_cmd:
                logger.warning("relaunching WITH --resume (crash recovery)")
            cmd = resume_cmd
        logger.warning(
            f"training attempt {attempt}/{retries} exited rc={rc}; "
            f"waiting for device health before resuming"
        )
        waited = 0.0
        while waited < max_wait_s and not health_check():
            _time.sleep(sleep_s)
            waited += sleep_s
        if waited >= max_wait_s:
            logger.error("device never came back; giving up")
            return rc


def _device_healthy(timeout_s: float = 180.0) -> bool:
    """Probe the default backend in a THROWAWAY subprocess (a hung tunnel
    blocks jax.devices() forever in-process; a child can be killed)."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "jnp.ones((8, 8)).sum().block_until_ready()")
    try:
        return subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(argv=None):
    parser = argparse.ArgumentParser(description="DDPM training")
    parser.add_argument("--cfg_file", default=None, type=str)
    parser.add_argument("--dataset_glob", default=None, type=str)
    parser.add_argument("--output_dir", default=None, type=str)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--init_from", default=None, type=str,
                        help="warm-start fine-tuning: load params (+EMA) from "
                             "another run's output_dir (or its checkpoints/ "
                             "dir) at step 0 with a fresh optimizer and LR "
                             "schedule; a later --resume of THIS run takes "
                             "precedence once this run has checkpoints")
    parser.add_argument("--max_steps", default=0, type=int,
                        help="cap total optimizer steps (0 = epochs * steps/epoch)")
    parser.add_argument("--profile_steps", default=0, type=int,
                        help="capture a jax.profiler trace for the first N steps")
    parser.add_argument("--supervise", default=0, type=int, metavar="N",
                        help="run the trainer as a supervised subprocess and "
                             "auto-resume up to N times after infra crashes "
                             "(waits for device health between attempts)")
    args = parser.parse_args(argv)

    if args.supervise > 0:
        import sys

        child_args = [a for a in (argv if argv is not None else sys.argv[1:])]
        # Strip --supervise (both "--supervise N" and "--supervise=N").
        cleaned = []
        skip = False
        for a in child_args:
            if skip:
                skip = False
                continue
            if a == "--supervise":
                skip = True
                continue
            if a.startswith("--supervise="):
                continue
            cleaned.append(a)
        cmd = [sys.executable, "-m", "drivescenegen_tpu.scripts.train"] + cleaned
        resume_cmd = cmd if "--resume" in cleaned else cmd + ["--resume"]
        # Liveness signal for the stall watchdog: the trainer's rotating log
        # dir (a step line lands every log_every steps).
        _scfg = load_config(args.cfg_file, {
            "train": {"output_dir": args.output_dir} if args.output_dir else {}
        })
        raise SystemExit(
            supervise(cmd, args.supervise, _device_healthy, resume_cmd=resume_cmd,
                      progress_path=os.path.join(_scfg.train.output_dir, "logs"))
        )

    from drivescenegen_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    overrides = {"train": {}}
    if args.dataset_glob:
        overrides["train"]["dataset_glob"] = args.dataset_glob
    if args.output_dir:
        overrides["train"]["output_dir"] = args.output_dir
    cfg = load_config(args.cfg_file, overrides)

    tcfg = cfg.train
    os.makedirs(tcfg.output_dir, exist_ok=True)
    save_config(cfg, os.path.join(tcfg.output_dir, "config.yaml"))
    writer = MetricWriter(os.path.join(tcfg.output_dir, "logs"))
    from drivescenegen_tpu.utils.logging import configure_file_logging

    configure_file_logging(os.path.join(tcfg.output_dir, "logs"))

    mesh = make_mesh(cfg.mesh)
    n_data = mesh.shape["data"]
    if tcfg.batch_size % n_data != 0:
        raise SystemExit(
            f"global batch {tcfg.batch_size} not divisible by data axis {n_data}"
        )
    logger.info(f"mesh: {dict(mesh.shape)} on {jax.devices()[0].platform}")

    n_channels = cfg.model.in_channels + cfg.model.cond_channels
    # raw="auto": PNG datasets transfer as uint8 and normalize on device
    # (4x less host->device traffic; decisive on narrow device links).
    dataset = RasterDataset(
        tcfg.dataset_glob, img_res=cfg.model.sample_size, n_channels=n_channels,
        cache=tcfg.cache_dataset, raw="auto",
    )
    if len(dataset) < tcfg.batch_size:
        raise SystemExit(
            f"dataset has {len(dataset)} samples < batch_size {tcfg.batch_size}; "
            f"reduce train.batch_size or add data"
        )
    steps_per_epoch = len(dataset) // tcfg.batch_size
    total_steps = args.max_steps or steps_per_epoch * tcfg.num_epochs
    logger.info(f"dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch")

    model = UNet2D(cfg.model)
    schedule = make_schedule(cfg.diffusion)
    tx, lr_sched = create_optimizer(tcfg, total_steps)

    root = prng.root_key(tcfg.seed)
    sample_shape = (cfg.model.sample_size, cfg.model.sample_size, cfg.model.in_channels)
    state = init_train_state(
        model, tx, prng.for_purpose(root, "init"), sample_shape,
        ema=tcfg.ema_decay > 0.0,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.info(f"model parameters: {n_params:,}")

    ckpt_dir = os.path.join(tcfg.output_dir, "checkpoints")
    if args.resume and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        logger.info(f"resumed from step {int(state.step)}")
    elif args.init_from:
        # Warm-start fine-tuning (e.g. adapting a converged flagship to an
        # augmented corpus): donor params and EMA carry over; optimizer
        # state, LR schedule, and the step counter start fresh so max_steps
        # defines a complete new cosine. restore_checkpoint's pre-EMA
        # fallback seeds EMA from params if the donor predates EMA.
        init_dir = args.init_from
        sub = os.path.join(init_dir, "checkpoints")
        if os.path.isdir(sub):
            init_dir = sub
        donor = restore_checkpoint(init_dir, state)
        state = state._replace(
            params=donor.params,
            ema_params=(donor.ema_params
                        if state.ema_params is not None else None),
        )
        logger.info(
            f"warm-started params from {init_dir} (donor step "
            f"{int(donor.step)}; optimizer/schedule/step reset to 0)"
        )

    # Place params/opt_state on the mesh (replicated unless TP rules apply).
    shardings = param_shardings(state.params, mesh)
    state = state._replace(params=jax.device_put(state.params, shardings))
    if state.ema_params is not None:
        state = state._replace(ema_params=jax.device_put(state.ema_params, shardings))

    base_step = make_train_step(
        model, schedule, tx, lr_sched, cond_dropout=tcfg.cond_dropout,
        ema_decay=tcfg.ema_decay,
    )
    data_key = prng.for_purpose(root, "train")

    n_bytes = len(dataset) * cfg.model.sample_size ** 2 * n_channels
    budget = int(tcfg.device_data_budget_gb * 1024 ** 3)
    use_device_data = tcfg.device_data == "on" or (
        tcfg.device_data == "auto" and dataset.raw and n_bytes <= budget
    )
    use_hybrid = tcfg.device_data == "hybrid" or (
        tcfg.device_data == "auto" and dataset.raw and n_bytes > budget
    )
    if use_hybrid:
        # Corpus larger than the HBM budget: a random budget-sized pool
        # stays resident, the tail streams from the sidecar mmap at a
        # coverage-balanced ratio (every sample exactly once per epoch).
        from drivescenegen_tpu.data.dataset import (
            hybrid_device_data,
            hybrid_index_batches,
            prefetch_to_device,
        )
        from drivescenegen_tpu.parallel import batch_sharding

        logger.info(
            f"hybrid device data: corpus {n_bytes / 1e9:.2f} GB > budget "
            f"{budget / 1e9:.2f} GB; streaming the tail"
        )
        data_dev, pool_idx, tail_idx, full = hybrid_device_data(
            dataset, mesh, budget, seed=tcfg.seed
        )
        if len(tail_idx) == 0:
            raise SystemExit(
                "device_data: hybrid requested but the whole corpus fits "
                f"the {budget / 1e9:.2f} GB budget — use device_data: on"
            )
        b_shard = batch_sharding(mesh, 4)

        def _hybrid_step(state, data, idxs, tail_batch, key):
            batch = jnp.concatenate(
                [jnp.take(data, idxs, axis=0), tail_batch], axis=0
            )
            batch = jax.lax.with_sharding_constraint(batch, b_shard)
            return base_step(state, batch, key)

        step_fn = jax.jit(_hybrid_step, donate_argnums=0)
        idx_it = hybrid_index_batches(
            len(pool_idx), len(tail_idx), tcfg.batch_size, seed=tcfg.seed,
            align=mesh.shape["data"],
        )
        # Split the (pool_slots, tail_slots) stream: slots feed the device
        # gather, tail rows prefetch host->HBM two batches ahead.
        import itertools

        idx_a, idx_b = itertools.tee(idx_it)
        tail_it = prefetch_to_device(
            (full[tail_idx[t]] for _, t in idx_b), mesh
        )

        def next_step(state, key):
            res_slots, _ = next(idx_a)
            return step_fn(
                state, data_dev, jnp.asarray(res_slots), next(tail_it), key
            )
    elif use_device_data:
        # Whole dataset resident in HBM; each step ships only indices. The
        # gathered batch is constrained back onto the "data" axis so DP
        # still shards the compute when the mesh is wider than one chip.
        from drivescenegen_tpu.data.dataset import dataset_to_device, index_batches
        from drivescenegen_tpu.parallel import batch_sharding

        logger.info(f"uploading dataset to device HBM ({n_bytes / 1e9:.2f} GB)")
        data_dev = dataset_to_device(dataset, mesh)
        b_shard = batch_sharding(mesh, 4)

        def _device_data_step(state, data, idxs, key):
            batch = jnp.take(data, idxs, axis=0)
            batch = jax.lax.with_sharding_constraint(batch, b_shard)
            return base_step(state, batch, key)

        step_fn = jax.jit(_device_data_step, donate_argnums=0)
        idx_it = index_batches(len(dataset), tcfg.batch_size, seed=tcfg.seed)

        def next_step(state, key):
            return step_fn(state, data_dev, jnp.asarray(next(idx_it)), key)
    else:
        step_fn = jax.jit(base_step, donate_argnums=0)

        from drivescenegen_tpu.data.dataset import prefetch_to_device

        it = prefetch_to_device(
            batch_iterator(dataset, tcfg.batch_size, seed=tcfg.seed, num_epochs=None),
            mesh,
        )

        def next_step(state, key):
            return step_fn(state, next(it), key)
    t_start = time.perf_counter()
    t_last = t_start
    start_step = int(state.step)
    profiling = False
    # Graceful early stop: an external controller (e.g. the harvest watcher
    # hitting its wall-clock deadline) touches <output_dir>/STOP; the trainer
    # notices at the next log boundary, saves a full checkpoint + params
    # export, and exits 0 — no steps since the last periodic save are lost.
    stop_file = os.path.join(tcfg.output_dir, "STOP")
    for step_i in range(start_step, total_steps):
        if args.profile_steps and step_i == start_step + 1:  # skip compile step
            jax.profiler.start_trace(os.path.join(tcfg.output_dir, "trace"))
            profiling = True
        state, metrics = next_step(state, data_key)
        if profiling and step_i == start_step + args.profile_steps:
            jax.tree.map(lambda x: x.block_until_ready(), metrics)
            jax.profiler.stop_trace()
            profiling = False
            logger.info(f"profiler trace -> {tcfg.output_dir}/trace")

        if (step_i + 1) % tcfg.log_every == 0 or step_i + 1 == total_steps:
            now = time.perf_counter()
            m = {k: float(v) for k, v in metrics.items()}
            m["steps_per_sec"] = tcfg.log_every / max(now - t_last, 1e-9)
            m["samples_per_sec"] = m["steps_per_sec"] * tcfg.batch_size
            t_last = now
            writer.write(step_i + 1, m)
            logger.info(
                f"step {step_i+1}/{total_steps} loss {m['loss']:.4f} "
                f"lr {m['lr']:.2e} {m['samples_per_sec']:.1f} samples/s"
            )
            if os.path.exists(stop_file):
                logger.info(
                    f"stop file found ({stop_file}); saving state and "
                    f"exiting at step {step_i + 1}"
                )
                save_checkpoint(
                    ckpt_dir, state, max_to_keep=tcfg.checkpoint_max_to_keep
                )
                export = (
                    state.ema_params if state.ema_params is not None
                    else state.params
                )
                save_params_only(tcfg.output_dir, export, int(state.step))
                break

        epoch_end = (step_i + 1) % steps_per_epoch == 0 or step_i + 1 == total_steps
        if epoch_end:
            epoch = (step_i + 1) // max(steps_per_epoch, 1)
            if epoch % tcfg.save_model_epochs == 0 or step_i + 1 == total_steps:
                save_checkpoint(
                    ckpt_dir, state, max_to_keep=tcfg.checkpoint_max_to_keep
                )
                # Export EMA weights for sampling when enabled.
                export = state.ema_params if state.ema_params is not None else state.params
                save_params_only(tcfg.output_dir, export, int(state.step))
            if epoch % tcfg.save_image_epochs == 0 or step_i + 1 == total_steps:
                eval_params = (
                    state.ema_params if state.ema_params is not None else state.params
                )
                path = save_sample_image(
                    eval_params, model, schedule, cfg,
                    os.path.join(tcfg.output_dir, "samples"), tcfg.seed,
                    sampler="ddim" if tcfg.eval_inference_steps <= 100 else "ddpm",
                    steps=tcfg.eval_inference_steps,
                )
                logger.info(f"epoch {epoch}: sample -> {path}")

    dt = time.perf_counter() - t_start
    logger.info(f"trained {int(state.step) - start_step} steps in {dt:.1f}s")
    writer.close()


if __name__ == "__main__":
    main()
