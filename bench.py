"""Benchmark: scenes/sec/chip for 50-step DDIM sampling at 256x256 (the
BASELINE.json north-star metric) on the flagship UNet2D.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md), so the baseline is the reference's own sampler setting —
750-step ancestral DDPM (scripts/generation.py:5) — measured on the SAME
chip with the same model. vs_baseline = ddim50 throughput / ddpm750
throughput, i.e. the speedup a reference user gets by switching.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _throughput(sample_fn, key, batch, n_iters=3):
    # Warmup / compile.
    out = sample_fn(key)
    out.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = sample_fn(jax.random.fold_in(key, i))
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    return batch / dt, dt


def _device_reachable(timeout_s: int = 300) -> bool:
    """Probe backend health in a SUBPROCESS with a hard timeout. When the
    TPU tunnel/worker is down, merely discovering the backend blocks
    indefinitely (jax.devices() never returns), which would hang the whole
    benchmark run; a bounded child turns that into a fast, loud failure.
    300 s covers a healthy-but-cold tunnel negotiation."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); import jax.numpy as j; "
             "j.ones(4).sum().block_until_ready()"],
            timeout=timeout_s, capture_output=True,
        )
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _device_reachable():
        raise SystemExit(
            "bench: device backend unreachable (probe subprocess timed out "
            "or crashed) — the TPU tunnel/worker is down; refusing to hang."
        )

    from drivescenegen_tpu.config import DiffusionConfig, ModelConfig
    from drivescenegen_tpu.diffusion import (
        ddim_sample,
        ddpm_sample,
        dpmpp_2m_sample,
        dpmpp_2m_sde_sample,
        make_schedule,
    )
    from drivescenegen_tpu.models import UNet2D
    from drivescenegen_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    n_chips = len(jax.devices())
    platform = jax.devices()[0].platform

    import os as _os

    # DSG_USE_PALLAS_GN_CONV=1: bench the fused GN+SiLU+conv Pallas arm
    # (tools/post_harvest_r5.sh records it as a candidate headline when the
    # probe A/B shows a win; the default stays the measured best).
    mcfg = ModelConfig(
        use_pallas_gn_conv=bool(int(_os.environ.get(
            "DSG_USE_PALLAS_GN_CONV", "0")))
    )
    model = UNet2D(mcfg)
    schedule = make_schedule(DiffusionConfig())
    res = 256
    # batch 8 is the measured sweet spot on v5e via axon (r3 sweep,
    # outputs/probe_sweep_r3*.log): batch {4,8,16,32} -> {2.55, 6.15, 6.00,
    # 5.62} scenes/s; flash attention 5.93 (1024 tokens is below pallas
    # flash's win region), bf16 pre-cast 6.15 (XLA already casts), pallas
    # GN 3.23 (breaks XLA fusion). The r2 batch-16 cliff did not reproduce.
    batch = 8

    x0 = jnp.zeros((1, res, res, 3), jnp.float32)
    params = model.init(jax.random.key(0), x0, jnp.zeros((1,), jnp.int32))

    def denoise_fn(x, t):
        return model.apply(params, x, t)

    shape = (batch, res, res, 3)

    @jax.jit
    def run_ddim(key):
        return ddim_sample(denoise_fn, schedule, shape, key, num_inference_steps=50)

    @jax.jit
    def run_ddpm(key):
        return ddpm_sample(denoise_fn, schedule, shape, key, num_inference_steps=750)

    @jax.jit
    def run_dpm(key):
        return dpmpp_2m_sample(denoise_fn, schedule, shape, key,
                               num_inference_steps=20)

    @jax.jit
    def run_sde(key):
        return dpmpp_2m_sde_sample(denoise_fn, schedule, shape, key,
                                   num_inference_steps=25)

    ddim_tput, ddim_dt = _throughput(run_ddim, jax.random.key(1), batch, n_iters=3)
    ddpm_tput, ddpm_dt = _throughput(run_ddpm, jax.random.key(2), batch, n_iters=1)
    dpm_tput, _ = _throughput(run_dpm, jax.random.key(3), batch, n_iters=3)
    sde_tput, _ = _throughput(run_sde, jax.random.key(4), batch, n_iters=3)

    # MFU against the v5e bf16 peak (197 TFLOP/s), using the analytic conv/
    # attention FLOP count cross-checked vs XLA cost analysis in
    # tests/test_flops.py. Only meaningful on the TPU platform.
    from drivescenegen_tpu.utils.flops import (
        unet2d_forward_flops,
        unet2d_roofline_seconds,
        unet2d_speed_of_light,
    )

    fwd_flops = unet2d_forward_flops(ModelConfig())
    mfu = ddim_tput * 50 * fwd_flops / 197e12 if platform == "tpu" else None
    roof = unet2d_roofline_seconds(ModelConfig(), batch)

    result = {
        "metric": f"scenes/sec/chip, 50-step DDIM @ {res}x{res} ({platform})",
        "value": round(ddim_tput / max(n_chips, 1), 4),
        "unit": "scenes/s/chip",
        "vs_baseline": round(ddim_tput / ddpm_tput, 2),
        "detail": {
            "ddim50_batch_time_s": round(ddim_dt, 3),
            "ddpm750_scenes_per_s_per_chip": round(ddpm_tput / max(n_chips, 1), 4),
            # DPM-Solver++(2M) at 20 steps: second-order solver, DDIM-50
            # quality class at 2.5x fewer UNet evals (diffusion/samplers.py)
            # — the matched-quality fast path beyond the headline setting.
            "dpm20_scenes_per_s_per_chip": round(dpm_tput / max(n_chips, 1), 4),
            # SDE-DPM-Solver++(2M) at 25 steps: stochastic second-order —
            # ancestral-class quality (no deterministic-path speckle) at
            # ~4x fewer UNet evals than DDIM-100 eta=1.
            "sde25_scenes_per_s_per_chip": round(sde_tput / max(n_chips, 1), 4),
            "batch": batch,
            "n_chips": n_chips,
            "fwd_gflops": round(fwd_flops / 1e9, 1),
            "mfu_pct": round(mfu * 100, 1) if mfu is not None else None,
            # Analytic ceilings (utils/flops.py): MXU lane occupancy caps
            # this net at 81% (64-channel stages fill half the 128-lane
            # array); composing that with the HBM roofline (GroupNorm's
            # two-pass traffic) gives ~68% MFU / ~7.6 scenes/s on v5e.
            "mxu_occupancy_ceiling_pct": round(
                unet2d_speed_of_light(ModelConfig()) * 100, 1
            ),
            "roofline_mfu_ceiling_pct": round(roof["mfu_ceiling"] * 100, 1),
            "roofline_scenes_per_s": round(batch / (50 * roof["t_roofline_s"]), 2),
        },
    }
    quality = _quality_record()
    if quality:
        # The throughput headline composes with a measured quality record
        # (VERDICT r3: a speed claim needs a quality co-claim): which
        # sampler setting the round's 5k harvest ran, how many samples
        # survived vectorization, and the FD table vs the calibrated
        # roundtrip ceiling.
        result["detail"]["quality_record"] = quality
    print(json.dumps(result))


def _quality_record():
    """Summarize the latest 5k-harvest quality artifacts if present."""
    import os

    rec = {}
    # Primary record: the newest round's 5k run. From r5 on, the shipped
    # VectorizeConfig default IS the GT-calibrated max_scene_nodes gate and
    # the stats are self-describing (gate values + ok_scenes_per_s embedded
    # per record), so the primary record leads with calibrated numbers
    # (VERDICT r4 weak #7); the r4 as-run record needed a separate
    # "calibrated" re-vectorization, kept below for older artifacts.
    for run in ("e2e5k_r5", "e2e5k_r4", "e2e5k_r3", "e2e5k"):
        p = f"outputs/flagship/{run}/vectorization_stats.json"
        if os.path.exists(p):
            with open(p) as f:
                st = json.load(f)
            n = max(st.get("n_images", 0), 1)
            rec.update({
                "run": run,
                "sampler": st.get("sampler"),
                "eta": st.get("eta"),
                "spacing": st.get("spacing"),
                "n_images": st.get("n_images"),
                "rejection_rate": round(
                    (st.get("n_rejected", 0) + st.get("n_failed", 0)) / n, 3
                ),
                "wall_time_s": st.get("wall_time_s"),
            })
            for k in ("ok_scenes_per_s", "scenes_per_s", "gates", "img_res"):
                if st.get(k) is not None:
                    rec[k] = st[k]
            mp = f"outputs/flagship/metrics_model_{run[6:] or 'r2'}.json"
            if os.path.exists(mp):
                with open(mp) as f:
                    m = json.load(f)
                rec["frechet"] = {k: round(v, 3)
                                  for k, v in m.get("frechet", {}).items()}
            break
    # The harvest's quality fallback (stochastic DDIM-100 eta=1, run when
    # the deterministic winner rejects >15% as speckle) is the usable
    # quality read in that case — report it alongside, not instead.
    for key, run in (("fast_arm", "e2e5k_r5sde"),
                     ("fallback", "e2e5k_r4q"), ("fast_arm", "e2e5k_r4sde"),
                     ("calibrated", "e2e5k_r4cal")):
        if key in rec:
            continue  # newest round's record for this key already taken
        if rec.get("run", "").endswith("_r5") and "_r4" in run:
            continue  # r5 primary: don't mix in stale r4 side records
        # fallback: stochastic DDIM-100 eta=1, run when the deterministic
        # winner rejects >15% as speckle — the usable quality read in that
        # case. fast_arm: SDE-DPM++(2M)-25 at scale — the at-scale quality
        # record for the fast sampler the detail throughput rows advertise.
        # calibrated: the SAME 5k samples re-vectorized with the GT-side
        # calibrated max_scene_nodes gate (docs/results_r4/gate_tradeoff.md)
        # — higher rejection, junk-free FD table.
        qp = f"outputs/flagship/{run}/vectorization_stats.json"
        if not os.path.exists(qp):
            continue
        with open(qp) as f:
            st = json.load(f)
        n = max(st.get("n_images", 0), 1)
        fb = {
            # The calibrated re-vectorization reuses the primary run's
            # samples, so its stats file carries no sampler tag — inherit.
            "sampler": st.get("sampler") or rec.get("sampler"),
            "n_images": st.get("n_images"),
            "rejection_rate": round(
                (st.get("n_rejected", 0) + st.get("n_failed", 0)) / n, 3
            ),
        }
        mp = f"outputs/flagship/metrics_model_{run[6:]}.json"
        if os.path.exists(mp):
            with open(mp) as f:
                m = json.load(f)
            fb["frechet"] = {k: round(v, 3)
                             for k, v in m.get("frechet", {}).items()}
        rec[key] = fb
    # Round-5 target metric: two-way lane-pair fraction (VERDICT r4 weak
    # #1 — generated scenes dropped one direction of nearly every two-way
    # pair, 0.043 vs GT 0.738). Parsed from the harvest's twoway_probe
    # output so the round-end bench carries the augmentation verdict.
    import re
    tw = "outputs/flagship/twoway_r5.txt"
    if os.path.exists(tw):
        pairs = dict(re.findall(
            r"^(GT|model)\s+n=\s*\d+\s+paired-node fraction: mean ([0-9.]+)",
            open(tw).read(), re.M))
        if pairs:
            rec["twoway_paired_node_fraction"] = {
                k.lower(): float(v) for k, v in pairs.items()
            }
    # Config-5 conditional-model record (eval_cond_agents guidance sweep on
    # NATIVELY rasterized 128px held-out scenes — the 256->128 downscaled
    # recipe is unmeasurable: its extractor-destroying resize scores even a
    # perfect generator 0/89, see configs/config5_cond_128n.yaml). Falls
    # back to the committed docs copy so a host wipe can't erase the record
    # from the round-end bench.
    for cp in ("outputs/cond128n/cfg_eval_r5.json",
               "outputs/cond128n/cfg_eval.json",
               "docs/results_r4/cfg_eval_128native.json"):
        if os.path.exists(cp):
            with open(cp) as f:
                ce = json.load(f)
            if ce.get("n_gt_agents", 0) > 0:
                rec["cond128_guidance_sweep"] = ce
            break
    return rec or None


if __name__ == "__main__":
    main()
