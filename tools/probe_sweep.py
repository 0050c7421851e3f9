"""Post-training sampler perf sweep on the real TPU (run when the chip is
free). Measures DDIM-50 @256x256 throughput across batch sizes, attention
impls, and param precision; captures a perfetto trace of the baseline for
op-level attribution."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from drivescenegen_tpu.config import DiffusionConfig, ModelConfig
from drivescenegen_tpu.diffusion import ddim_sample, make_schedule
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.utils.flops import unet2d_forward_flops
from drivescenegen_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()
PEAK = 197e12  # v5e bf16 peak


def bench_one(tag, model_cfg, batch, precast_bf16=False, n_iters=3, trace_dir=None,
              unroll=1):
    model = UNet2D(model_cfg)
    schedule = make_schedule(DiffusionConfig())
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = model.init(jax.random.key(0), x0, jnp.zeros((1,), jnp.int32))
    if precast_bf16:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    def denoise(x, t):
        return model.apply(params, x, t)

    shape = (batch, 256, 256, 3)
    run = jax.jit(lambda k: ddim_sample(denoise, schedule, shape, k, 50,
                                        unroll=unroll))
    t0 = time.perf_counter()
    out = run(jax.random.key(1))
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = run(jax.random.fold_in(jax.random.key(1), i))
        # Block EVERY iteration: waiting only on the last array once
        # produced a 2.6 ms/batch reading for the unroll=5 arm (r4 sweep)
        # — a physically impossible number (500x the roofline) from the
        # remote backend acking queued dispatches. Per-iter blocking costs
        # ~nothing at 1.3 s/batch and makes the timing unfoolable.
        out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    if dt * 1000 < 50:  # sanity: 256^2 x 50-step UNet can't run this fast
        print(f"{tag}: IMPLAUSIBLE timing {dt*1000:.1f} ms/batch — "
              "discard this arm and re-measure", flush=True)
    tput = batch / dt
    mfu = tput * 50 * unet2d_forward_flops(model_cfg) / PEAK
    print(
        f"{tag:32s} batch={batch:3d} {dt*1000:7.1f} ms/batch "
        f"{tput:6.2f} scenes/s  MFU={mfu*100:4.1f}%  (compile {compile_s:.0f}s)",
        flush=True,
    )
    if trace_dir:
        with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
            out = run(jax.random.key(3))
            out.block_until_ready()
        print(f"  trace -> {trace_dir}", flush=True)
    return tput


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    base = ModelConfig()
    if which in ("all", "base"):
        bench_one("baseline xla-attn", base, 8,
                  trace_dir="outputs/trace_b8" if which == "base" else None)
    if which in ("all", "batch"):
        bench_one("batch 4", base, 4)
        bench_one("batch 16", base, 16)
        bench_one("batch 32", base, 32)
    if which in ("all", "flash"):
        import dataclasses

        flash = dataclasses.replace(base, attention_impl="flash")
        bench_one("flash attention", flash, 8)
    if which in ("all", "bf16"):
        bench_one("bf16 pre-cast params", base, 8, precast_bf16=True)
    if which in ("all", "pallas"):
        import dataclasses

        pgn = dataclasses.replace(base, use_pallas_gn=True)
        bench_one("pallas groupnorm", pgn, 8)
    if which in ("all", "split"):
        import dataclasses

        # Skip-concat elimination (docs/PERF_ANALYSIS.md candidate lever 1):
        # checkpoint-compatible; numerics-equivalence tests in
        # tests/test_split_skip_conv.py. Batch 16 too: removing the concat
        # lowers activation memory, which can move the batch sweet spot.
        split = dataclasses.replace(base, split_skip_conv=True)
        bench_one("split skip-concat", split, 8)
        bench_one("split skip-concat b16", split, 16)
    if which in ("all", "gn_conv"):
        import dataclasses

        # Fused GN+SiLU+conv3x3 Pallas kernel (docs/PERF_ANALYSIS.md
        # candidate lever 2): checkpoint-compatible; parity tests in
        # tests/test_gn_silu_conv.py + tests/test_unet_fused_gn_conv.py.
        fgc = dataclasses.replace(base, use_pallas_gn_conv=True)
        bench_one("fused gn+silu+conv", fgc, 8, trace_dir=(
            "outputs/trace_gnconv" if which == "gn_conv" else None))
    if which in ("all", "unroll"):
        # Scan-body unroll: lets XLA fuse elementwise chains across adjacent
        # denoise steps (docs/PERF_ANALYSIS.md gap item 3). Identical math.
        bench_one("scan unroll=2", base, 8, unroll=2)
        bench_one("scan unroll=5", base, 8, unroll=5)
    if which == "trace":
        bench_one("baseline for trace", base, 8, trace_dir="outputs/trace_b8")
