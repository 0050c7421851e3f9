"""Op-level timing breakdown of the flagship sampler's denoiser on the real
chip: times each building block (ResnetBlock / AttentionBlock / GroupNorm+SiLU
/ bare conv) at its hot shape and compares against the analytic roofline
(max of MXU time at 197 TFLOP/s bf16 and HBM time at 819 GB/s on v5e), so the
measured-MFU-vs-roofline-ceiling gap in bench.py can be attributed to specific
ops instead of hand-waving.

Run:  python outputs/stage_microbench.py [batch]
Writes a markdown table to stdout (redirect into docs/PERF_ANALYSIS.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from drivescenegen_tpu.config import ModelConfig
from drivescenegen_tpu.models.unet2d import (
    AttentionBlock,
    GroupNormSiLU,
    ResnetBlock,
)
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.utils.profiling import enable_compilation_cache

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9  # v5e HBM B/W


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _roofline(flops, bytes_):
    t_mxu = flops / PEAK_FLOPS
    t_hbm = bytes_ / PEAK_HBM
    return max(t_mxu, t_hbm), t_mxu, t_hbm


def conv_cost(b, h, c_in, c_out, k=3):
    flops = 2 * b * h * h * k * k * c_in * c_out
    bytes_ = 2 * b * h * h * (c_in + c_out) + 4 * k * k * c_in * c_out
    return flops, bytes_


def gn_cost(b, h, c):
    # two-pass: read x (stats), read x + write y; bf16 activations
    bytes_ = 2 * b * h * h * c * 3
    return 10 * b * h * h * c, bytes_


def resnet_cost(b, h, c_in, c_out):
    f = g = 0
    for fl, by in (
        gn_cost(b, h, c_in),
        conv_cost(b, h, c_in, c_out),
        gn_cost(b, h, c_out),
        conv_cost(b, h, c_out, c_out),
    ):
        f += fl
        g += by
    if c_in != c_out:
        fl, by = conv_cost(b, h, c_in, c_out, k=1)
        f += fl
        g += by
    return f, g


def attn_cost(b, h, c):
    n = h * h
    flops = 2 * b * (4 * n * c * c + 2 * n * n * c)
    bytes_ = 2 * b * n * c * 8 + 4 * 4 * c * c
    return flops, bytes_


def bench_block(name, module, shapes, cost, rows):
    key = jax.random.key(0)
    args = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32)
            for i, s in enumerate(shapes)]
    params = module.init(key, *args)
    fn = jax.jit(lambda *a: module.apply(params, *a))
    dt = _time(fn, *args)
    t_roof, t_mxu, t_hbm = _roofline(*cost)
    rows.append((name, dt * 1e3, t_roof * 1e3, t_mxu * 1e3, t_hbm * 1e3,
                 100.0 * t_roof / dt))


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = ModelConfig()
    rows = []

    # Full forward at the bench setting.
    model = UNet2D(cfg)
    x = jnp.zeros((batch, 256, 256, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.key(0), x, t)
    fwd = jax.jit(lambda x, t: model.apply(params, x, t))
    dt_full = _time(fwd, x, t, iters=10)

    temb_dim = cfg.block_out_channels[0] * 4
    stages = [(256, 64, 64), (128, 64, 128), (64, 128, 256), (32, 256, 512)]
    for h, c_in, c_out in stages:
        bench_block(
            f"resnet {h}x{h} {c_in}->{c_out}",
            ResnetBlock(out_channels=c_out),
            [(batch, h, h, c_in), (batch, temb_dim)],
            resnet_cost(batch, h, c_in, c_out),
            rows,
        )
    bench_block(
        "attention 32x32 c512",
        AttentionBlock(head_dim=cfg.attention_head_dim),
        [(batch, 32, 32, 512)],
        attn_cost(batch, 32, 512),
        rows,
    )
    for h, c in ((256, 64), (32, 512)):
        bench_block(
            f"groupnorm+silu {h}x{h} c{c}",
            GroupNormSiLU(),
            [(batch, h, h, c)],
            gn_cost(batch, h, c),
            rows,
        )

    print(f"\nfull forward batch={batch}: {dt_full*1e3:.1f} ms")
    print("\n| op | measured ms | roofline ms | mxu ms | hbm ms | % of roofline |")
    print("|---|---|---|---|---|---|")
    for name, dt, roof, mxu, hbm, eff in rows:
        print(f"| {name} | {dt:.3f} | {roof:.3f} | {mxu:.3f} | {hbm:.3f} | {eff:.0f}% |")


if __name__ == "__main__":
    main()
