"""Cross-check the analytic UNet FLOP count against XLA's cost analysis."""

import jax
import jax.numpy as jnp
import pytest

from drivescenegen_tpu.config import ModelConfig
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.utils.flops import unet2d_forward_flops


@pytest.mark.parametrize(
    "cfg",
    [
        ModelConfig(sample_size=32, block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=4, attention_head_dim=8, dtype="float32"),
        ModelConfig(sample_size=64, block_out_channels=(32, 64, 96),
                    layers_per_block=2, norm_num_groups=8, attention_head_dim=16,
                    dtype="float32"),
    ],
)
def test_analytic_flops_match_xla(cfg):
    cpu = jax.devices("cpu")[0]
    model = UNet2D(cfg)
    x = jnp.zeros((2, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    t = jnp.zeros((2,), jnp.int32)
    with jax.default_device(cpu):
        params = model.init(jax.random.key(0), x, t)
        lowered = jax.jit(lambda p, x, t: model.apply(p, x, t)).lower(params, x, t)
        cost = lowered.compile().cost_analysis()
    xla_flops = cost.get("flops", 0.0)
    if not xla_flops:
        pytest.skip("backend reports no flops in cost analysis")
    ours = unet2d_forward_flops(cfg, batch=2)
    # XLA counts a handful of elementwise ops we deliberately exclude;
    # matmul flops dominate, so the two must agree within 5%.
    assert abs(ours - xla_flops) / xla_flops < 0.05, (ours, xla_flops)


def test_flagship_flop_count_magnitude():
    flops = unet2d_forward_flops(ModelConfig(), batch=1)
    # ~370 GFLOPs/sample forward at 256x256 (documented in bench.py).
    assert 3.0e11 < flops < 4.5e11


def test_speed_of_light_and_roofline_bounds():
    from drivescenegen_tpu.config import ModelConfig
    from drivescenegen_tpu.utils.flops import (
        unet2d_roofline_seconds,
        unet2d_speed_of_light,
    )

    cfg = ModelConfig()
    sol = unet2d_speed_of_light(cfg)
    assert 0.0 < sol <= 1.0
    r = unet2d_roofline_seconds(cfg, batch=8)
    # Roofline time is at least the pure-FLOPs time; the upper bound is the
    # lane-capped MXU time (== t_flops/sol, since sum(tf/cap) = t_flops/sol)
    # plus the memory time.
    assert r["t_flops_only_s"] <= r["t_roofline_s"] <= (
        r["t_flops_only_s"] / sol + r["t_mem_only_s"]
    )
    assert 0.0 < r["mfu_ceiling"] <= sol
