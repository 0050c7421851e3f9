"""Analytic FLOP accounting for the UNet2D denoiser.

Walks the exact block structure of models/unet2d.py and sums matmul FLOPs
(2 * contraction * output elements) for every conv / dense / attention
einsum. Used by bench.py to report model FLOPs utilization (MFU) alongside
raw throughput with a documented, reproducible count (VERDICT r1 item 4);
tests/test_flops.py cross-checks it against XLA's own cost analysis.
"""

from __future__ import annotations

from drivescenegen_tpu.config import ModelConfig


def _conv(h: int, w: int, cin: int, cout: int, k: int = 3, stride: int = 1) -> int:
    oh, ow = h // stride, w // stride
    return 2 * oh * ow * k * k * cin * cout


def unet2d_forward_flops(cfg: ModelConfig, batch: int = 1) -> int:
    """Matmul FLOPs of one UNet2D forward pass on a [batch, S, S, C] input.

    Counts convs (3x3 and 1x1 shortcuts), time-embedding/projection denses,
    and the mid-block attention einsums; elementwise work (GroupNorm, SiLU,
    residual adds, upsample) is excluded — it is HBM-bound, not MXU-bound.
    """
    s = cfg.sample_size
    chans = tuple(cfg.block_out_channels)
    n_blocks = len(chans)
    lpb = cfg.layers_per_block
    embed = chans[0] * 4
    cin = cfg.in_channels + cfg.cond_channels

    total = 0
    # Time MLP (per batch element, not per pixel): sinusoidal -> 2 denses.
    total += 2 * chans[0] * embed + 2 * embed * embed

    res = s
    total += _conv(res, res, cin, chans[0])  # conv_in

    def resnet(h, c_in, c_out):
        f = _conv(h, h, c_in, c_out) + _conv(h, h, c_out, c_out)
        f += 2 * embed * c_out  # time_proj dense
        if c_in != c_out:
            f += _conv(h, h, c_in, c_out, k=1)
        return f

    # Down path; record skip channels for the up path.
    skips = [(res, chans[0])]
    c_prev = chans[0]
    for i, ch in enumerate(chans):
        for _ in range(lpb):
            total += resnet(res, c_prev, ch)
            c_prev = ch
            skips.append((res, ch))
        if i != n_blocks - 1:
            total += _conv(res, res, ch, ch, stride=2)
            res //= 2
            skips.append((res, ch))

    # Mid block.
    c = chans[-1]
    total += 2 * resnet(res, c, c)
    tokens = res * res
    total += 2 * tokens * c * (3 * c)  # qkv
    total += 2 * 2 * tokens * tokens * c  # qk^T and att*v
    total += 2 * tokens * c * c  # proj_out

    # Up path.
    for i, ch in enumerate(reversed(chans)):
        for _ in range(lpb + 1):
            skip_res, skip_c = skips.pop()
            total += resnet(res, c_prev + skip_c, ch)
            c_prev = ch
        if i != n_blocks - 1:
            res *= 2
            total += _conv(res, res, ch, ch)  # upsample conv

    total += _conv(res, res, chans[0], cfg.out_channels)  # conv_out
    return total * batch
