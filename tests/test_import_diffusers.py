"""Reference-checkpoint interop (VERDICT r4 missing #1).

diffusers is not installed in this environment, so the golden oracle is a
pure-torch replica of the reference's UNet2DModel architecture (plain
DownBlock2D/UpBlock2D, default attn mid block — reference
scripts/train.py:39-57), implemented here with diffusers' exact state-dict
naming and published semantics (diffusers models/unet_2d.py /
resnet.py / attention_processor.py):

  - sinusoidal timestep embedding, flip_sin_to_cos=True, freq_shift=0
  - TimestepEmbedding linear_1 -> SiLU -> linear_2
  - ResnetBlock2D: GN -> SiLU -> conv3x3p1 -> +time_emb_proj(SiLU(temb))
                   -> GN -> SiLU -> conv3x3p1, 1x1 conv_shortcut on
                   channel change
  - Downsample2D conv3x3 stride2 padding1; Upsample2D nearest x2 + conv
  - mid Attention: GN, per-head q/k/v (head count = C // head_dim),
    softmax(QK^T/sqrt(d))V, to_out.0, residual add

The test round-trips a random torch checkpoint through
models/import_diffusers.py and pins eps-parity of the flax forward against
the torch forward on the same inputs.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- replica --
class TorchResnet(nn.Module):
    def __init__(self, c_in, c_out, temb_dim, groups, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c_in, eps=eps)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, c_out)
        self.norm2 = nn.GroupNorm(groups, c_out, eps=eps)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(c_in, c_out, 1)
                              if c_in != c_out else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchAttention(nn.Module):
    def __init__(self, c, head_dim, groups, eps=1e-5):
        super().__init__()
        self.heads = max(1, c // head_dim)
        self.group_norm = nn.GroupNorm(groups, c, eps=eps)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        d = C // self.heads

        def split(t):
            return t.reshape(B, -1, self.heads, d).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(q @ k.transpose(-1, -2) / d ** 0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, H * W, C)
        out = self.to_out[0](out)
        return x + out.transpose(1, 2).reshape(B, C, H, W)


class TorchUNet2D(nn.Module):
    """State-dict-compatible replica of the reference UNet2DModel config
    family (plain down/up blocks, attn mid)."""

    def __init__(self, in_c=3, out_c=3, chans=(8, 16), layers=2, groups=4,
                 head_dim=4):
        super().__init__()
        self.chans, self.layers = chans, layers
        temb_dim = chans[0] * 4
        self.conv_in = nn.Conv2d(in_c, chans[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chans[0], temb_dim)
        self.time_embedding.linear_2 = nn.Linear(temb_dim, temb_dim)

        self.down_blocks = nn.ModuleList()
        c = chans[0]
        for i, ch in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TorchResnet(c if j == 0 else ch, ch, temb_dim, groups)
                 for j in range(layers)])
            if i != len(chans) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)
            c = ch

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TorchResnet(chans[-1], chans[-1], temb_dim, groups),
             TorchResnet(chans[-1], chans[-1], temb_dim, groups)])
        self.mid_block.attentions = nn.ModuleList(
            [TorchAttention(chans[-1], head_dim, groups)])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        prev = chans[-1]
        for i, ch in enumerate(rev):
            blk = nn.Module()
            resnets = []
            for j in range(layers + 1):
                # skip channels come off the down-path stack in reverse
                skip_ch = self._skip_channels()[-(1 + j + i * (layers + 1))]
                resnets.append(
                    TorchResnet(prev + skip_ch, ch, temb_dim, groups))
                prev = ch
            blk.resnets = nn.ModuleList(resnets)
            if i != len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(groups, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], out_c, 3, padding=1)

    def _skip_channels(self):
        skips = [self.chans[0]]
        for i, ch in enumerate(self.chans):
            skips += [ch] * self.layers
            if i != len(self.chans) - 1:
                skips.append(ch)
        return skips

    def forward(self, x, t):
        half = self.chans[0] // 2
        freqs = torch.exp(
            -np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))

        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for r in blk.resnets:
                h = r(h, temb)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, temb)

        for i, blk in enumerate(self.up_blocks):
            for r in blk.resnets:
                h = r(torch.cat([h, skips.pop()], dim=1), temb)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)

        h = self.conv_out(F.silu(self.conv_norm_out(h)))
        return h


def _write_checkpoint(tmp_path, model, chans=(8, 16), layers=2, groups=4,
                      head_dim=4, sample=16, in_c=3, out_c=3):
    d = tmp_path / "unet"
    d.mkdir(exist_ok=True)
    cfgj = {
        "_class_name": "UNet2DModel",
        "sample_size": sample,
        "in_channels": in_c,
        "out_channels": out_c,
        "layers_per_block": layers,
        "block_out_channels": list(chans),
        "norm_num_groups": groups,
        "attention_head_dim": head_dim,
        "down_block_types": ["DownBlock2D"] * len(chans),
        "up_block_types": ["UpBlock2D"] * len(chans),
        "flip_sin_to_cos": True,
        "freq_shift": 0,
    }
    (d / "config.json").write_text(json.dumps(cfgj))
    torch.save(model.state_dict(), d / "diffusion_pytorch_model.bin")
    return str(d)


@pytest.fixture(scope="module")
def tiny_pair(tmp_path_factory):
    torch.manual_seed(0)
    model = TorchUNet2D().eval()
    src = _write_checkpoint(tmp_path_factory.mktemp("ckpt"), model)
    return model, src


def test_eps_parity_torch_vs_imported_flax(tiny_pair):
    """Same random checkpoint, same input: torch forward == flax forward."""
    model, src = tiny_pair
    import jax

    from drivescenegen_tpu.models.import_diffusers import import_unet2d
    from drivescenegen_tpu.models.unet2d import UNet2D

    cfg, params = import_unet2d(src)
    assert cfg.torch_pad_downsample and cfg.attention_head_dim == 4

    cfg.dtype = "float32"  # fp32 activations for a tight parity bound
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    t = np.array([7, 383], np.int32)

    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(t)).permute(0, 2, 3, 1).numpy()

    got = np.asarray(UNet2D(cfg).apply(params, x, t))
    err = np.abs(got - ref).max()
    assert err < 2e-3, f"eps mismatch: max abs err {err}"


def test_eps_parity_under_split_skip_conv(tiny_pair):
    """The imported params must also be exact under the split-skip fast
    path (same tree, different compute schedule)."""
    model, src = tiny_pair
    from drivescenegen_tpu.models.import_diffusers import import_unet2d
    from drivescenegen_tpu.models.unet2d import UNet2D

    cfg, params = import_unet2d(src)
    cfg.dtype = "float32"
    cfg.split_skip_conv = True
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    t = np.array([250], np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(t)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(UNet2D(cfg).apply(params, x, t))
    assert np.abs(got - ref).max() < 2e-3


def test_import_rejects_unknown_blocks(tmp_path):
    from drivescenegen_tpu.models.import_diffusers import load_model_config

    d = tmp_path / "unet"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "block_out_channels": [8, 16],
        "down_block_types": ["AttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"],
    }))
    (d / "diffusion_pytorch_model.bin").write_bytes(b"")
    with pytest.raises(ValueError, match="unsupported block types"):
        load_model_config(str(d))


def test_import_rejects_unconsumed_keys(tiny_pair, tmp_path):
    model, _ = tiny_pair
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    from drivescenegen_tpu.config import ModelConfig
    from drivescenegen_tpu.models.import_diffusers import diffusers_to_flax

    cfg = ModelConfig(sample_size=16, block_out_channels=(8, 16),
                      layers_per_block=2, norm_num_groups=4,
                      attention_head_dim=4)
    with pytest.raises(ValueError, match="not consumed"):
        diffusers_to_flax(sd, cfg)


def test_import_cli_roundtrip(tiny_pair, tmp_path):
    """import_reference CLI writes a model_dir the generation loader can
    restore, and the restored params equal the mapped ones."""
    model, src = tiny_pair
    import jax

    from drivescenegen_tpu.config import load_config
    from drivescenegen_tpu.models.import_diffusers import import_unet2d
    from drivescenegen_tpu.scripts import import_reference
    from drivescenegen_tpu.scripts.generation import load_model_for_sampling

    dst = tmp_path / "imported"
    import_reference.main(["--src", src, "--dst", str(dst)])

    cfg = load_config(None)
    _, _, params = load_model_for_sampling(cfg, str(dst))
    assert cfg.model.torch_pad_downsample
    _, expected = import_unet2d(src)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(expected),
        jax.tree_util.tree_leaves(params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
