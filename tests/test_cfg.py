import jax
import jax.numpy as jnp
import numpy as np

from drivescenegen_tpu.config import DiffusionConfig, ModelConfig, TrainConfig
from drivescenegen_tpu.diffusion import ddim_sample, make_schedule
from drivescenegen_tpu.diffusion.cfg import apply_cond_dropout, make_guided_denoise
from drivescenegen_tpu.models import UNet2D
from drivescenegen_tpu.training import create_optimizer, init_train_state, make_train_step

COND_TINY = ModelConfig(
    sample_size=16, in_channels=1, out_channels=1, cond_channels=2,
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    attention_head_dim=8, dtype="float32",
)


def test_cond_dropout_zeroes_subset():
    cond = jnp.ones((64, 4, 4, 2))
    out = apply_cond_dropout(cond, jax.random.key(0), 0.5)
    per_sample = np.asarray(out).reshape(64, -1).sum(axis=1)
    n_dropped = (per_sample == 0).sum()
    assert 10 < n_dropped < 54  # ~50%
    # Non-dropped samples untouched.
    kept = per_sample[per_sample > 0]
    np.testing.assert_allclose(kept, 4 * 4 * 2)
    # dropout_prob=0 is identity.
    np.testing.assert_array_equal(np.asarray(apply_cond_dropout(cond, jax.random.key(1), 0.0)), np.asarray(cond))


def test_guided_denoise_linearity():
    """With a linear mock model, CFG must satisfy
    eps_u + g * (eps_c - eps_u) exactly."""

    def apply_fn(params, x, t, cond):
        return x * 2.0 + (cond.sum(axis=-1, keepdims=True) if cond is not None else 0.0)

    cond = jnp.ones((2, 4, 4, 2)) * 0.3
    x = jnp.ones((2, 4, 4, 1))
    for g in (0.0, 1.0, 3.0):
        fn = make_guided_denoise(apply_fn, None, cond, guidance_scale=g)
        out = fn(x, jnp.int32(5))
        eps_c = x * 2.0 + 0.6
        eps_u = x * 2.0
        expect = eps_u + g * (eps_c - eps_u)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-6)


def test_conditional_train_step_runs_and_learns():
    model = UNet2D(COND_TINY)
    schedule = make_schedule(DiffusionConfig())
    tx, lrs = create_optimizer(TrainConfig(learning_rate=2e-3, lr_warmup_steps=5), 300)
    state = init_train_state(model, tx, jax.random.key(0), (16, 16, 1))
    step = jax.jit(make_train_step(model, schedule, tx, lrs, cond_dropout=0.1))

    # Batch layout: [cond R/G | target B]; target = mean of cond.
    rng = np.random.default_rng(0)
    def make_batch(b):
        cond = rng.uniform(-1, 1, (b, 16, 16, 2)).astype(np.float32)
        target = cond.mean(axis=-1, keepdims=True)
        return jnp.asarray(np.concatenate([cond, target], axis=-1))

    losses = []
    for _ in range(40):
        state, m = step(state, make_batch(8), jax.random.key(1))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), "cond model not learning"


def test_guided_sampling_shapes_and_determinism():
    model = UNet2D(COND_TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)),
                        jnp.zeros((1,), jnp.int32))
    schedule = make_schedule(DiffusionConfig())
    cond = jnp.ones((2, 16, 16, 2)) * 0.2
    fn = make_guided_denoise(model.apply, params, cond, guidance_scale=2.0)
    out1 = ddim_sample(fn, schedule, (2, 16, 16, 1), jax.random.key(7), 5)
    out2 = ddim_sample(fn, schedule, (2, 16, 16, 1), jax.random.key(7), 5)
    assert out1.shape == (2, 16, 16, 1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_eval_cond_agents_cli_end_to_end(tmp_path):
    """The config-5 evaluation CLI end to end on a tiny conditional model:
    params export -> load_model_for_sampling -> guidance sweep -> JSON out.
    Guards the harvest's config-5 leg (scripts/eval_cond_agents.py), which
    had never been exercised as a whole before round 4."""
    import json
    import os

    from PIL import Image

    from drivescenegen_tpu.config import Config, save_config
    from drivescenegen_tpu.scripts import eval_cond_agents
    from drivescenegen_tpu.training.checkpoint import save_params_only

    model = UNet2D(COND_TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32)
    )
    model_dir = tmp_path / "model"
    os.makedirs(model_dir)
    save_params_only(str(model_dir), params)
    cfg = Config()
    cfg.model = COND_TINY
    save_config(cfg, str(model_dir / "config.yaml"))

    ras_dir = tmp_path / "ras"
    os.makedirs(ras_dir)
    rng = np.random.default_rng(0)
    for i in range(3):
        img = np.full((16, 16, 3), 128, np.uint8)
        img[rng.integers(2, 14), :, 0] = 240  # a lane-ish stroke
        img[rng.integers(2, 13) : rng.integers(13, 15), 4:7, 2] = 220  # blue blob
        Image.fromarray(img).save(ras_dir / f"{i}.png")

    out = tmp_path / "cfg_eval.json"
    cfg_yaml = tmp_path / "cfg.yaml"
    save_config(cfg, str(cfg_yaml))
    eval_cond_agents.main([
        "--cfg_file", str(cfg_yaml), "--model_dir", str(model_dir),
        "--raster_dir", str(ras_dir), "--guidance", "1,3",
        "--num", "3", "--batch_size", "2", "--steps", "2",
        "--json_out", str(out),
    ])
    with open(out) as f:
        res = json.load(f)
    assert res["n_images"] == 3
    assert set(res["results"]) == {"guidance_1", "guidance_3"}
    for r in res["results"].values():
        for k in ("precision", "recall", "f1", "mean_center_err_m", "n_pred"):
            assert k in r
