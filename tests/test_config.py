import dataclasses

import pytest

from drivescenegen_tpu.config import Config, load_config, save_config


def test_defaults_match_reference_pins():
    cfg = Config()
    # Pins from reference scripts/train.py:12-28 and config YAMLs.
    assert cfg.train.batch_size == 14
    assert cfg.train.num_epochs == 10
    assert cfg.train.learning_rate == 1e-5
    assert cfg.train.lr_warmup_steps == 500
    assert cfg.train.seed == 14555
    assert cfg.raster.map_range == 80.0
    assert cfg.model.block_out_channels == (64, 128, 256, 512)
    assert cfg.diffusion.num_train_timesteps == 1000
    assert cfg.generation.num_inference_steps == 750
    assert cfg.vectorize.method == "GRAPH_FIT"


def test_yaml_overlay_roundtrip(tmp_path):
    cfg = Config()
    path = tmp_path / "cfg.yaml"
    save_config(cfg, str(path))
    cfg2 = load_config(str(path))
    assert cfg2 == cfg


def test_overlay_partial(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text("train:\n  batch_size: 32\nmodel:\n  block_out_channels: [8, 16]\n")
    cfg = load_config(str(path))
    assert cfg.train.batch_size == 32
    assert cfg.model.block_out_channels == (8, 16)
    assert cfg.train.num_epochs == 10  # untouched default


def test_unknown_key_rejected(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text("train:\n  batch_sizes: 32\n")
    with pytest.raises(KeyError):
        load_config(str(path))


def test_frozen_semantics():
    cfg = Config()
    cfg2 = dataclasses.replace(cfg)
    assert cfg2 == cfg
