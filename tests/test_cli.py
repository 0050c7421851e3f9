"""CLI argument/validation behavior of the stage scripts (run via main(argv)
in-process on CPU; full-pipeline drives live in scripts/run_demo.py)."""

import numpy as np
import pytest
from PIL import Image


def test_train_rejects_dataset_smaller_than_batch(tmp_path):
    from drivescenegen_tpu.scripts import train

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / f"{i}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
        "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
        f"train:\n  batch_size: 8\n  output_dir: {tmp_path}/out\n"
        f"  dataset_glob: '{d}/*.png'\n"
    )
    with pytest.raises(SystemExit, match="samples < batch_size"):
        train.main(["--cfg_file", str(cfg), "--max_steps", "1"])


def test_generation_requires_cond_model_for_cond_dir(tmp_path):
    from drivescenegen_tpu.scripts import generation

    # Unconditional model dir with a config, --cond_dir given -> clear error.
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "config.yaml").write_text("model:\n  cond_channels: 0\n")
    with pytest.raises(SystemExit, match="cond_channels=0"):
        generation.main([
            "--model_dir", str(model_dir), "--output_dir", str(tmp_path / "o"),
            "--cond_dir", str(tmp_path),
        ])


def test_preprocess_empty_dir_errors(tmp_path):
    from drivescenegen_tpu.scripts import data_preprocess
    import sys

    argv = sys.argv
    try:
        sys.argv = ["x", "--load_path", str(tmp_path), "--save_path", str(tmp_path / "o")]
        with pytest.raises(SystemExit, match="no TFRecord"):
            data_preprocess.main()
    finally:
        sys.argv = argv


def test_rasterization_empty_dir_errors(tmp_path):
    from drivescenegen_tpu.scripts import data_rasterization
    import sys

    argv = sys.argv
    try:
        sys.argv = ["x", "--load_path", str(tmp_path), "--save_path", str(tmp_path / "o"),
                    "--n_workers", "1"]
        with pytest.raises(SystemExit, match="no scenario pickles"):
            data_rasterization.main()
    finally:
        sys.argv = argv


def test_vectorization_empty_dir_errors(tmp_path):
    from drivescenegen_tpu.scripts import vectorization

    with pytest.raises(SystemExit, match="no PNGs"):
        vectorization.main(["--load_path", str(tmp_path), "--save_path", str(tmp_path)])


def test_metrics_missing_graphs_errors(tmp_path):
    from drivescenegen_tpu.scripts import compute_map_metrics

    with pytest.raises(SystemExit, match="no graph pickles"):
        compute_map_metrics.main(["--gt_dir", str(tmp_path), "--gen_dir", str(tmp_path)])


def test_end_to_end_fused_pipeline(tmp_path):
    """Train a tiny model for one step, then run the fused sample+vectorize
    pipeline: PNGs, artifact dirs, and survivorship stats must appear, and
    n_ok + n_rejected + n_failed must account for every sampled scene."""
    import glob
    import json

    from drivescenegen_tpu.scripts import end_to_end, train

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(d / f"{i}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
        "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
        "  dtype: float32\n"
        f"train:\n  batch_size: 8\n  output_dir: {tmp_path}/out\n"
        f"  dataset_glob: '{d}/*.png'\n  ema_decay: 0.0\n"
    )
    train.main(["--cfg_file", str(cfg), "--max_steps", "1"])

    out = tmp_path / "e2e"
    end_to_end.main([
        "--cfg_file", str(cfg), "--model_dir", f"{tmp_path}/out",
        "--output_dir", str(out), "--num_scenes", "3", "--batch_size", "2",
        "--steps", "2", "--n_workers", "1",
    ])
    assert len(glob.glob(str(out / "diffusion" / "*.png"))) == 3
    with open(out / "vectorization_stats.json") as f:
        stats = json.load(f)
    assert stats["n_images"] == 3
    assert stats["n_ok"] + stats["n_rejected"] + stats["n_failed"] == 3
    for sub in ("vectorized", "graph", "agent"):
        assert (out / sub).is_dir()


def test_fused_and_two_stage_paths_are_byte_identical(tmp_path):
    """Same model + seed through scripts.generation and the fused
    scripts.end_to_end must write byte-identical PNGs: generation quantizes
    on the host from device floats, end_to_end quantizes on device — the
    round/clip arithmetic is IEEE-identical, and all downstream artifacts
    (masks, skeletons, graphs) derive from these bytes."""
    import glob

    from drivescenegen_tpu.scripts import end_to_end, generation, train

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(d / f"{i}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
        "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
        "  dtype: float32\n"
        f"train:\n  batch_size: 8\n  output_dir: {tmp_path}/out\n"
        f"  dataset_glob: '{d}/*.png'\n  ema_decay: 0.0\n"
    )
    train.main(["--cfg_file", str(cfg), "--max_steps", "1"])

    gen_dir = tmp_path / "gen"
    generation.main([
        "--cfg_file", str(cfg), "--model_dir", f"{tmp_path}/out",
        "--output_dir", str(gen_dir), "--num_batches", "1", "--batch_size", "8",
        "--sampler", "ddim", "--steps", "2", "--seed", "5",
    ])
    e2e_dir = tmp_path / "e2e"
    end_to_end.main([
        "--cfg_file", str(cfg), "--model_dir", f"{tmp_path}/out",
        "--output_dir", str(e2e_dir), "--num_scenes", "8", "--batch_size", "8",
        "--steps", "2", "--seed", "5", "--n_workers", "1",
    ])
    gen_pngs = sorted(glob.glob(str(gen_dir / "*.png")))
    e2e_pngs = sorted(glob.glob(str(e2e_dir / "diffusion" / "*.png")))
    assert len(gen_pngs) == len(e2e_pngs) == 8
    for g, e in zip(gen_pngs, e2e_pngs):
        # Compare decoded pixels (PNG encoder settings may differ between
        # save sites; the artifact contract is the pixel values).
        np.testing.assert_array_equal(
            np.asarray(Image.open(g)), np.asarray(Image.open(e)),
            err_msg=f"{g} vs {e}",
        )


def test_end_to_end_resume_skips_sampling(tmp_path, monkeypatch):
    """--resume must reuse on-disk PNGs: a second run over a completed
    output dir calls the sampler zero times and reproduces the same
    accounting totals."""
    import glob
    import json

    from drivescenegen_tpu.scripts import end_to_end, train

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(2)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(d / f"{i}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
        "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
        "  dtype: float32\n"
        f"train:\n  batch_size: 8\n  output_dir: {tmp_path}/out\n"
        f"  dataset_glob: '{d}/*.png'\n  ema_decay: 0.0\n"
    )
    train.main(["--cfg_file", str(cfg), "--max_steps", "1"])

    out = tmp_path / "e2e"
    base_args = [
        "--cfg_file", str(cfg), "--model_dir", f"{tmp_path}/out",
        "--output_dir", str(out), "--num_scenes", "3", "--batch_size", "2",
        "--steps", "2", "--n_workers", "1",
    ]
    end_to_end.main(base_args)
    first = {
        p: open(p, "rb").read()
        for p in glob.glob(str(out / "diffusion" / "*.png"))
    }
    assert len(first) == 3

    # Re-run with --resume and a booby-trapped sampler: it must not fire.
    from drivescenegen_tpu import diffusion

    def boom(*a, **k):
        raise AssertionError("sampler called despite complete on-disk run")

    monkeypatch.setattr(diffusion, "ddim_sample", boom)
    monkeypatch.setattr(end_to_end, "ddim_sample", boom)
    end_to_end.main(base_args + ["--resume"])
    with open(out / "vectorization_stats.json") as f:
        stats = json.load(f)
    assert stats["n_images"] == 3
    for p, data in first.items():
        assert open(p, "rb").read() == data, f"{p} changed on resume"


def test_end_to_end_dpm_sampler(tmp_path):
    """The fused pipeline accepts --sampler dpm (DPM-Solver++(2M)) and
    produces complete artifacts and survivorship accounting."""
    import glob
    import json

    from drivescenegen_tpu.scripts import end_to_end, train

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(d / f"{i}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
        "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
        "  dtype: float32\n"
        f"train:\n  batch_size: 8\n  output_dir: {tmp_path}/out\n"
        f"  dataset_glob: '{d}/*.png'\n  ema_decay: 0.0\n"
    )
    train.main(["--cfg_file", str(cfg), "--max_steps", "1"])

    out = tmp_path / "e2e_dpm"
    end_to_end.main([
        "--cfg_file", str(cfg), "--model_dir", f"{tmp_path}/out",
        "--output_dir", str(out), "--num_scenes", "2", "--batch_size", "2",
        "--sampler", "dpm", "--steps", "3", "--n_workers", "1",
    ])
    assert len(glob.glob(str(out / "diffusion" / "*.png"))) == 2
    with open(out / "vectorization_stats.json") as f:
        stats = json.load(f)
    assert stats["n_images"] == 2
    assert stats["sampler"] == "dpm-3"


def test_end_to_end_sde_sampler(tmp_path):
    """The fused pipeline accepts --sampler sde (SDE-DPM-Solver++(2M), the stochastic
    second-order solver) and
    produces complete artifacts and survivorship accounting."""
    import glob
    import json

    from drivescenegen_tpu.scripts import end_to_end, train

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(d / f"{i}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model:\n  sample_size: 16\n  block_out_channels: [8, 16]\n"
        "  layers_per_block: 1\n  norm_num_groups: 4\n  attention_head_dim: 8\n"
        "  dtype: float32\n"
        f"train:\n  batch_size: 8\n  output_dir: {tmp_path}/out\n"
        f"  dataset_glob: '{d}/*.png'\n  ema_decay: 0.0\n"
    )
    train.main(["--cfg_file", str(cfg), "--max_steps", "1"])

    out = tmp_path / "e2e_sde"
    end_to_end.main([
        "--cfg_file", str(cfg), "--model_dir", f"{tmp_path}/out",
        "--output_dir", str(out), "--num_scenes", "2", "--batch_size", "2",
        "--sampler", "sde", "--steps", "3", "--n_workers", "1",
    ])
    assert len(glob.glob(str(out / "diffusion" / "*.png"))) == 2
    with open(out / "vectorization_stats.json") as f:
        stats = json.load(f)
    assert stats["n_images"] == 2
    assert stats["sampler"] == "sde-3"


def test_rasterization_save_sidecar_matches_decode(tmp_path):
    """--save_sidecar writes the decoded-corpus sidecar at rasterization
    time; decoded_corpus must pick it up (digest hit, no decode) and its
    rows must be byte-equal to the PNG-decode path."""
    import glob
    import pickle
    import sys

    from drivescenegen_tpu.data.dataset import (
        RasterDataset,
        decoded_corpus,
        sidecar_path,
    )
    from drivescenegen_tpu.data.preprocess import decode_scenario
    from drivescenegen_tpu.data.synthetic import make_synthetic_scenario
    from drivescenegen_tpu.scripts import data_rasterization

    pre = tmp_path / "pre"
    pre.mkdir()
    for i in range(5):
        info = decode_scenario(make_synthetic_scenario(seed=i))
        with open(pre / f"sample_{i}.pkl", "wb") as f:
            pickle.dump(info, f)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("raster:\n  img_res: 64\n")

    argv = sys.argv
    try:
        sys.argv = ["x", "--load_path", str(pre), "--save_path",
                    str(tmp_path / "ras"), "--cfg_file", str(cfg),
                    "--n_workers", "2", "--save_sidecar"]
        data_rasterization.main()
    finally:
        sys.argv = argv

    out_dir = str(tmp_path / "ras" / "GT_70k_s80_dxdy_agents_img")
    pngs = sorted(glob.glob(out_dir + "/*.png"))
    assert len(pngs) == 5
    expected = sidecar_path(pngs, 64, 3, np.uint8)
    assert list(glob.glob(out_dir + "/.devcache_*.npy")) == [expected]

    # decoded_corpus must hit the sidecar; rows equal the decode path.
    ds = RasterDataset(out_dir + "/*.png", img_res=64, n_channels=3, raw=True)
    m = decoded_corpus(ds)
    for i in range(5):
        assert np.array_equal(m[i], ds[i])

    # Digest is spelling-insensitive: "./path" and "path" key identically
    # (config globs say "./outputs/..."; build scripts say "outputs/...").
    assert (
        sidecar_path(["./a/b.png", "./a/c.png"], 64, 3, np.uint8).split("/")[-1]
        == sidecar_path(["a/b.png", "a/c.png"], 64, 3, np.uint8).split("/")[-1]
    )
