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
