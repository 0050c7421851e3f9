"""End-to-end pipeline demo on synthetic data: all five stages + metrics in
one command, no Waymo data required.

  python -m drivescenegen_tpu.scripts.run_demo --work_dir /tmp/dsg_demo \
      --n_scenarios 16 --train_steps 50

Runs: preprocess(synthetic) -> rasterize -> train -> generate -> vectorize
-> compute_map_metrics, and prints a stage-time summary. This is the
fastest way to see the whole framework working and the model of how the
real (Waymo) pipeline is driven.
"""

from __future__ import annotations

import argparse
import glob
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="Pipeline demo")
    parser.add_argument("--work_dir", default="/tmp/dsg_demo", type=str)
    parser.add_argument("--n_scenarios", default=16, type=int)
    parser.add_argument("--train_steps", default=50, type=int)
    parser.add_argument("--img_res", default=64, type=int)
    parser.add_argument("--gen_batches", default=2, type=int)
    parser.add_argument("--sampler", default="ddim", type=str)
    parser.add_argument("--steps", default=50, type=int)
    args = parser.parse_args(argv)

    wd = args.work_dir
    os.makedirs(wd, exist_ok=True)
    times = {}

    def stage(name, fn):
        t0 = time.perf_counter()
        fn()
        times[name] = time.perf_counter() - t0
        print(f"[demo] {name}: {times[name]:.1f}s")

    from drivescenegen_tpu.scripts import (
        compute_map_metrics,
        data_preprocess,
        data_rasterization,
        generation,
        train,
        vectorization,
    )

    cfg_path = os.path.join(wd, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
model:
  sample_size: {args.img_res}
  block_out_channels: [32, 64]
  layers_per_block: 1
  norm_num_groups: 8
  attention_head_dim: 8
train:
  batch_size: 8
  learning_rate: 0.002
  lr_warmup_steps: 10
  log_every: 25
  eval_inference_steps: 50
  save_image_epochs: 100000
  save_model_epochs: 100000
  output_dir: {wd}/model
  dataset_glob: "{wd}/rasterized/GT_70k_s80_dxdy_agents_img/*"
generation:
  model_dir: {wd}/model
  output_dir: {wd}/generated
""")

    import sys

    argv0 = sys.argv
    try:
        sys.argv = ["data_preprocess", "--synthetic", str(args.n_scenarios),
                    "--save_path", f"{wd}/preprocessed"]
        stage("preprocess", data_preprocess.main)

        sys.argv = ["data_rasterization", "--load_path", f"{wd}/preprocessed",
                    "--save_path", f"{wd}/rasterized", "--n_workers", "4",
                    "--cfg_file", cfg_path]
        # rasterizer reads raster cfg; img_res override:
        with open(cfg_path, "a") as f:
            f.write(f"raster:\n  img_res: {args.img_res}\n")
        stage("rasterize", data_rasterization.main)
    finally:
        sys.argv = argv0

    stage("train", lambda: train.main(
        ["--cfg_file", cfg_path, "--max_steps", str(args.train_steps)]
    ))
    stage("generate", lambda: generation.main(
        ["--cfg_file", cfg_path, "--sampler", args.sampler,
         "--steps", str(args.steps), "--batch_size", "8",
         "--num_batches", str(args.gen_batches)]
    ))
    # Best-effort on the generated samples (a briefly-trained demo model
    # mostly produces noise, which the vectorizer rejects quickly)...
    stage("vectorize_generated", lambda: vectorization.main(
        ["--load_path", f"{wd}/generated", "--save_path", f"{wd}/vec_gen",
         "--n_workers", "4"]
    ))
    # ...and the real vectorization demo on the clean GT rasters.
    stage("vectorize", lambda: vectorization.main(
        ["--load_path", f"{wd}/rasterized/GT_70k_s80_dxdy_agents_img",
         "--save_path", f"{wd}/vec", "--n_workers", "4"]
    ))

    # GT side for metrics.
    def gt_export():
        import pickle

        from drivescenegen_tpu.data.graph_export import export_scenario

        for i, path in enumerate(sorted(glob.glob(f"{wd}/preprocessed/sample_*.pkl"))):
            with open(path, "rb") as f:
                info = pickle.load(f)
            export_scenario(info, f"{wd}/gt", i)

    stage("gt_export", gt_export)

    # Model-quality metrics (GT vs generated samples) — only when some
    # generated samples survived vectorization (a smoke-trained model may
    # produce none).
    if glob.glob(f"{wd}/vec_gen/graph/*"):
        print("[demo] metrics vs GENERATED samples (model quality):")
        stage("metrics_generated", lambda: compute_map_metrics.main(
            ["--gt_dir", f"{wd}/gt", "--gen_dir", f"{wd}/vec_gen",
             "--map_range", "80", "--map_res", str(args.img_res)]
        ))
    else:
        print("[demo] no generated samples passed vectorization "
              "(expected for a briefly-trained smoke model) — skipping "
              "model-quality metrics")

    # Round-trip metrics (GT vs vectorized GT rasters) — measures the
    # rasterize->vectorize fidelity, NOT the model.
    print("[demo] metrics vs vectorized GT rasters (round-trip fidelity):")
    stage("metrics_roundtrip", lambda: compute_map_metrics.main(
        ["--gt_dir", f"{wd}/gt", "--gen_dir", f"{wd}/vec",
         "--map_range", "80", "--map_res", str(args.img_res)]
    ))

    total = sum(times.values())
    print(f"[demo] TOTAL {total:.1f}s — artifacts under {wd}")


if __name__ == "__main__":
    main()
