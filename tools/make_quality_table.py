"""Render the round's quality table (STATUS.md format) from harvest
artifacts: model-vs-GT metrics JSON + the calibrated roundtrip-ceiling and
noise-floor rows + the 5k run's survivorship stats.

Usage:
  python tools/make_quality_table.py \
      [--model outputs/flagship/metrics_model_r4.json] \
      [--ceiling docs/results_r4/metrics_roundtrip_r4.json] \
      [--floor docs/results_r4/metrics_noise_floor_r4.json] \
      [--stats outputs/flagship/e2e5k_r4/vectorization_stats.json]

Pure host-side (no jax import). Prints markdown to stdout.
"""

from __future__ import annotations

import argparse
import json


def load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return None


def ab_table(glob_pat="outputs/flagship/ab_r4_*/vectorization_stats.json"):
    """Markdown table of the sampler A/B arms (rejection rate + throughput)."""
    import glob
    import os

    rows = []
    for p in sorted(glob.glob(glob_pat)):
        st = load(p)
        if not st:
            continue
        n = max(st.get("n_images", 0), 1)
        rej = (st.get("n_rejected", 0) + st.get("n_failed", 0)) / n
        arm = os.path.basename(os.path.dirname(p)).replace("ab_r4_", "")
        label = st.get("sampler")
        if st.get("eta") is not None:
            label = f"{label} eta={st['eta']:g} {st.get('spacing', '')}"
        rows.append((arm, label, n, rej, st.get("scenes_per_s")))
    if not rows:
        return
    print("| arm | sampler | n | rejection | scenes/s (fused) |")
    print("|---|---|---|---|---|")
    for arm, s, n, rej, tput in rows:
        print(f"| {arm} | {s} | {n} | {rej:.1%} | {tput if tput is not None else '—'} |")
    print()


def fd_table(model, ceil, floor):
    def fmt(x):
        if x is None:
            return "—"
        return f"{x:.4g}" if abs(x) < 1 else f"{x:.1f}" if abs(x) >= 10 else f"{x:.3g}"

    rows = list(model.get("frechet", {}).keys())
    print("| Frechet | model vs GT | roundtrip ceiling | noise floor | model/ceiling |")
    print("|---|---|---|---|---|")
    for k in rows:
        m = model["frechet"].get(k)
        c = (ceil or {}).get("frechet", {}).get(k)
        f = (floor or {}).get("frechet", {}).get(k)
        ratio = f"{m / c:.2f}x" if m is not None and c else "—"
        print(f"| {k} | {fmt(m)} | {fmt(c)} | {fmt(f)} | {ratio} |")
    for k in ("mmd_degrees", "mmd_spectrum"):
        m, c, f = model.get(k), (ceil or {}).get(k), (floor or {}).get(k)
        ratio = f"{m / c:.2f}x" if m is not None and c else "—"
        print(f"| {k.replace('mmd_', 'MMD ')} | {fmt(m)} | {fmt(c)} | {fmt(f)} | {ratio} |")
    print(f"\nn_gen_graphs={model.get('n_gen_graphs')} "
          f"n_gt_graphs={model.get('n_gt_graphs')}\n")


def run_header(stats, label):
    n = max(stats.get("n_images", 0), 1)
    rej = (stats.get("n_rejected", 0) + stats.get("n_failed", 0)) / n
    print(f"### {label}: {stats.get('sampler') or '(same samples)'} | "
          f"{stats.get('n_images')} scenes | "
          f"ok {stats.get('n_ok')} / rejected {stats.get('n_rejected')} / "
          f"failed {stats.get('n_failed')} (rejection {rej:.1%}) | "
          f"wall {stats.get('wall_time_s', 0):.0f}s"
          + (f" (sampling {stats['sampling_wall_s']:.0f}s)"
             if stats.get("sampling_wall_s") else ""))
    print()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ceiling", default="docs/results_r4/metrics_roundtrip_r4.json")
    ap.add_argument("--floor", default="docs/results_r4/metrics_noise_floor_r4.json")
    args = ap.parse_args()

    ceil, floor = load(args.ceiling), load(args.floor)

    ab_table()

    # One block per 5k-scale record: the as-run winner, the calibrated-gate
    # re-vectorization of the same samples, and the fast-arm (SDE-25) run.
    for run, label in (("e2e5k_r4", "as-run winner"),
                       ("e2e5k_r4cal", "calibrated gate (same samples)"),
                       ("e2e5k_r4sde", "fast arm SDE-25"),
                       ("e2e5k_r4q", "quality fallback")):
        stats = load(f"outputs/flagship/{run}/vectorization_stats.json")
        model = load(f"outputs/flagship/metrics_model_{run[6:]}.json")
        if not stats and not model:
            continue
        if stats:
            run_header(stats, label)
        if model:
            fd_table(model, ceil, floor)
        else:
            print("(metrics pending)\n")


if __name__ == "__main__":
    main()
