#!/bin/sh
# Wipe insurance (round 5): the 21:37Z host re-image destroyed a finished
# fine-tune + harvest because artifacts only lived under outputs/. This
# loop snapshots every round-5 result artifact into docs/results_r5/ and
# commits, unattended, every 5 min — so a crash of the interactive session
# or another re-image can no longer erase measured results.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/results_r5 docs/samples

snap() {  # snap <src> <dst-under-docs/results_r5>
    [ -f "$1" ] || return 0
    cmp -s "$1" "docs/results_r5/$2" 2>/dev/null && return 0
    cp "$1" "docs/results_r5/$2"
}

while :; do
    for d in outputs/flagship/ab_r5_*; do
        [ -f "$d/vectorization_stats.json" ] \
            && snap "$d/vectorization_stats.json" "ab_$(basename "$d" | sed 's/^ab_r5_//')_stats.json"
    done
    for f in outputs/flagship/pairing_*.txt; do
        [ -f "$f" ] && snap "$f" "$(basename "$f")"
    done
    snap outputs/flagship/e2e5k_r5/vectorization_stats.json e2e5k_r5_stats.json
    snap outputs/flagship/e2e5k_r5_budget.json e2e5k_r5_budget.json
    snap outputs/flagship/metrics_model_r5.json metrics_model_r5.json
    snap outputs/flagship/orientation_r5.txt orientation_r5.txt
    snap outputs/flagship/twoway_r5.txt twoway_r5.txt
    snap outputs/flagship/e2e5k_r5sde/vectorization_stats.json e2e5k_r5sde_stats.json
    snap outputs/flagship/metrics_model_r5sde.json metrics_model_r5sde.json
    snap outputs/flagship/twoway_r5sde.txt twoway_r5sde.txt
    snap outputs/cond128n/cfg_eval_r5.json cfg_eval_r5.json
    snap outputs/cond128n/cfg_eval.json cfg_eval_r5.json
    snap outputs/flagship/metrics_roundtrip_r5.json metrics_roundtrip_r5.json
    snap outputs/flagship/twoway_roundtrip_r5.txt twoway_roundtrip_r5.txt
    snap outputs/flagship/metrics_noise_floor_r5.json metrics_noise_floor_r5.json
    snap outputs/flagship/pairing_probe_r5.log pairing_probe_r5.log
    snap BENCH_local_r5.json BENCH_local_r5.json
    snap BENCH_gnconv_r5.json BENCH_gnconv_r5.json
    snap outputs/microbench_r5.md microbench_r5.md
    for f in outputs/probe_base_r5.log outputs/probe_gnconv_r5.log; do
        [ -f "$f" ] && snap "$f" "$(basename "$f")"
    done
    # a handful of eval samples: the visual pairing evidence
    i=0
    for f in outputs/flagship/model_r5/samples/*.png; do
        [ -f "$f" ] || continue
        cp -u "$f" "docs/samples/r5_$(basename "$f")" 2>/dev/null
        i=$((i + 1)); [ "$i" -ge 6 ] && break
    done
    i=0
    for f in outputs/flagship/e2e5k_r5/diffusion/*.png; do
        [ -f "$f" ] || continue
        cp -u "$f" "docs/samples/r5_e2e_$(basename "$f")" 2>/dev/null
        i=$((i + 1)); [ "$i" -ge 4 ] && break
    done
    if ! git diff --quiet --stat -- docs/results_r5 docs/samples 2>/dev/null \
       || [ -n "$(git status --porcelain docs/results_r5 docs/samples 2>/dev/null)" ]; then
        git add docs/results_r5 docs/samples 2>/dev/null \
            && git commit -q -m "r5 artifact snapshot ($(date -u +%H:%MZ))

No-Verification-Needed: unattended measurement-artifact snapshot, no code" \
            2>/dev/null \
            && echo "$(date -u +%FT%TZ) autocommit: snapshot committed"
    fi
    sleep 300
done
