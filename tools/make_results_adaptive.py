"""RESULTS.md section: dual-averaged step sizes vs hand-tuned presets.

Usage: PYTHONPATH=. python tools/make_results_adaptive.py [--dataset german]

The reference hand-tunes every step size per (sampler, dataset) -- the
paper's Table 2 (BASELINE.md) documents how sensitive RMHMC is to that
choice on german credit.  This table runs the same samplers twice:

* preset: the reference constant (utils/config.py);
* adapted: dual-averaging warmup on the pooled cross-chain acceptance
  (parallel/adaptation.py), starting from a dimension-blind default --
  ZERO per-dataset tuning.

Done-criterion (VERDICT round-1 item 5): adapted matches or beats the
hand-tuned preset on time/minESS.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from riemannhamiltonianmontecarlo_tpu.experiments import run_experiment
from make_results import splice  # section splicing

RESULTS = Path(__file__).resolve().parents[1] / "RESULTS.md"

SAMPLERS = [
    ("hmc", 1024),
    ("mala", 2048),
    ("mmala", 2048),
    ("mmala_simplified", 2048),
    ("rmhmc", 2048),
]

HEADER = ("| sampler | chains | preset eps | preset s/minESS | adapted eps "
          "| adapted accept | adapted s/minESS | adapted/preset "
          "| divergent (preset/adapted) | max R-hat (preset/adapted) |\n"
          "|---|---|---|---|---|---|---|---|---|---|")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="german")
    args = ap.parse_args()

    from riemannhamiltonianmontecarlo_tpu.utils.config import (
        MALA_STEP_SIZES, reference_preset)

    rows = []
    for sampler, chains in SAMPLERS:
        preset_kw = reference_preset(sampler, args.dataset).sampler_kwargs
        preset_eps = preset_kw.get("step_size",
                                   MALA_STEP_SIZES.get(args.dataset, "--")
                                   if sampler == "mala" else "--")
        print(f"--- {args.dataset}/{sampler} preset", flush=True)
        try:
            pre = run_experiment(sampler, args.dataset, num_chains=chains,
                                 ess_mode="device", max_steps_per_call=1250)
            print(f"--- {args.dataset}/{sampler} adapted", flush=True)
            ada = run_experiment(sampler, args.dataset, num_chains=chains,
                                 ess_mode="device", adapt=True,
                                 max_steps_per_call=1250)
        except Exception as e:
            print(f"    FAILED: {e}", flush=True)
            continue
        ratio = ada.time_per_min_ess / pre.time_per_min_ess
        rows.append(
            f"| {sampler} | {chains} | {preset_eps} | {pre.time_per_min_ess:.2e} "
            f"| {ada.adapted_step_size:.3g} | {ada.accept_rate:.3f} "
            f"| {ada.time_per_min_ess:.2e} | {ratio:.2f}x "
            f"| {pre.divergences}/{ada.divergences} "
            f"| {pre.rhat_max:.3f}/{ada.rhat_max:.3f} |"
        )
        print("   ", rows[-1], flush=True)

    section = (
        f"## Dual-averaged step sizes vs hand-tuned presets -- {args.dataset}, "
        "single TPU v5e chip\n\n"
        "Adapted runs start from a dimension-blind default step and warm up by\n"
        "dual averaging on the pooled acceptance of every chain (thousands of\n"
        "chains give a near-noiseless per-step acceptance signal, so the step\n"
        "converges in tens of iterations; parallel/adaptation.py).  Preset runs\n"
        "use the reference's hand-tuned constants.  adapted/preset < ~1 means\n"
        "zero-tuning matches or beats hand tuning (paper Table 2 shows RMHMC's\n"
        "sensitivity to (eps, L) on this dataset).\n\n"
        + HEADER + "\n" + "\n".join(rows)
    )
    text = RESULTS.read_text() if RESULTS.exists() else "# RESULTS\n"
    RESULTS.write_text(splice(text, f"adaptive-{args.dataset}", section))
    print(f"=== wrote section adaptive-{args.dataset}", flush=True)


if __name__ == "__main__":
    main()
