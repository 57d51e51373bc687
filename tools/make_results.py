"""Generate the BLR sections of RESULTS.md: all samplers x all 5 datasets, TPU.

Usage: PYTHONPATH=. python tools/make_results.py [--dataset australian|...|all]

Protocol: reference hyperparameters and iteration counts (utils/config.py
presets -- 5000 kept samples for every sampler, reference burn-in), timing
is the steady-state sampling phase only (experiments.py two-half protocol),
Geyer ESS (device, alias-free ACF) summed over chains.  Paper columns:
main_article.pdf Tables 3-7 single-chain MATLAB s/minESS (BASELINE.md).

Each dataset's table replaces the block between
``<!-- section:blr-NAME -->`` / ``<!-- end:blr-NAME -->`` markers in
RESULTS.md, so sections regenerate independently.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from riemannhamiltonianmontecarlo_tpu.experiments import run_experiment

RESULTS = Path(__file__).resolve().parents[1] / "RESULTS.md"

# Chain counts sized per sampler cost; samples/burn-in come from the
# reference presets (5000 kept for every BLR sampler).
CHAINS = {
    "metropolis": 1024,
    "hmc": 1024,
    "mala": 2048,
    "mmala": 2048,
    "mmala_simplified": 2048,
    "iwls": 2048,
    # Gibbs is serial-latency-bound in N (see samplers/gibbs.py docstring):
    # 256->1024 chains costs 35->69 ms/step but 4x the ESS, so ~2x better
    # s/minESS.
    "gibbs": 1024,
    "rmhmc": 2048,
    "rmhmc_studentt": 2048,
}

# Paper s/minESS per dataset: Tables 3 (australian), 4 (german), 5 (pima),
# 6 (heart), 7 (ripley) of main_article.pdf -- see BASELINE.md.
PAPER = {
    "australian": {"metropolis": 0.034, "gibbs": 10.9, "mala": 0.12, "hmc": 0.027,
                   "iwls": 1.3, "mmala": 0.016, "mmala_simplified": 0.006,
                   "rmhmc": 0.016, "rmhmc_studentt": 0.081},
    "german": {"metropolis": 0.140, "gibbs": 0.61, "mala": 0.037, "hmc": 0.037,
               "iwls": 1.86, "mmala": 0.070, "mmala_simplified": 0.012,
               "rmhmc": 0.052, "rmhmc_studentt": 0.065},
    "pima": {"metropolis": 0.011, "gibbs": 0.21, "mala": 0.005, "hmc": 0.014,
             "iwls": 0.386, "mmala": 0.0037, "mmala_simplified": 0.0018,
             "rmhmc": 0.0069, "rmhmc_studentt": 0.0098},
    "heart": {"metropolis": 0.010, "gibbs": 0.21, "mala": 0.0038, "hmc": 0.0085,
              "iwls": 0.85, "mmala": 0.0085, "mmala_simplified": 0.0043,
              "rmhmc": 0.0087, "rmhmc_studentt": 0.018},
    "ripley": {"metropolis": 0.035, "gibbs": 7.0, "mala": 0.029, "hmc": 0.0076,
               "iwls": 0.39, "mmala": 0.0075, "mmala_simplified": 0.0045,
               "rmhmc": 0.0065, "rmhmc_studentt": 0.011},
}

TABLE_NO = {"australian": 3, "german": 4, "pima": 5, "heart": 6, "ripley": 7}

# Bound each device call (the tunneled backend faults on multi-minute
# single XLA executions; experiments._chained).  Gibbs at 1024 chains runs
# ~69 ms/step -> 500-step calls ~35 s.
SEGMENT = {"gibbs": 500}
DEFAULT_SEGMENT = 1250

HEADER = ("| sampler | chains | samples | accept | divergent | max R-hat "
          "| total ESS (min, med, max) "
          "| time (s) | s/minESS | paper s/minESS | speedup |\n"
          "|---|---|---|---|---|---|---|---|---|---|---|")


def fmt(x: float) -> str:
    return f"{x:.3g}" if abs(x) < 1000 else f"{x:,.0f}"


def splice(text: str, name: str, section: str) -> str:
    start, end = f"<!-- section:{name} -->", f"<!-- end:{name} -->"
    block = f"{start}\n{section}\n{end}"
    if start in text:
        pre = text[: text.index(start)]
        post = text[text.index(end) + len(end):]
        return pre + block + post
    return text.rstrip() + "\n\n" + block + "\n"


def run_dataset(dataset: str) -> str:
    rows = []
    for sampler, chains in CHAINS.items():
        paper = PAPER[dataset][sampler]
        print(f"--- {dataset}/{sampler} ({chains} chains x 5000)", flush=True)
        try:
            res = run_experiment(sampler, dataset, num_chains=chains,
                                 ess_mode="device",
                                 max_steps_per_call=SEGMENT.get(sampler, DEFAULT_SEGMENT))
        except Exception as e:  # keep the table going
            print(f"    FAILED: {e}", flush=True)
            rows.append(f"| {sampler} | -- | -- | FAILED | | | | | | {paper} | |")
            continue
        print("   ", res.summary().splitlines()[2].strip(), flush=True)
        spm = res.time_per_min_ess
        rhat = f"{res.rhat_max:.3f}" if np.isfinite(res.rhat_max) else "--"
        rows.append(
            f"| {sampler} | {res.num_chains} | {res.num_samples} | "
            f"{res.accept_rate:.3f} | {res.divergences} | {rhat} | "
            f"({fmt(res.ess_min)}, {fmt(res.ess_median)}, "
            f"{fmt(res.ess_max)}) | {res.sampling_time_s:.3f} | {spm:.2e} | "
            f"{paper} | {paper / spm:,.0f}x |"
        )
    return (
        f"## BLR {dataset} (paper Table {TABLE_NO[dataset]}), single TPU v5e chip\n\n"
        "All samplers at reference hyperparameters and iteration counts\n"
        "(utils/config.py presets, 5000 kept samples), MAP+jitter init, Geyer ESS\n"
        "(device, alias-free ACF) summed over chains, timing = steady-state sampling\n"
        "phase only.  speedup = paper s/minESS / ours.\n\n"
        + HEADER + "\n" + "\n".join(rows)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="all",
                    choices=[*PAPER, "all"])
    args = ap.parse_args()
    names = list(PAPER) if args.dataset == "all" else [args.dataset]
    for name in names:
        section = run_dataset(name)
        text = RESULTS.read_text() if RESULTS.exists() else "# RESULTS\n"
        RESULTS.write_text(splice(text, f"blr-{name}", section))
        print(f"=== wrote section blr-{name} to {RESULTS}", flush=True)


if __name__ == "__main__":
    main()
