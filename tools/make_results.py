"""Generate RESULTS.md: all BLR samplers on australian, TPU, vs paper Table 3.

Usage: PYTHONPATH=. python tools/make_results.py [--dataset australian]

Chain counts are sized per sampler cost; ESS uses the reference Geyer
estimator, timing is steady-state sampling-phase only (experiments.py
protocol).  Paper numbers: main_article.pdf Table 3 / BASELINE.md.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from riemannhamiltonianmontecarlo_tpu.experiments import run_experiment

# (sampler, chains, samples, burn_in) -- sized so each row takes O(10-60s).
CONFIGS = [
    ("metropolis", 1024, 1000, 500),
    ("hmc", 1024, 1000, 300),
    ("mala", 2048, 2000, 1000),
    ("mmala", 2048, 2000, 500),
    ("mmala_simplified", 2048, 2000, 500),
    ("iwls", 2048, 2000, 500),
    ("gibbs", 256, 600, 200),
    ("rmhmc", 2048, 1000, 300),
    ("rmhmc_studentt", 2048, 1000, 300),
]

# Paper Table 3 (australian): s/minESS.
PAPER_S_PER_MIN_ESS = {
    "metropolis": 0.034,
    "hmc": 0.027,
    "mala": 0.12,
    "mmala": 0.016,
    "mmala_simplified": 0.006,
    "iwls": 1.3,
    "gibbs": 10.9,
    "rmhmc": 0.016,
    "rmhmc_studentt": 0.081,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="australian")
    ap.add_argument("--out", default="RESULTS.md")
    args = ap.parse_args()

    rows = []
    for sampler, chains, samples, burn in CONFIGS:
        print(f"--- {sampler} ({chains} chains x {samples})", flush=True)
        try:
            res = run_experiment(
                sampler,
                args.dataset,
                num_chains=chains,
                num_samples=samples,
                burn_in=burn,
                ess_mode="device",
            )
        except Exception as e:  # keep the table going
            print(f"    FAILED: {e}", flush=True)
            rows.append((sampler, None))
            continue
        print("   ", res.summary().splitlines()[2].strip(), flush=True)
        rows.append((sampler, res))

    lines = [
        f"# RESULTS -- {args.dataset}, single TPU v5e chip",
        "",
        "All samplers at reference hyperparameters (utils/config.py presets),",
        "MAP+jitter init, Geyer ESS (device, alias-free ACF) summed over chains, timing =",
        "steady-state sampling phase only.  Paper column: Table 3 single-chain",
        "MATLAB s/minESS (BASELINE.md).  speedup = paper / ours.",
        "",
        "| sampler | chains | samples | accept | total minESS | time (s) | s/minESS | paper s/minESS | speedup |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for sampler, res in rows:
        paper = PAPER_S_PER_MIN_ESS.get(sampler)
        if res is None:
            lines.append(f"| {sampler} | -- | -- | FAILED | | | | {paper} | |")
            continue
        speedup = paper / res.time_per_min_ess if paper else float("nan")
        lines.append(
            f"| {sampler} | {res.num_chains} | {res.num_samples} | "
            f"{res.accept_rate:.3f} | {res.ess_min:.0f} | "
            f"{res.sampling_time_s:.3f} | {res.time_per_min_ess:.2e} | "
            f"{paper} | {speedup:,.0f}x |"
        )
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
