"""Generate the StochVol / LGC / FHN sections of RESULTS.md (paper Tables 8-11).

Usage: PYTHONPATH=. python tools/make_results_all.py [--workload stochvol|lgc|fhn|all]

Protocol (same as tools/make_results.py): reference hyperparameters,
timed sampling phase only (first half absorbs compilation, second half is
timed and doubled), Geyer ESS (device, alias-free) summed over chains,
s/minESS vs the single-chain MATLAB numbers of main_article.pdf
Tables 8-11 (BASELINE.md).

Each workload's table replaces the block between
``<!-- section:NAME -->`` / ``<!-- end:NAME -->`` markers in RESULTS.md
(appended if absent), so sections regenerate independently.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from riemannhamiltonianmontecarlo_tpu import parallel
from riemannhamiltonianmontecarlo_tpu.diagnostics.ess import ess_geyer_device
from riemannhamiltonianmontecarlo_tpu.models import fhn, lgc, stochvol
from riemannhamiltonianmontecarlo_tpu.samplers import (
    hmc,
    mala,
    metropolis,
    mmala,
    phmc,
    rmhmc,
)
from riemannhamiltonianmontecarlo_tpu.samplers import stochvol as sv_kernel

RESULTS = Path(__file__).resolve().parents[1] / "RESULTS.md"


def timed_halves(kernel, init, *, burn_in: int, num_samples: int, seed: int = 0,
                 collect_fn=None, init_state=None):
    """Warmup (untimed) then two sampling halves; returns (samples, accept, t).

    ``init_state`` skips the warmup (e.g. after an adaptive warmup whose
    state wrapper differs from the sampling kernel's).
    """
    key = jax.random.key(seed)
    k_w, k_a, k_b = jax.random.split(key, 3)
    if init_state is not None:
        warm = parallel.run(kernel, k_w, None, num_samples=1, collect=False,
                            init_state=init_state)
    else:
        warm = parallel.run(kernel, k_w, init, num_samples=burn_in, collect=False)
    jax.block_until_ready(jax.tree.leaves(warm.final_state)[0])

    half = max(num_samples // 2, 1)
    res_a = parallel.run(kernel, k_a, None, num_samples=half, init_state=warm.final_state,
                         collect_fn=collect_fn)
    jax.block_until_ready(jax.tree.leaves(res_a.samples)[0])
    t0 = time.perf_counter()
    res_b = parallel.run(kernel, k_b, None, num_samples=half, init_state=res_a.final_state,
                         collect_fn=collect_fn)
    jax.block_until_ready(jax.tree.leaves(res_b.samples)[0])
    t = 2.0 * (time.perf_counter() - t0)

    samples = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=1),
                           res_a.samples, res_b.samples)
    accept = 0.5 * (float(res_a.accept_rate) + float(res_b.accept_rate))
    return samples, accept, t


def timed_halves_segmented(kernel, init, *, burn_in: int, num_samples: int,
                           seg: int = 20, seed: int = 0):
    """timed_halves in ``seg``-step device calls.

    The axon-tunneled backend kills device programs that run for minutes
    (observed on FHN HMC: 150 leapfrogs x 1000-step RK4 sensitivity
    solves per sample); chaining short scans through ``init_state`` keeps
    each RPC bounded while preserving the two-half timing protocol.
    """
    key = jax.random.key(seed)

    def run_segs(k, state, steps, collect):
        outs = []
        for i in range(0, steps, seg):
            n = min(seg, steps - i)
            r = parallel.run(kernel, jax.random.fold_in(k, i), None if state is not None else init,
                             num_samples=n, collect=collect, init_state=state)
            state = r.final_state
            if collect:
                outs.append(r.samples)
            jax.block_until_ready(jax.tree.leaves(state)[0])
        samples = jnp.concatenate(outs, axis=1) if collect else None
        return state, samples, (float(r.accept_rate) if steps else 0.0)

    k_w, k_a, k_b = jax.random.split(key, 3)
    state, _, _ = run_segs(k_w, None, burn_in, False)
    half = max(num_samples // 2, 1)
    state, sa, acc_a = run_segs(k_a, state, half, True)
    t0 = time.perf_counter()
    state, sb, acc_b = run_segs(k_b, state, half, True)
    t = 2.0 * (time.perf_counter() - t0)
    samples = jnp.concatenate([sa, sb], axis=1)
    return samples, 0.5 * (acc_a + acc_b), t


def ess_stats(samples) -> tuple[float, float, float]:
    """(min, med, max) over coordinates of chain-summed Geyer ESS."""
    ess = np.asarray(ess_geyer_device(samples))
    return float(ess.min()), float(np.median(ess)), float(ess.max())


def fmt(x: float) -> str:
    return f"{x:.3g}" if abs(x) < 1000 else f"{x:,.0f}"


def row(name, chains, samples, accept, ess, t, paper):
    mn, md, mx = ess
    spm = t / mn if mn > 0 else float("inf")
    speedup = f"{paper / spm:,.0f}x" if paper else "--"
    return (f"| {name} | {chains} | {samples} | {accept:.3f} "
            f"| ({fmt(mn)}, {fmt(md)}, {fmt(mx)}) | {t:.3f} | {spm:.3g} "
            f"| {paper if paper else '--'} | {speedup} |")


HEADER = ("| sampler | chains | samples | accept | total ESS (min, med, max) "
          "| time (s) | s/minESS | paper s/minESS | speedup |\n"
          "|---|---|---|---|---|---|---|---|---|")


# ---------------------------------------------------------------- StochVol

def run_stochvol() -> str:
    """Two tables: hyperparameters (Table 8) and latent volatilities (Table 9)."""
    y, _ = stochvol.generate_data(seed=0, num_obs=2000)
    model = stochvol.StochVolModel(jnp.asarray(y, jnp.float32))

    # (label, config, chains, samples, burn, paper_hyper, paper_latent)
    rows = [
        ("mala", sv_kernel.StochVolConfig(
            method="mala", latent_step_size=0.05 / 2000 ** 0.5,
            hyper_step_size=0.01 / 2000 ** 0.5), 128, 2000, 2000, 3.89, 4.5),
        ("hmc", sv_kernel.StochVolConfig(
            method="hmc", latent_num_leapfrog=100, latent_step_size=0.03,
            hyper_num_leapfrog=100, hyper_step_size=0.015), 64, 1000, 300, 5.19, 1.04),
        ("mmala", sv_kernel.StochVolConfig(
            method="mmala", latent_step_size=0.07, hyper_step_size=1.0), 128, 2000, 1000,
         142.8, 34.2),
        ("rmhmc", sv_kernel.StochVolConfig(), 64, 1000, 300, 2.37, 0.34),
    ]

    hyper_rows, latent_rows = [], []
    for name, cfg, chains, samples, burn, paper_h, paper_l in rows:
        print(f"--- stochvol/{name} ({chains} chains x {samples})", flush=True)
        kernel = sv_kernel.build(model, cfg)
        init = jnp.tile(jnp.asarray([0.5, 0.5, 0.5], jnp.float32), (chains, 1))
        try:
            (theta, x), accept, t = timed_halves(
                kernel, init, burn_in=burn, num_samples=samples,
                collect_fn=lambda st: (st.position, st.x))
        except Exception as e:
            print(f"    FAILED: {e}", flush=True)
            continue
        e_h, e_l = ess_stats(theta), ess_stats(x)
        print(f"    accept={accept:.3f} t={t:.2f}s hyperESS={e_h} latentESS(min)={e_l[0]:.0f}",
              flush=True)
        hyper_rows.append(row(name, chains, samples, accept, e_h, t, paper_h))
        latent_rows.append(row(name, chains, samples, accept, e_l, t, paper_l))

    return (
        "## Stochastic volatility -- T=2000 simulated obs "
        "(beta=0.65, sigma=0.15, phi=0.98), single TPU v5e chip\n\n"
        "Two-block Gibbs samplers at reference hyperparameters "
        "(Stoch_Vol/*/StochVol_*.m); ESS on the constrained (beta, sigma, phi)\n"
        "and on all 2000 latent volatilities.  Paper columns: Tables 8/9.\n\n"
        "### Hyperparameters (paper Table 8)\n\n" + HEADER + "\n"
        + "\n".join(hyper_rows) + "\n\n"
        "### Latent volatilities (paper Table 9)\n\n" + HEADER + "\n"
        + "\n".join(latent_rows)
    )


# ---------------------------------------------------------------- LGC

def run_lgc() -> str:
    """Latent-field sampling on the full 64x64 grid (paper Table 10)."""
    y, _ = lgc.generate_data(seed=0, n=64)
    model = lgc.LGCModel(jnp.asarray(y, jnp.float32), n=64)
    prior = model.prior_mean()

    def init_at_mean(chains):
        return jnp.tile(prior, (chains, 1))

    rows = []

    # Whitened MALA, transient tuning (LGC_MALA_Transient.m:32-33).
    wh = model.whitened()
    lift = jax.jit(jax.vmap(wh.to_x))
    print("--- lgc/mala (transient)", flush=True)
    kernel = mala.build(wh, mala.MALAConfig(step_size=2.0, transient=True))
    gamma, accept, t = timed_halves(
        kernel, jnp.zeros((16, model.dim)), burn_in=1000, num_samples=1000)
    x = lift(gamma)  # ESS measured on the field x = mu + L gamma, like the paper
    rows.append(row("mala (transient)", 16, 1000, accept, ess_stats(x), t, 10605))
    print("   ", rows[-1], flush=True)

    # Stationary phase: the paper's eps=1.65^2 is tuned for the authors'
    # *position-dependent* whitening (LGC_MALA_Stationary.m:103-105
    # re-Choleskys (Sigma^-1 + diag(x))^-1 every iteration -- the O(D^3)
    # per-step cost behind their 31118 s).  Our whitening is the fixed
    # prior Cholesky, so that constant does not transfer; the step is
    # dual-averaged to the 0.574 Langevin optimum during warmup (zero
    # hand tuning) and frozen for the timed phase.
    print("--- lgc/mala (stationary, adapted)", flush=True)
    import dataclasses as _dc

    from riemannhamiltonianmontecarlo_tpu.parallel import (
        AdaptationConfig, adaptive, frozen_step_size,
    )

    cfg0 = mala.MALAConfig(step_size=0.5)
    warm_kernel = adaptive(mala.build, wh, cfg0,
                           AdaptationConfig(target_accept=0.574))
    warm = parallel.run(warm_kernel, jax.random.key(3),
                        jnp.zeros((16, model.dim)), num_samples=1000, collect=False)
    eps = frozen_step_size(warm.final_state)
    print(f"    adapted eps = {eps:.4g}", flush=True)
    kernel = mala.build(wh, _dc.replace(cfg0, step_size=eps))
    gamma, accept, t = timed_halves(kernel, None, burn_in=0, num_samples=1000,
                                    init_state=warm.final_state.inner)
    x = lift(gamma)
    rows.append(row("mala (stationary, adapted eps)", 16, 1000, accept,
                    ess_stats(x), t, 7836))
    print("   ", rows[-1], flush=True)

    # mMALA with the position-dependent metric (LGC_mMALA_LV.m:31-34).
    print("--- lgc/mmala", flush=True)
    try:
        kernel = mmala.build(model, mmala.MMALAConfig(step_size=0.07, jitter=1e-5))
        # 8 chains: the per-step cost is the batched D=4096 Cholesky of
        # G(x), which utilizes the chip far better at batch 8 than 2
        # (G + factor = 128 MB/chain, so 8 chains ~ 1 GB HBM).
        x, accept, t = timed_halves(kernel, init_at_mean(8), burn_in=150, num_samples=200)
        rows.append(row("mmala", 8, 200, accept, ess_stats(x), t, 24.1))
        print("   ", rows[-1], flush=True)
    except Exception as e:
        print(f"    FAILED: {e}", flush=True)

    # Constant-metric RMHMC == preconditioned HMC (LGC_RMHMC_LV.m:95-101,149-196).
    print("--- lgc/rmhmc", flush=True)
    kernel = phmc.build(model, model.metric_chol, model.metric_inv,
                        phmc.PHMCConfig(step_size=0.1, num_leapfrog=30))
    x, accept, t = timed_halves(kernel, init_at_mean(16), burn_in=500, num_samples=1000)
    rows.append(row("rmhmc (constant metric)", 16, 1000, accept, ess_stats(x), t, 1.5))
    print("   ", rows[-1], flush=True)

    return (
        "## Log-Gaussian Cox process -- 64x64 grid (D=4096 latents), "
        "single TPU v5e chip\n\n"
        "Latent-field sampling at reference hyperparameters "
        "(Log_Gaussian_Cox/*/LGC_*.m); ESS over all 4096 field coordinates\n"
        "(whitened-MALA ESS measured on the field x = mu + L gamma).  "
        "Paper column: Table 10.\n\n" + HEADER + "\n" + "\n".join(rows)
    )


# ---------------------------------------------------------------- FHN

def run_fhn() -> str:
    """FitzHugh-Nagumo parameter inference (paper Table 11)."""
    data, _ = fhn.generate_data(seed=1, num_obs=200)
    model = fhn.FHNModel(jnp.asarray(data, jnp.float32), substeps=5)
    theta0 = jnp.asarray([0.2, 0.2, 3.0], jnp.float32)

    rows_cfg = [
        ("metropolis", lambda: metropolis.build(
            model, metropolis.AMHConfig(init_proposal_sd=0.05)), 512, 2000, 1000, 0.17),
        ("mala", lambda: mala.build(model, mala.MALAConfig(step_size=2e-4)),
         512, 2000, 1000, 0.67),
        # L=150 leapfrogs x 1000-step RK4 sensitivity solves per sample: the
        # longest sequential chain in the suite (paper: 8154 s).  Keep the
        # on-device scan segments short enough for the tunneled backend.
        ("hmc", lambda: hmc.build(model, hmc.HMCConfig(step_size=1 / 150, num_leapfrog=150)),
         64, 400, 200, 0.23),
        ("mmala", lambda: mmala.build(model, mmala.MMALAConfig(step_size=1.0, jitter=1e-6)),
         512, 2000, 500, 0.037),
        ("mmala_simplified", lambda: mmala.build(
            model, mmala.MMALAConfig(step_size=1.0, simplified=True, jitter=1e-6)),
         512, 2000, 500, 0.031),
        ("rmhmc", lambda: rmhmc.build(model, rmhmc.RMHMCConfig(
            step_size=0.5, num_leapfrog=6, num_fixed_point=5, jitter=1e-6)),
         256, 1000, 300, 0.08),
    ]

    rows = []
    for name, build, chains, samples, burn, paper in rows_cfg:
        print(f"--- fhn/{name} ({chains} chains x {samples})", flush=True)
        init = jnp.tile(theta0, (chains, 1)) * (
            1.0 + 0.05 * jax.random.normal(jax.random.key(11), (chains, 3)))
        try:
            if name == "hmc":  # see timed_halves_segmented docstring
                s, accept, t = timed_halves_segmented(
                    build(), init, burn_in=burn, num_samples=samples, seg=20)
            else:
                s, accept, t = timed_halves(build(), init, burn_in=burn, num_samples=samples)
        except Exception as e:
            print(f"    FAILED: {e}", flush=True)
            continue
        rows.append(row(name, chains, samples, accept, ess_stats(s), t, paper))
        print("   ", rows[-1], flush=True)

    return (
        "## FitzHugh-Nagumo ODE -- 3 parameters, 200 time points, "
        "noise sd 0.5, single TPU v5e chip\n\n"
        "Parameter inference at reference hyperparameters (Matlab_ODEs/MCMC/ODE_*.m),\n"
        "sensitivities via jacfwd through the RK4 integrator; data generated at\n"
        "(a, b, c) = (0.2, 0.2, 3) per RunFHN_RMHMC.m:35-52.  Paper column: Table 11\n"
        "(total time / minESS).\n\n" + HEADER + "\n" + "\n".join(rows)
    )


WORKLOADS = {"stochvol": run_stochvol, "lgc": run_lgc, "fhn": run_fhn}


def splice(text: str, name: str, section: str) -> str:
    start, end = f"<!-- section:{name} -->", f"<!-- end:{name} -->"
    block = f"{start}\n{section}\n{end}"
    if start in text:
        pre = text[: text.index(start)]
        post = text[text.index(end) + len(end):]
        return pre + block + post
    return text.rstrip() + "\n\n" + block + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="all", choices=[*WORKLOADS, "all"])
    args = ap.parse_args()
    names = list(WORKLOADS) if args.workload == "all" else [args.workload]
    for name in names:
        section = WORKLOADS[name]()
        text = RESULTS.read_text() if RESULTS.exists() else "# RESULTS\n"
        RESULTS.write_text(splice(text, name, section))
        print(f"=== wrote section {name} to {RESULTS}", flush=True)


if __name__ == "__main__":
    main()
