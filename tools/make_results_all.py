"""Generate the StochVol / LGC / FHN sections of RESULTS.md (paper Tables 8-11).

Usage: PYTHONPATH=. python tools/make_results_all.py \
    [--workload stochvol|lgc|fhn|all] [--seeds 3]

Protocol (VERDICT round-2 items 3/6): reference hyperparameters AND
reference kept-sample counts (StochVol 20000 per chain,
``StochVol_RMHMC.m:63-64``; LGC/FHN 5000, ``LGC_RMHMC_LV.m:30-31`` /
``ODE_RMHMC.m``), the authors' own datasets where they ship one
(``StochVolData1.mat``, ``TestData64.mat``; FHN data is generated from
known parameters exactly as ``RunFHN_RMHMC.m:35-52`` does), and
``--seeds`` independent repeats aggregated as mean +- stderr
(``Results/CalculateStatistics.m:7-31``).  Timing is the two-half
steady-state sampling phase; ESS is chain-summed Geyer (device,
alias-free).  Chain counts are sized so the kept-sample tensors
(C x 20000 x 2003 latents for StochVol) fit on one 16 GB chip.

Each workload's table replaces the block between
``<!-- section:NAME -->`` / ``<!-- end:NAME -->`` markers in RESULTS.md
(appended if absent), so sections regenerate independently.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from riemannhamiltonianmontecarlo_tpu import parallel
from riemannhamiltonianmontecarlo_tpu.diagnostics.ess import (
    ess_geyer_device,
    ess_geyer_device_parts,
)
from riemannhamiltonianmontecarlo_tpu.diagnostics.rhat import (
    split_rhat_device,
    split_rhat_parts,
)
from riemannhamiltonianmontecarlo_tpu.models import fhn, lgc, stochvol
from riemannhamiltonianmontecarlo_tpu.samplers import (
    hmc,
    mala,
    metropolis,
    mmala,
    phmc,
    pmala,
    rmhmc,
)
from riemannhamiltonianmontecarlo_tpu.samplers import stochvol as sv_kernel

RESULTS = Path(__file__).resolve().parents[1] / "RESULTS.md"
N_SEEDS = 3  # overridden by --seeds

# --only / --rows-file support: a multi-GB row (StochVol keeps
# C x 20000 x 2003 on device) can fragment the TPU arena and OOM every
# LATER row in the same process, so each row runs in a fresh process and
# appends its table line here; the last invocation (or --emit-only)
# assembles the section from all recorded rows.
ONLY: str | None = None
ROWS_FILE: Path | None = None
FAILURES = 0  # rows whose measurement raised; drives a nonzero exit code


N_SEEDS_ACTIVE = N_SEEDS  # set from --seeds; stamped into sidecar records


def record_row(workload: str, table: str, name: str, line: str) -> None:
    if ROWS_FILE is None:
        return
    with ROWS_FILE.open("a") as f:
        f.write(json.dumps({"workload": workload, "table": table,
                            "name": name, "line": line,
                            "seeds": N_SEEDS_ACTIVE}) + "\n")


def recorded_rows(workload: str, table: str) -> dict[str, str]:
    """name -> latest recorded table line (matching the current --seeds).

    Records stamped with a different seed count are skipped with a
    warning: a row measured under an old protocol must not be silently
    merged into a section whose prose states the current one
    (ADVICE round-3 low #1).
    """
    out: dict[str, str] = {}
    if ROWS_FILE is None or not ROWS_FILE.exists():
        return out
    for raw in ROWS_FILE.read_text().splitlines():
        r = json.loads(raw)
        if r["workload"] == workload and r["table"] == table:
            if r.get("seeds", N_SEEDS_ACTIVE) != N_SEEDS_ACTIVE:
                print(f"    [rows-file] skipping {r['name']}: recorded with "
                      f"seeds={r.get('seeds')} != current {N_SEEDS_ACTIVE}",
                      flush=True)
                continue
            out[r["name"]] = r["line"]
    return out


def skip_row(name: str) -> bool:
    return ONLY is not None and name != ONLY


def timed_halves(kernel, init, *, burn_in: int, num_samples: int, seed: int = 0,
                 collect_fn=None, init_state=None, seg: int | None = None,
                 parts: bool = False):
    """Warmup (untimed) then two sampling halves.

    Returns (samples, accept, divergences, t) -- ``divergences`` is the
    total divergent transitions over the whole sampling phase (both
    halves), the per-row count VERDICT round-4 item 4 asks every table to
    surface (reference analog: ``ODE_RMHMC.m:404-406`` failed-step
    accounting).

    ``init_state`` skips the warmup (e.g. after an adaptive warmup whose
    state wrapper differs from the sampling kernel's).  ``seg`` bounds
    each device call to that many steps (the tunneled backend kills
    minutes-long programs); the second half is still timed end to end.

    ``parts`` keeps the kept samples as the LIST of per-segment device
    arrays instead of concatenating -- concatenation doubles peak HBM
    (parts + result), which is what OOM'd the round-3 StochVol reruns,
    and the ~20 MB/s tunnel rules out host streaming.  Downstream ESS
    runs chunk-wise over coordinates via ``ess_geyer_device_parts``, so
    the full C x N x P tensor (10.2 GB at C=64 for StochVol) only ever
    exists as parts.
    """
    key = jax.random.key(seed)
    k_w, k_a, k_b = jax.random.split(key, 3)

    def run_chunk(k, state, steps, collect, position=None):
        if seg is None or steps <= seg:
            r = parallel.run(kernel, k, position, num_samples=steps,
                             collect=collect, init_state=state,
                             collect_fn=collect_fn if collect else None)
            jax.block_until_ready(jax.tree.leaves(
                r.samples if collect else r.final_state)[0])
            samples = [r.samples] if (collect and parts) else r.samples
            return r.final_state, samples, float(r.accept_rate), int(r.divergences)
        outs, accs, divs = [], [], 0
        for i in range(0, steps, seg):
            n = min(seg, steps - i)
            r = parallel.run(kernel, jax.random.fold_in(k, i),
                             position if state is None else None,
                             num_samples=n, collect=collect, init_state=state,
                             collect_fn=collect_fn if collect else None)
            state = r.final_state
            accs.append(float(r.accept_rate) * n)  # forces segment completion
            divs += int(r.divergences)
            if collect:
                outs.append(r.samples)
            jax.block_until_ready(jax.tree.leaves(state)[0])
        if not collect:
            samples = None
        elif parts:
            samples = outs  # list of per-segment collect trees
        else:
            samples = jax.tree.map(lambda *a: jnp.concatenate(a, axis=1), *outs)
        return state, samples, sum(accs) / steps, divs

    if init_state is not None:
        state, _, _, _ = run_chunk(k_w, init_state, 1, False)
    else:
        state, _, _, _ = run_chunk(k_w, None, max(burn_in, 1), False, position=init)

    half = max(num_samples // 2, 1)
    state, sa, acc_a, div_a = run_chunk(k_a, state, half, True)
    t0 = time.perf_counter()
    state, sb, acc_b, div_b = run_chunk(k_b, state, half, True)
    t = 2.0 * (time.perf_counter() - t0)

    if parts:
        samples = sa + sb  # list concat: segments in order
    else:
        samples = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=1), sa, sb)
    return samples, 0.5 * (acc_a + acc_b), div_a + div_b, t


def ess_stats(samples) -> tuple[float, float, float]:
    """(min, med, max) over coordinates of chain-summed Geyer ESS.

    ``samples`` is either one (C, N, P) array or a list of per-segment
    (C, N_i, P) device arrays (timed_halves(parts=True)).
    """
    if isinstance(samples, list):
        ess = ess_geyer_device_parts(samples)
    else:
        ess = np.asarray(ess_geyer_device(samples))
    return float(ess.min()), float(np.median(ess)), float(ess.max())


def rhat_max(samples) -> float:
    """Max split-R-hat over coordinates; accepts the same array-or-parts
    representations as ``ess_stats`` (single-chain rows return nan)."""
    if isinstance(samples, list):
        if samples[0].shape[0] < 2:
            return float("nan")
        return float(np.max(split_rhat_parts(samples)))
    if samples.shape[0] < 2:
        return float("nan")
    return float(np.max(np.asarray(split_rhat_device(samples))))


def fmt(x: float) -> str:
    return f"{x:.3g}" if abs(x) < 1000 else f"{x:,.0f}"


def aggregate_rows(per_seed):
    """per_seed: list of (ess_tuple, rhat, accept, t, div) -> dict.

    Mean +- stderr over independent repeats, the reference's
    CalculateStatistics.m:24-31 aggregation.  Divergences total over all
    seeds' sampling phases; R-hat is the worst (max) over seeds.
    """
    n = len(per_seed)
    ess = np.asarray([s[0] for s in per_seed], np.float64)  # (n, 3)
    rh = np.asarray([s[1] for s in per_seed], np.float64)
    acc = np.asarray([s[2] for s in per_seed], np.float64)
    ts = np.asarray([s[3] for s in per_seed], np.float64)
    div = int(sum(s[4] for s in per_seed))
    spm = ts / np.maximum(ess[:, 0], 1e-12)
    se = lambda v: float(v.std(ddof=1) / np.sqrt(n)) if n > 1 else 0.0  # noqa: E731
    return dict(
        ess_mean=ess.mean(0), accept=float(acc.mean()),
        t=float(ts.mean()), t_se=se(ts),
        spm=float(spm.mean()), spm_se=se(spm), n=n,
        div=div, rhat=float(np.nanmax(rh)) if np.isfinite(rh).any() else float("nan"),
    )


def row(name, chains, samples, agg, paper):
    """``paper`` may be a float or a tuple of (label, value) pairs -- the
    latter renders one measured row against several paper baselines (the
    LGC whitened-MALA row vs the paper's transient AND stationary rows)."""
    mn, md, mx = agg["ess_mean"]
    if isinstance(paper, tuple):
        paper_cell = " / ".join(f"{v} ({lbl})" for lbl, v in paper)
        speedup = " / ".join(f"{v / agg['spm']:,.0f}x" for _, v in paper)
    else:
        paper_cell = paper if paper else "--"
        speedup = f"{paper / agg['spm']:,.0f}x" if paper else "--"
    rhat = f"{agg['rhat']:.3f}" if np.isfinite(agg["rhat"]) else "--"
    return (f"| {name} | {chains} | {samples} | {agg['accept']:.3f} "
            f"| {agg['div']} | {rhat} "
            f"| ({fmt(mn)}, {fmt(md)}, {fmt(mx)}) "
            f"| {agg['t']:.3f} ± {agg['t_se']:.3f} "
            f"| {agg['spm']:.3g} ± {agg['spm_se']:.2g} "
            f"| {paper_cell} | {speedup} |")


HEADER = ("| sampler | chains | samples | accept | divergent | max R-hat "
          "| total ESS (min, med, max) "
          "| time (s) ± se | s/minESS ± se | paper s/minESS | speedup |\n"
          "|---|---|---|---|---|---|---|---|---|---|---|")


def repeated(run_one, seeds: int):
    """run_one(seed) -> (samples_groups: dict, accept, div, t); returns
    {group: agg} computed per group over seeds."""
    per_group: dict[str, list] = {}
    for s in range(seeds):
        groups, accept, div, t = run_one(s)
        for g in list(groups):
            # pop so no reference (dict or loop variable) keeps this
            # seed's multi-GB kept-sample parts alive while the NEXT
            # seed's sampling allocates its own -- that overlap is what
            # OOM'd 64-chain StochVol rows at seeds >= 1.
            samp = groups.pop(g)
            per_group.setdefault(g, []).append(
                (ess_stats(samp), rhat_max(samp), accept, t, div))
            del samp
    return {g: aggregate_rows(v) for g, v in per_group.items()}


# ---------------------------------------------------------------- StochVol

def _collect_pos_x(st):
    """Module-level so the jitted scan's static collect_fn hashes equal
    across segments and seeds (an inline lambda forces a re-compile)."""
    return (st.position, st.x)


def run_stochvol(seeds: int) -> str:
    """Two tables: hyperparameters (Table 8) and latent volatilities (Table 9).

    Reference protocol: the authors' StochVolData1.mat
    (``StochVol_RMHMC.m:16``), 20000 kept samples per chain
    (``StochVol_RMHMC.m:63-64``).  Chain counts sized for HBM: the kept
    latent tensor is C x 20000 x 2000 f32.
    """
    y, _ = stochvol.load_data()
    model = stochvol.StochVolModel(jnp.asarray(y, jnp.float32))
    data_src = ("authors' StochVolData1.mat" if stochvol.REFERENCE_MAT.exists()
                else "synthetic (mat absent)")

    kept = 20000
    # (label, config, chains, burn, seg, paper_hyper, paper_latent)
    # The kept latent trajectory (C x 20000 x 2000 f32) stays on device
    # as per-segment PARTS (timed_halves(parts=True)); ESS runs chunk-wise
    # over coordinates (ess_geyer_device_parts), so the concat copy that
    # OOM'd the round-3 reruns never exists and C=64 (10.2 GB of parts)
    # fits the 16 GB chip.  ESS adds over chains, so this quadruples the
    # round-3 totals at the same protocol.
    rows = [
        ("mala", sv_kernel.StochVolConfig(
            method="mala", latent_step_size=0.05 / 2000 ** 0.5,
            hyper_step_size=0.01 / 2000 ** 0.5), 64, 2000, 2500, 3.89, 4.5),
        ("hmc", sv_kernel.StochVolConfig(
            method="hmc", latent_num_leapfrog=100, latent_step_size=0.03,
            hyper_num_leapfrog=100, hyper_step_size=0.015), 64, 1000, 2500,
         5.19, 1.04),
        ("mmala", sv_kernel.StochVolConfig(
            method="mmala", latent_step_size=0.07, hyper_step_size=1.0),
         64, 1000, 2500, 142.8, 34.2),
        ("rmhmc", sv_kernel.StochVolConfig(), 64, 1000, 2500, 2.37, 0.34),
    ]

    for name, cfg, chains, burn, seg, paper_h, paper_l in rows:
        if skip_row(name):
            continue
        print(f"--- stochvol/{name} ({chains} chains x {kept}, {seeds} seeds)",
              flush=True)
        kernel = sv_kernel.build(model, cfg)

        def run_one(seed, kernel=kernel, chains=chains, burn=burn, seg=seg):
            init = jnp.tile(jnp.asarray([0.5, 0.5, 0.5], jnp.float32), (chains, 1))
            sparts, accept, div, t = timed_halves(
                kernel, init, burn_in=burn, num_samples=kept, seed=seed,
                collect_fn=_collect_pos_x, seg=seg,
                parts=True)
            return {"hyper": [p[0] for p in sparts],
                    "latent": [p[1] for p in sparts]}, accept, div, t

        try:
            agg = repeated(run_one, seeds)
        except Exception as e:
            global FAILURES
            FAILURES += 1
            print(f"    FAILED: {e}", flush=True)
            continue
        record_row("stochvol", "hyper", name, row(name, chains, kept, agg["hyper"], paper_h))
        record_row("stochvol", "latent", name, row(name, chains, kept, agg["latent"], paper_l))
        print("   ", recorded_rows("stochvol", "hyper").get(name, ""), flush=True)
        print("   ", recorded_rows("stochvol", "latent").get(name, ""), flush=True)

    got_h = recorded_rows("stochvol", "hyper")
    got_l = recorded_rows("stochvol", "latent")
    order = [r[0] for r in rows]
    hyper_rows = [got_h[n] for n in order if n in got_h]
    latent_rows = [got_l[n] for n in order if n in got_l]

    return (len(hyper_rows) + len(latent_rows), 2 * len(order)), (
        "## Stochastic volatility -- T=2000 "
        f"({data_src}; beta=0.65, sigma=0.15, phi=0.98), single TPU v5e chip\n\n"
        "Two-block Gibbs samplers at reference hyperparameters "
        "(Stoch_Vol/*/StochVol_*.m)\nand the reference's 20000 kept samples "
        f"per chain (StochVol_RMHMC.m:63-64); mean ± stderr\nover {seeds} "
        "independent seeds (CalculateStatistics.m:24-31).  ESS on the "
        "constrained\n(beta, sigma, phi) and on all 2000 latent "
        "volatilities.  Paper columns: Tables 8/9.\n\n"
        "### Hyperparameters (paper Table 8)\n\n" + HEADER + "\n"
        + "\n".join(hyper_rows) + "\n\n"
        "### Latent volatilities (paper Table 9)\n\n" + HEADER + "\n"
        + "\n".join(latent_rows)
    )


# ---------------------------------------------------------------- LGC

def run_lgc(seeds: int) -> str:
    """Latent-field sampling on the full 64x64 grid (paper Table 10).

    Reference protocol: the authors' TestData64.mat (``LGC_RMHMC_LV.m:12``),
    5000 kept samples per chain (6000 iters / 1000 burn-in, ``:30-31``).
    """
    y, _ = lgc.load_data(n=64)
    model = lgc.LGCModel(jnp.asarray(y, jnp.float32), n=64)
    data_src = ("authors' TestData64.mat" if lgc.REFERENCE_MAT.exists()
                else "synthetic (mat absent)")
    prior = model.prior_mean()
    kept = 5000
    rows = []

    def measure(label, make_kernel, chains, burn, paper, *, init=None,
                lift=None, warm_state_fn=None, extra="", seg=None,
                parts=False):
        name = label + extra  # single key for skip/record/order (ADVICE low #2)
        rows.append(name)  # keeps the section's row order
        if skip_row(name):
            return
        print(f"--- lgc/{name} ({chains} chains x {kept}, {seeds} seeds)",
              flush=True)

        def run_one(seed):
            kernel = make_kernel(seed)
            if warm_state_fn is not None:
                st = warm_state_fn(kernel, seed)
                s, accept, div, t = timed_halves(kernel, None, burn_in=0,
                                                 num_samples=kept, seed=seed,
                                                 init_state=st, seg=seg,
                                                 parts=parts)
            else:
                pos = init if init is not None else jnp.tile(prior, (chains, 1))
                s, accept, div, t = timed_halves(kernel, pos, burn_in=burn,
                                                 num_samples=kept, seed=seed,
                                                 seg=seg, parts=parts)
            if lift is not None:
                x = [lift(p) for p in s] if parts else lift(s)
            else:
                x = s
            return {"latent": x}, accept, div, t

        try:
            agg = repeated(run_one, seeds)
        except Exception as e:
            global FAILURES
            FAILURES += 1
            print(f"    FAILED: {e}", flush=True)
            return
        record_row("lgc", "latent", name,
                   row(name, chains, kept, agg["latent"], paper))
        print("   ", recorded_rows("lgc", "latent")[name], flush=True)

    # Whitened MALA (LGC_MALA_Transient.m:32-33 / LGC_MALA_Stationary.m:32-33),
    # ONE measured row against BOTH paper baselines.  The paper's two rows
    # differ only in the hand-tuned step-size schedule (transient
    # (N^2)^(1/2) vs stationary (N^2)^(1/3) scaling); we dual-average the
    # base eps to the 0.574 Langevin optimum during warmup (frozen before
    # timing), which absorbs the scaling-law constant into the adapted
    # step -- round-4 measured both schedules at identical accept 0.574
    # and ESS within noise, so two rows would report one measurement twice
    # (VERDICT round-4 item 5 / ADVICE).  The paper's eps constants
    # themselves do not transfer: they are tuned to the authors'
    # position-dependent whitening, re-Choleskyed EVERY step (O(D^3),
    # LGC_MALA_Transient.m:106-107 -- why their MALA costs 31577 s), and
    # under our fixed prior whitening they accept nothing on the authors'
    # data.
    import dataclasses as _dc

    from riemannhamiltonianmontecarlo_tpu.parallel import (
        AdaptationConfig, adaptive, frozen_step_size,
    )

    wh = model.whitened()
    lift = jax.jit(jax.vmap(wh.to_x))
    eps_holder = {}

    def make_mala(seed):
        cfg0 = mala.MALAConfig(step_size=0.5, transient=False)
        warm_kernel = adaptive(mala.build, wh, cfg0,
                               AdaptationConfig(target_accept=0.574))
        warm = parallel.run(warm_kernel, jax.random.key(100 + seed),
                            jnp.zeros((16, model.dim)), num_samples=1000,
                            collect=False)
        eps = frozen_step_size(warm.final_state)
        eps_holder[seed] = (eps, warm.final_state.inner)
        return mala.build(wh, _dc.replace(cfg0, step_size=eps))

    measure("mala (whitened, adapted eps)", make_mala, 16, 0,
            (("transient", 10605), ("stationary", 7836)),
            lift=lift, warm_state_fn=lambda k, seed: eps_holder[seed][1])

    # mMALA with the CONSTANT metric, the reference's actual algorithm:
    # LGC_mMALA_LV.m:85-92 freezes G = Sigma^-1 + diag(m e^{mu+diagSigma})
    # before the loop (CholG/InvG/CholInvG precomputed) and proposes with
    # mean x + (eps/2) G^-1 grad, cov eps G^-1 (eps=0.07, :34,115-121).
    # Rounds 2-4 ran the position-dependent samplers/mmala.py here -- a
    # per-step batched D=4096 Cholesky the reference never performs on
    # this workload, and the table's only sub-100x row (23x, VERDICT
    # round-4 items 1-2).  64 chains like the rmhmc row: the per-step
    # work is pure (C, D) x (D, D) MXU matvecs.
    # quad_fn/factor_only: keep the jitted program at TWO dense (D, D)
    # constants (Sigma^{-1} + the triangular inverse) -- the tunneled
    # backend's compile-request limit rejects three+ embedded 67 MB
    # literals (HTTP 413).
    measure("mmala (constant metric)",
            lambda _s: pmala.build(model, model.metric_chol, model.metric_inv,
                                   pmala.PMALAConfig(step_size=0.07),
                                   quad_fn=model.metric_quad,
                                   factor_only=True),
            64, 1000, 24.1, seg=1250, parts=True)

    # Constant-metric RMHMC == preconditioned HMC (LGC_RMHMC_LV.m:95-101).
    # 64 chains (VERDICT round-3 item 7): the (C, D) x (D, D) matvecs in
    # the leapfrog are MXU work whose utilization grows with C; kept
    # samples (C x 5000 x 4096, 5.2 GB) stay on device as segment parts.
    measure("rmhmc (constant metric)",
            lambda _s: phmc.build(model, model.metric_chol, model.metric_inv,
                                  phmc.PHMCConfig(step_size=0.1, num_leapfrog=30)),
            64, 1000, 1.5, seg=1250, parts=True)

    got = recorded_rows("lgc", "latent")
    expected = len(rows)
    rows = [got[n] for n in rows if n in got]
    return (len(rows), expected), (
        "## Log-Gaussian Cox process -- 64x64 grid (D=4096 latents, "
        f"{data_src}), single TPU v5e chip\n\n"
        "Latent-field sampling at reference hyperparameters "
        "(Log_Gaussian_Cox/*/LGC_*.m)\nwith the reference's 5000 kept "
        f"samples per chain (LGC_RMHMC_LV.m:30-31); mean ±\nstderr over "
        f"{seeds} seeds.  ESS over all 4096 field coordinates (whitened-MALA "
        "ESS\nmeasured on the field x = mu + L gamma).  The whitened-MALA "
        "row is ONE\nmeasurement compared against BOTH paper MALA rows: "
        "the paper's transient vs\nstationary rows differ only in the "
        "hand-tuned step-size schedule, and after\ndual-averaging the base "
        "eps to the 0.574 Langevin optimum during warmup\n(frozen before "
        "timing) the two schedules measure identically (round 4: "
        "accept\n0.574 both, ESS within noise).  The paper's eps constants "
        "themselves do not\ntransfer: they are tuned to its "
        "position-dependent whitening, re-Choleskyed\nevery step (O(D^3), "
        "LGC_MALA_Transient.m:106-107), and under our fixed prior\n"
        "whitening they accept nothing on the authors' data.  Paper "
        "column: Table 10.\n\n" + HEADER + "\n" + "\n".join(rows)
    )


# ---------------------------------------------------------------- FHN

def run_fhn(seeds: int) -> str:
    """FitzHugh-Nagumo parameter inference (paper Table 11).

    Data generated at (a, b, c) = (0.2, 0.2, 3), noise sd 0.5, exactly as
    the reference's RunFHN_RMHMC.m:35-52 (no shipped dataset); 5000 kept
    samples per chain as the paper, except HMC -- see the note below.
    """
    data, _ = fhn.generate_data(seed=1, num_obs=200)
    model = fhn.FHNModel(jnp.asarray(data, jnp.float32), substeps=5)
    theta0 = jnp.asarray([0.2, 0.2, 3.0], jnp.float32)
    kept = 5000

    rows_cfg = [
        ("metropolis", lambda: metropolis.build(
            model, metropolis.AMHConfig(init_proposal_sd=0.05)),
         512, kept, 1000, None, 0.17),
        ("mala", lambda: mala.build(model, mala.MALAConfig(step_size=2e-4)),
         512, kept, 1000, None, 0.67),
        # HMC: L=150 leapfrogs x 1000-step RK4 sensitivity solves per
        # sample is a ~1.3 s/sample SEQUENTIAL chain regardless of batch
        # (latency-bound: tools/probe_scaling.py shows near-flat time from
        # 64 to 1024 chains), so throughput comes from the chain axis.
        # 1024 chains x 400 samples; the paper's 5000 would cost ~1.8 h
        # per seed for no rate information (ESS/s is sample-count-free).
        ("hmc", lambda: hmc.build(model, hmc.HMCConfig(step_size=1 / 150,
                                                       num_leapfrog=150)),
         1024, 400, 200, 20, 0.23),
        ("mmala", lambda: mmala.build(model, mmala.MMALAConfig(step_size=1.0,
                                                               jitter=1e-6)),
         512, kept, 500, None, 0.037),
        ("mmala_simplified", lambda: mmala.build(
            model, mmala.MMALAConfig(step_size=1.0, simplified=True, jitter=1e-6)),
         512, kept, 500, None, 0.031),
        ("rmhmc", lambda: rmhmc.build(model, rmhmc.RMHMCConfig(
            step_size=0.5, num_leapfrog=6, num_fixed_point=5, jitter=1e-6)),
         256, kept, 300, 500, 0.08),
    ]

    for name, build, chains, samples, burn, seg, paper in rows_cfg:
        if skip_row(name):
            continue
        print(f"--- fhn/{name} ({chains} chains x {samples}, {seeds} seeds)",
              flush=True)
        kernel = build()  # hoisted: per-seed rebuild re-traces the ODE
        # jacfwd graph (minutes of XLA compile each) for zero benefit.

        def run_one(seed, kernel=kernel, chains=chains, samples=samples,
                    burn=burn, seg=seg):
            init = jnp.tile(theta0, (chains, 1)) * (
                1.0 + 0.05 * jax.random.normal(jax.random.key(11 + seed),
                                               (chains, 3)))
            s, accept, div, t = timed_halves(kernel, init, burn_in=burn,
                                             num_samples=samples, seed=seed,
                                             seg=seg)
            return {"params": s}, accept, div, t

        n_seeds = seeds if name != "hmc" else max(seeds, 1)
        try:
            agg = repeated(run_one, n_seeds)
        except Exception as e:
            global FAILURES
            FAILURES += 1
            print(f"    FAILED: {e}", flush=True)
            continue
        record_row("fhn", "params", name, row(name, chains, samples, agg["params"], paper))
        print("   ", recorded_rows("fhn", "params")[name], flush=True)

    got = recorded_rows("fhn", "params")
    rows = [got[n] for n, *_ in rows_cfg if n in got]

    return (len(rows), len(rows_cfg)), (
        "## FitzHugh-Nagumo ODE -- 3 parameters, 200 time points, "
        "noise sd 0.5, single TPU v5e chip\n\n"
        "Parameter inference at reference hyperparameters "
        "(Matlab_ODEs/MCMC/ODE_*.m),\nsensitivities via jacfwd through the "
        "RK4 integrator; data generated at\n(a, b, c) = (0.2, 0.2, 3) per "
        f"RunFHN_RMHMC.m:35-52; 5000 kept samples, mean ±\nstderr over "
        f"{seeds} seeds.  HMC runs 400 kept samples: its 150x1000-step "
        "RK4\nchain is latency-bound (~1.3 s/sample at ANY chain count "
        "64-1024,\ntools/probe_scaling.py), so the s/minESS rate is "
        "sample-count-free and the\npaper's 5000 would add ~1.8 h/seed of "
        "identical-rate sampling.  Paper column:\nTable 11 (total time / "
        "minESS).\n\n" + HEADER + "\n" + "\n".join(rows)
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
    global ONLY, ROWS_FILE, N_SEEDS_ACTIVE
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="all", choices=[*WORKLOADS, "all"])
    ap.add_argument("--seeds", type=int, default=N_SEEDS)
    ap.add_argument("--only", default=None,
                    help="run a single sampler row (exact name); the section "
                         "is still assembled from every row recorded so far")
    ap.add_argument("--rows-file", default="/tmp/mr_rows.jsonl",
                    help="sidecar accumulating measured rows across processes")
    ap.add_argument("--emit-only", action="store_true",
                    help="skip all measurement; assemble sections from the "
                         "rows file alone")
    ap.add_argument("--allow-partial", action="store_true",
                    help="splice a section even when some configured rows "
                         "have no recorded measurement")
    args = ap.parse_args()
    if args.only is not None and args.workload == "all":
        # ADVICE round-3 medium #1: same-named rows (mala/mmala/rmhmc)
        # exist in every workload; --only without an explicit workload
        # would run unintended heavy rows.
        ap.error("--only requires an explicit --workload")
    ONLY = "\x00never" if args.emit_only else args.only
    ROWS_FILE = Path(args.rows_file)
    N_SEEDS_ACTIVE = args.seeds
    names = list(WORKLOADS) if args.workload == "all" else [args.workload]
    for name in names:
        (got, expected), section = WORKLOADS[name](args.seeds)
        if got < expected and not args.allow_partial:
            # Never splice a partial table over existing RESULTS.md data
            # (ADVICE round-3 medium #1): a full section only assembles
            # once every configured row has a recorded measurement.
            print(f"=== section {name}: {got}/{expected} rows recorded; "
                  "NOT splicing (pass --allow-partial to override)",
                  flush=True)
            continue
        text = RESULTS.read_text() if RESULTS.exists() else "# RESULTS\n"
        RESULTS.write_text(splice(text, name, section))
        print(f"=== wrote section {name} ({got}/{expected} rows) to {RESULTS}",
              flush=True)
    if FAILURES:
        # A failed row must fail the process: the campaign driver marks a
        # stage done on exit 0, and a swallowed OOM would silently skip
        # the row for the rest of the round.
        sys.exit(f"{FAILURES} row(s) FAILED")


if __name__ == "__main__":
    main()
