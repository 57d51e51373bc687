#!/bin/bash
# Round-4 measurement campaign: every row of paper Tables 8-11 at the
# reference protocol, one row per fresh process (TPU arena fragmentation,
# commit 6d43ab3), serialized (the tunneled TPU is single-tenant).
# Usage: bash tools/campaign_r4.sh [start_stage]
set -u
cd /root/repo
LOG=/tmp/campaign
mkdir -p $LOG
ROWS=/tmp/mr_rows_r4.jsonl
MR="python tools/make_results_all.py --seeds 3 --rows-file $ROWS"

run() { # run <stage> <timeout_s> <cmd...>
  local stage=$1 tmo=$2; shift 2
  if [ -f "$LOG/$stage.done" ]; then echo "== $stage: already done"; return 0; fi
  echo "== $stage: start $(date +%H:%M:%S)" | tee -a $LOG/driver.log
  timeout "$tmo" "$@" >"$LOG/$stage.log" 2>&1
  local rc=$?
  echo "== $stage: exit $rc $(date +%H:%M:%S)" | tee -a $LOG/driver.log
  [ $rc -eq 0 ] && touch "$LOG/$stage.done"
  return 0  # keep going; missing rows surface in the emit step
}

# --- StochVol (Tables 8/9): 4 rows, fresh process each ---------------
run sv_mala  4500 $MR --workload stochvol --only mala
run sv_hmc   7200 $MR --workload stochvol --only hmc
run sv_mmala 7200 $MR --workload stochvol --only mmala
run sv_rmhmc 9000 $MR --workload stochvol --only rmhmc

# --- LGC (Table 10): 4 rows ------------------------------------------
run lgc_mala_t 3600 $MR --workload lgc --only "mala (transient, adapted eps)"
run lgc_mala_s 3600 $MR --workload lgc --only "mala (stationary, adapted eps)"
run lgc_mmala  5400 $MR --workload lgc --only mmala
run lgc_rmhmc  5400 $MR --workload lgc --only "rmhmc (constant metric)"

# --- FHN (Table 11): 6 rows ------------------------------------------
run fhn_metropolis 2400 $MR --workload fhn --only metropolis
run fhn_mala       2400 $MR --workload fhn --only mala
run fhn_hmc        5400 $MR --workload fhn --only hmc
run fhn_mmala      3600 $MR --workload fhn --only mmala
run fhn_mmala_s    3600 $MR --workload fhn --only mmala_simplified
run fhn_rmhmc      5400 $MR --workload fhn --only rmhmc

# --- Assemble the three sections (refuses partial tables) ------------
run emit_all 600 $MR --emit-only

# --- Native ESS engine evidence (short; banked before the long joint) -
run ess_engine 3600 python tools/ess_engine_bench.py --dataset german

# --- LGC joint (sigma^2, beta, x) at 64x64: the ~90-CPU-hour config ---
# Stage 1 runs rmhmc and splices an rmhmc-only section (so a measured
# lgc-joint section exists even if the round ends here); stage 2 resumes
# rmhmc instantly from the disk checkpoints, runs mmala, and re-splices
# the section with BOTH rows.
run lgc_joint_rmhmc 7200 python tools/run_lgc_joint.py --method rmhmc \
    --chains 4 --samples 5000 --burn-in 1000 --seg 100

# --- Adaptive-vs-preset (paper Table 2 claim; 3rd-round ask) ----------
run adaptive_german     5400 python tools/make_results_adaptive.py --dataset german

# Resumes rmhmc instantly from its checkpoints, runs mmala, re-splices.
run lgc_joint_both 10800 python tools/run_lgc_joint.py --method both \
    --chains 4 --samples 5000 --burn-in 1000 --seg 100

run adaptive_australian 5400 python tools/make_results_adaptive.py --dataset australian

echo "== campaign complete $(date +%H:%M:%S)" | tee -a $LOG/driver.log
