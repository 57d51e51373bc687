#!/bin/bash
# Round-5 continuation: replaces campaign_r5b's remaining stages after
# the lgc mmala row failed with the tunnel's compile-size limit (fixed
# in samplers/pmala.py quad_fn/factor_only).  Re-runs that row FIRST so
# the LGC section splices early, then continues the r5b order.  Stages
# share /tmp/campaign_r5 .done markers, so completed work is skipped.
set -u
cd /root/repo
LOG=/tmp/campaign_r5
mkdir -p $LOG
ROWS=/tmp/mr_rows_r5.jsonl
MR="python tools/make_results_all.py --seeds 3 --rows-file $ROWS"

run() { # run <stage> <timeout_s> <cmd...>
  local stage=$1 tmo=$2; shift 2
  if [ -f "$LOG/$stage.done" ]; then echo "== $stage: already done"; return 0; fi
  echo "== $stage: start $(date +%H:%M:%S)" | tee -a $LOG/driver.log
  timeout "$tmo" "$@" >"$LOG/$stage.log" 2>&1
  local rc=$?
  echo "== $stage: exit $rc $(date +%H:%M:%S)" | tee -a $LOG/driver.log
  [ $rc -eq 0 ] && touch "$LOG/$stage.done"
  return 0
}

# --- LGC: the fixed constant-metric mmala row, then emit -------------
run lgc_mmala_c 3600 $MR --workload lgc --only "mmala (constant metric)"
run lgc_emit_c   900 $MR --workload lgc --emit-only

# --- StochVol (Tables 8/9): 4 rows -----------------------------------
run sv_mala_b  4500 $MR --workload stochvol --only mala
run sv_hmc_b   7200 $MR --workload stochvol --only hmc
run sv_mmala_b 7200 $MR --workload stochvol --only mmala
run sv_rmhmc_b 9000 $MR --workload stochvol --only rmhmc
run sv_emit_b   600 $MR --workload stochvol --emit-only

# --- BLR flagship datasets -------------------------------------------
run blr_australian_b 2700 python tools/make_results.py --dataset australian
run blr_german_b     2700 python tools/make_results.py --dataset german

# --- FHN (Table 11): 6 rows ------------------------------------------
run fhn_metropolis_b 2400 $MR --workload fhn --only metropolis
run fhn_mala_b       2400 $MR --workload fhn --only mala
run fhn_hmc_b        5400 $MR --workload fhn --only hmc
run fhn_mmala_b      3600 $MR --workload fhn --only mmala
run fhn_mmala_s_b    3600 $MR --workload fhn --only mmala_simplified
run fhn_rmhmc_b      5400 $MR --workload fhn --only rmhmc
run fhn_emit_b        600 $MR --workload fhn --emit-only

# --- Remaining BLR datasets ------------------------------------------
run blr_pima_b   2700 python tools/make_results.py --dataset pima
run blr_heart_b  2700 python tools/make_results.py --dataset heart
run blr_ripley_b 2700 python tools/make_results.py --dataset ripley

echo "== campaign_r5c complete $(date +%H:%M:%S)" | tee -a $LOG/driver.log
