#!/bin/bash
# Round-5 evidence campaign: the artifacts that died in the round-4 queue,
# ordered FIRST this time (VERDICT round-4 item 1).  One stage per fresh
# process, serialized (the tunneled TPU is single-tenant).
# Usage: bash tools/campaign_r5.sh
set -u
cd /root/repo
LOG=/tmp/campaign_r5
mkdir -p $LOG

run() { # run <stage> <timeout_s> <cmd...>
  local stage=$1 tmo=$2; shift 2
  if [ -f "$LOG/$stage.done" ]; then echo "== $stage: already done"; return 0; fi
  echo "== $stage: start $(date +%H:%M:%S)" | tee -a $LOG/driver.log
  timeout "$tmo" "$@" >"$LOG/$stage.log" 2>&1
  local rc=$?
  echo "== $stage: exit $rc $(date +%H:%M:%S)" | tee -a $LOG/driver.log
  [ $rc -eq 0 ] && touch "$LOG/$stage.done"
  return 0  # keep going; missing rows surface at emit time
}

# --- LGC joint (sigma^2, beta, x) at 64x64: 3rd-round #1 gap ----------
# Resumes the round-4 rmhmc run from its disk checkpoints (seg 15/60);
# the collect_fn recompile fix makes the remaining segments ~45 s each.
run lgc_joint_rmhmc_r5 10800 python tools/run_lgc_joint.py --method rmhmc \
    --chains 4 --samples 5000 --burn-in 1000 --seg 100

# mmala joint; re-splices the section with BOTH rows via the sidecar.
run lgc_joint_mmala_r5 10800 python tools/run_lgc_joint.py --method mmala \
    --chains 4 --samples 5000 --burn-in 1000 --seg 100

# --- Adaptive-vs-preset (paper Table 2 claim; 4th-round ask) ----------
run adaptive_german_r5     5400 python tools/make_results_adaptive.py --dataset german
run adaptive_australian_r5 5400 python tools/make_results_adaptive.py --dataset australian

echo "== campaign_r5 complete $(date +%H:%M:%S)" | tee -a $LOG/driver.log
