#!/bin/bash
# Round-5 end window: waits for the gate campaign to finish, then runs the
# remaining chip work in priority order (playbook §7): finish the material
# gate, A/B the termination cut at the converged-opacity operating point,
# isolate the backward kernel's reversed-map cost. Deadline-guarded so the
# chip is free for the round driver's final bench.
set -u
LOG=/tmp/endwindow5
mkdir -p $LOG
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

DEADLINE_EPOCH=$(date -d "${ENDWINDOW_DEADLINE:-14:40}" +%s)
stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

echo "$(stamp) endwindow waiting for campaign" >> $LOG/log
while [ ! -f /tmp/campaign5/CAMPAIGN_DONE ]; do
  if (( $(remaining) < 1800 )); then
    echo "$(stamp) campaign still running at T-30min — proceeding anyway is
unsafe (one TPU owner); giving up" >> $LOG/log
    exit 1
  fi
  sleep 60
done
echo "$(stamp) campaign done — starting end window ($(remaining)s left)" >> $LOG/log

run_step() { # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  local rem=$(remaining)
  if (( rem < 300 )); then
    echo "$(stamp) SKIP $name (deadline)" >> $LOG/log; return 1
  fi
  if (( tmo > rem )); then tmo=$rem; fi
  echo "$(stamp) START $name (timeout ${tmo}s)" >> $LOG/log
  timeout --signal=INT --kill-after=60 "$tmo" "$@" > $LOG/$name.log 2>&1
  echo "$(stamp) END $name rc=$?" >> $LOG/log
  tail -3 $LOG/$name.log | sed 's/^/    /' >> $LOG/log
}

# 0. Production-gate eval: training finished (95.8 min, test PSNR 39.20)
#    but the TSDF fusion crashed on the closure-constant 413 (fixed in
#    mesh/tsdf.py) — redo render+mesh+metrics+chamfer from the snapshot.
run_step production_eval 3600 python -u scripts/run_quality_gate.py --production --skip_train

# 1. Material gate: resumes training from its newest checkpoint, then the
#    decomposition eval (the campaign's attempt was cut by a wedged RPC;
#    the watchdog now guards it).
run_step material_gate 5400 python -u scripts/run_material_gate.py

# 2. Termination-cut A/B at the converged-opacity operating point + the
#    overhead checks on the existing presets.
run_step bt_opaque_base 2400 python -u scripts/tpu_retry.py -- python -u bench_train.py --preset opaque
run_step bt_opaque_cut  2400 python -u scripts/tpu_retry.py -- python -u bench_train.py --preset opaque --term_cut
run_step bt_steady_cut  2400 python -u scripts/tpu_retry.py -- python -u bench_train.py --preset steady --term_cut
run_step bt_early_cut   2400 python -u scripts/tpu_retry.py -- python -u bench_train.py --preset early --term_cut

# 3. Backward-kernel reversed-map isolate.
run_step bwd_kernel 1800 python -u scripts/tpu_retry.py -- python -u scripts/microbench_bwd_kernel.py

echo "$(stamp) ENDWINDOW DONE" >> $LOG/log
touch $LOG/DONE
