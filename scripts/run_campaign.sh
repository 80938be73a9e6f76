#!/bin/bash
# Round-4 TPU measurement campaign v3: waits for the axon tunnel, then runs
# bench.py, bench_train steady+early, a full-train-step trace itemization,
# the glossy material gate (10k iters, auto-resumes), and the 30k production
# quality gate (auto-resumes). Logs under /tmp/campaign/.
#
# Global deadline: all work stops by DEADLINE_EPOCH so no child is still
# holding the chip when the round driver runs bench.py at round end.
# Override with CAMPAIGN_DEADLINE="YYYY-MM-DD HH:MM UTC" (default: +10 hours).
set -u
LOG=/tmp/campaign
mkdir -p $LOG
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

DEADLINE_EPOCH=$(date -d "${CAMPAIGN_DEADLINE:-+10 hours}" +%s)

stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

echo "$(stamp) campaign v3 start, deadline $(date -d @$DEADLINE_EPOCH +%H:%M:%S) ($(remaining)s)" >> $LOG/campaign.log

# 1. Wait for the chip (probe failure == down or claimed by someone else).
while true; do
  if (( $(remaining) < 600 )); then
    echo "$(stamp) deadline reached while waiting — aborting" >> $LOG/campaign.log
    exit 1
  fi
  echo "$(stamp) probing tpu..." >> $LOG/campaign.log
  timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,128)); print('ok', float((x@x.T)[0,0]), flush=True)
" >> $LOG/campaign.log 2>&1 && break
  echo "$(stamp) still down" >> $LOG/campaign.log
  sleep 120
done
echo "$(stamp) TPU UP — starting campaign" >> $LOG/campaign.log
touch $LOG/TPU_UP

run_step() { # name, timeout_s, cmd...
  local name=$1 tmo=$2; shift 2
  local rem=$(remaining)
  if (( rem < 300 )); then
    echo "$(stamp) SKIP $name (deadline: ${rem}s left)" >> $LOG/campaign.log
    return 1
  fi
  if (( tmo > rem )); then tmo=$rem; fi
  echo "$(stamp) START $name (timeout ${tmo}s)" >> $LOG/campaign.log
  timeout --signal=INT --kill-after=60 "$tmo" "$@" > $LOG/$name.log 2>&1
  local rc=$?
  echo "$(stamp) END $name rc=$rc" >> $LOG/campaign.log
  tail -4 $LOG/$name.log | sed 's/^/    /' >> $LOG/campaign.log
  return $rc
}

RETRY=(python -u scripts/tpu_retry.py --)

run_step bench           2400 "${RETRY[@]}" python -u bench.py
run_step bench_steady    2400 "${RETRY[@]}" python -u bench_train.py --preset steady
run_step bench_early     2400 "${RETRY[@]}" python -u bench_train.py --preset early
run_step profile_train   2400 "${RETRY[@]}" python -u scripts/profile_step.py --train --iters 3 --keep /tmp/gs2m_trace_r4
run_step microbench      2400 "${RETRY[@]}" python -u scripts/microbench_stages.py
run_step material_gate  10800 python -u scripts/run_material_gate.py
run_step production_gate $(remaining) python -u scripts/run_quality_gate.py --production
echo "$(stamp) CAMPAIGN DONE" >> $LOG/campaign.log
touch $LOG/CAMPAIGN_DONE
