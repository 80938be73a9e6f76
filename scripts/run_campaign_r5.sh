#!/bin/bash
# Round-5 gate campaign: the two quality gates the r4 verdict flagged as the
# top missing evidence (glossy material gate 10k + production 30k), then the
# final measured rows (bench headline + grad gate, bench_train steady/early)
# at HEAD so harvest_campaign writes artifact-backed BASELINE rows.
# Logs under /tmp/campaign5/. Deadline keeps the chip free for the driver.
set -u
LOG=/tmp/campaign5
mkdir -p $LOG
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

DEADLINE_EPOCH=$(date -d "${CAMPAIGN_DEADLINE:-+8 hours}" +%s)
stamp() { date +%H:%M:%S; }
remaining() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }
echo "$(stamp) campaign r5 start, deadline $(date -d @$DEADLINE_EPOCH +%H:%M:%S) ($(remaining)s)" >> $LOG/campaign.log

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

run_step material_gate   9000 python -u scripts/run_material_gate.py
# Production gate gets the bulk of the budget but must leave ~40 min for
# the final measured rows below (auto-resumes from checkpoints if cut).
PROD_TMO=$(( $(remaining) - 2400 ))
if (( PROD_TMO > 600 )); then
  run_step production_gate $PROD_TMO python -u scripts/run_quality_gate.py --production
fi
run_step bench           2400 python -u scripts/tpu_retry.py -- python -u bench.py
run_step bench_steady    2400 python -u scripts/tpu_retry.py -- python -u bench_train.py --preset steady
run_step bench_early     2400 python -u scripts/tpu_retry.py -- python -u bench_train.py --preset early
echo "$(stamp) CAMPAIGN r5 DONE" >> $LOG/campaign.log
touch $LOG/CAMPAIGN_DONE
