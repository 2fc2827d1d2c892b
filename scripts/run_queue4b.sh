#!/bin/bash
# Second-stage queue: waits for run_queue4.sh to finish, then re-runs the
# two contract-scale jobs that crashed mid-queue (gist1m: graph-stage OOM;
# glove: prefix-batch GT mismatch) with the patched checkpointing script,
# lands artifacts, commits.
set -u
cd /root/repo
while ! grep -q "QUEUE4 DONE" /tmp/queue4.log 2>/dev/null; do sleep 60; done
sleep 5
job() { local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> /tmp/queue4.log
  local t0=$SECONDS; timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  echo "$name rc=$? $((SECONDS - t0))s" >> /tmp/tpu_jobs.done
  echo "$name rc=$? done" >> /tmp/queue4.log; }
job gist1m_b 5400 python scripts/contract_scale.py --dataset gist1m
job glove_b 5400 python scripts/contract_scale.py --dataset glove
git add -A results/ && git diff --cached --quiet || \
  git commit -m "Land contract-scale GIST1M/GloVe artifacts (re-run after mid-queue crashes)"
echo "QUEUE4B DONE" >> /tmp/queue4.log
