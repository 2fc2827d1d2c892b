#!/bin/bash
# Round-4 TPU measurement queue — drains the round-3/4 backlog serially on
# the one chip, survives the interactive session dying (run under tmux),
# and lands+commits everything at the end via land_queue_artifacts.sh.
#
# Each job appends "<name> rc=<rc> <secs>s" to /tmp/tpu_jobs.done; logs go
# to /tmp/q_<name>.log. Jobs are independent: a failure skips to the next.
set -u
cd /root/repo
LEDGER=/tmp/tpu_jobs.done
: > "$LEDGER"

job() {  # job <name> <timeout-secs> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/queue4.log
  local t0=$SECONDS
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  local rc=$?
  echo "$name rc=$rc $((SECONDS - t0))s" | tee -a "$LEDGER" /tmp/queue4.log
}

# 1. headline bench (stdout IS the JSON line -> capture separately)
job bench 3600 bash -c 'python bench.py | tee /tmp/q_bench.json'
# 2. the int8 lever (VERDICT item 2)
job int8_ab 3600 python scripts/int8_ab.py
# 3-4. contract-scale GIST1M / GloVe (VERDICT item 3)
job gist1m 5400 python scripts/contract_scale.py --dataset gist1m
job glove 5400 python scripts/contract_scale.py --dataset glove
# 5. build-backend A/B incl. large-k pallas cells (VERDICT item 8)
job build_ab 3600 python scripts/build_backend_ab.py
# 6. oracle parity at contract scale (VERDICT item 4)
job parity_1m 7200 python scripts/parity_run.py sift --n 1000000 --suffix _1m
# 7. serving refresh on the pallas-merge default (VERDICT item 10)
job serve 1800 python scripts/serve_bench.py
# 8. 5-engine curve refresh (VERDICT item 10)
job curve 3600 python scripts/curve_1m.py
# 9. land everything into results/ and commit
bash scripts/land_queue_artifacts.sh >> /tmp/queue4.log 2>&1
echo "QUEUE4 DONE $(date -u +%H:%M:%S)" | tee -a /tmp/queue4.log
