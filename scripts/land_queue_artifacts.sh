#!/bin/bash
# Land the round-4 TPU recovery-queue artifacts into results/ and commit.
#
# The outage queue (/tmp/tpu_queue4.sh, see BASELINE.md round-3 postscript)
# drains measurement jobs when the axon relay recovers. Most jobs write
# results/*.json themselves; bench.py and tpu_selfcheck.py print a single
# JSON line to stdout which the queue captures under /tmp. This script —
# appended as the queue's FINAL job — copies those into results/, strict-
# validates every landed JSON, and commits, so the measurements survive
# round end even if no interactive session is alive at recovery time.
set -u
cd /root/repo

land() {  # land <src> <dst>: copy iff src is non-empty valid strict JSON
  local src=$1 dst=$2
  [ -s "$src" ] || { echo "skip $src (missing/empty)"; return 1; }
  python - "$src" "$dst" <<'EOF'
import json, pathlib, sys
src, dst = sys.argv[1], sys.argv[2]
txt = pathlib.Path(src).read_text()
try:
    obj = json.loads(txt, parse_constant=lambda c: (_ for _ in ()).throw(
        ValueError(f"non-strict token {c}")))
except ValueError as e:
    sys.exit(f"skip {src}: invalid strict JSON ({e})")
pathlib.Path(dst).write_text(json.dumps(obj, indent=2, allow_nan=False) + "\n")
print(f"landed {src} -> {dst}")
EOF
}

land /tmp/q_bench.json results/bench_1m_learned_r4.json
land /tmp/q_selfcheck.json results/tpu_selfcheck_r4.json

# everything else already wrote into results/ — stage whatever changed
git add -A results/ 2>/dev/null
if ! git diff --cached --quiet; then
  cp /tmp/tpu_jobs.done results/queue4_ledger.txt 2>/dev/null && \
    git add results/queue4_ledger.txt
  git commit -m "Land round-4 TPU measurement artifacts from recovery queue" \
    && echo "committed"
else
  echo "nothing to commit"
fi
