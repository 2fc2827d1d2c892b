#!/bin/bash
# Full epilogue-study matrix at contract scale (1M x 16384).
# One variant per process (axon relay rule); results append to
# results/epilogue_study_1m.jsonl. ~3-6 min per variant (relay warmup).
set -u
cd "$(dirname "$0")/.."
OUT=results/epilogue_study_1m.jsonl
: > "$OUT"
run() { echo "== $* =="; timeout 900 python scripts/epilogue_study.py "$@" --out "$OUT" 2>/dev/null | tail -1; }

# formulation matrix at the shipping geometry
run packed
run matmul_only
run min_only
run argmin
run bf16_min
run bf16_key
# geometry sweeps of the shipping formulation
run packed --bin 512
run packed --bin 2048
run packed --bin 4096
run packed --tq 512
run packed --tq 2048
run packed --chunk 32768
# geometry of the bf16 contender
run bf16_min --bin 2048
run bf16_min --tq 2048
echo "done"
