#!/bin/bash
# Round-5 stage E (runs after r5_queue_bd.sh drains the chip):
# E1 — bench measurement ladder: ddpm x3 (headline stability), FLOPS=0
#      (recording-overhead check), DECOMPOSE (root vs greedy split),
#      guide-steps ladder (device-time attribution), ddim fast mode.
# E2 — DDIM quality rows for MODEL_EVAL (flagship env + hardest map).
set -u
cd "$(dirname "$0")/.."
LOG=results_summaries/r5_queue
mkdir -p "$LOG"

echo "=== stage E1: bench ladder ($(date)) ===" | tee "$LOG/bench_ladder.log"
for i in 1 2 3; do
  python bench.py 2>/dev/null | tail -1 | tee -a "$LOG/bench_ladder.log"
done
MMD_BENCH_FLOPS=0 python bench.py 2>/dev/null | tail -1 | tee -a "$LOG/bench_ladder.log"
MMD_BENCH_DECOMPOSE=1 python bench.py 2>/dev/null | tail -1 | tee -a "$LOG/bench_ladder.log"
for g in 10 5 1; do
  MMD_BENCH_GUIDE_STEPS=$g python bench.py 2>/dev/null | tail -1 | tee -a "$LOG/bench_ladder.log"
done
for i in 1 2; do
  MMD_BENCH_SAMPLER=ddim python bench.py 2>/dev/null | tail -1 | tee -a "$LOG/bench_ladder.log"
done

echo "=== stage E2: ddim quality rows ($(date)) ==="
python scripts/eval_model.py --env EnvEmptyNoWait2D --bf16 --sampler ddim \
  --tag bf16+ddim --variant "bfloat16 UNet inference, DDIM fast mode (5+1 substeps)" \
  --out_yaml MODEL_EVAL.yaml > "$LOG/evalE_NoWait_ddim.log" 2>&1
tail -5 "$LOG/evalE_NoWait_ddim.log"
python scripts/eval_model.py --env EnvConveyor2D --bf16 --sampler ddim \
  --tag bf16+ddim --variant "bfloat16 UNet inference, DDIM fast mode (5+1 substeps)" \
  --out_yaml MODEL_EVAL.yaml > "$LOG/evalE_Conveyor_ddim.log" 2>&1
tail -5 "$LOG/evalE_Conveyor_ddim.log"

echo "=== stage E done ($(date)) ==="
