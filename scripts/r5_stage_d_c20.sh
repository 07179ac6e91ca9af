#!/bin/bash
# Round-5 remaining chip-time queue, highest judge priority first:
#   D:  multi-tile 2x2 + 3x3 refresh on the round-4/5 fused programs
#       (VERDICT item 3 — retire the stale multitile-r2 tables)
#   C20: the one bf16 dense cell the VM reset ate (n=12/15 survive in
#        results_summaries/r5_queue/dense_bf16.log; only n=20 is missing)
# Resumable via --time_str: done trials skip.
set -u
cd "$(dirname "$0")/.."
LOG=results_summaries/r5_queue
mkdir -p "$LOG"

echo "=== stage D: multi-tile refresh, 2x2 ($(date)) ===" >> "$LOG/multitile.log"
python -u scripts/launch_multi_tile_experiment.py \
  --instances EnvTestTwoByTwoRobotPlanarDiskRandom \
  --num_agents 2 4 6 --planners XECBS PP --trials 10 \
  --runtime_limit 240 --stagger_dt 10 --frontier_width 2 \
  --time_str multitile-r5 >> "$LOG/multitile.log" 2>&1

echo "=== stage D: 3x3 ($(date)) ===" >> "$LOG/multitile.log"
python -u scripts/launch_multi_tile_experiment.py \
  --instances EnvTestThreeByThreeRobotPlanarDiskRandom \
  --num_agents 2 4 6 --planners XECBS PP --trials 10 \
  --runtime_limit 240 --stagger_dt 10 --frontier_width 2 \
  --time_str multitile-r5 >> "$LOG/multitile.log" 2>&1

echo "=== stage C20: bf16 dense n=20 ($(date)) ===" >> "$LOG/dense_bf16.log"
python -u scripts/launch_multi_agent_experiment.py \
  --instance EnvConveyor2DRobotPlanarDiskRandom \
  --num_agents 20 --planners XECBS --trials 10 \
  --runtime_limit 60 --frontier_width 2 --bf16 \
  --models_dir data_trained_models_vd --data_dir data_trajectories_vd \
  --time_str conveyor-vd-60s-fg2-bf16 \
  >> "$LOG/dense_bf16.log" 2>&1

echo "=== queue done ($(date)) ===" >> "$LOG/multitile.log"
