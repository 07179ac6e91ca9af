#!/bin/bash
# Round-5 stages C+D only (stage B's lowdens-r5 sweep already ran and its
# summaries are committed in PARITY.md; the raw pkls were lost to a VM
# reset and must NOT be re-run — it would eat hours of chip time).
# Resumable: each experiment skips trials whose results.pkl already exists
# under its time_str.
set -u
cd "$(dirname "$0")/.."
LOG=results_summaries/r5_queue
mkdir -p "$LOG"

echo "=== stage C: bf16 dense grid (conveyor vd 60s fg2 protocol) ($(date)) ==="
python -u scripts/launch_multi_agent_experiment.py \
  --instance EnvConveyor2DRobotPlanarDiskRandom \
  --num_agents 12 15 20 --planners XECBS --trials 10 \
  --runtime_limit 60 --frontier_width 2 --bf16 \
  --models_dir data_trained_models_vd --data_dir data_trajectories_vd \
  --time_str conveyor-vd-60s-fg2-bf16 \
  >> "$LOG/dense_bf16.log" 2>&1
tail -8 "$LOG/dense_bf16.log"

echo "=== stage D: multi-tile refresh, 2x2 first ($(date)) ==="
python -u scripts/launch_multi_tile_experiment.py \
  --instances EnvTestTwoByTwoRobotPlanarDiskRandom \
  --num_agents 2 4 6 --planners XECBS PP --trials 10 \
  --runtime_limit 240 --stagger_dt 10 --frontier_width 2 \
  --time_str multitile-r5 >> "$LOG/multitile.log" 2>&1
tail -10 "$LOG/multitile.log"

echo "=== stage D: 3x3 ($(date)) ==="
python -u scripts/launch_multi_tile_experiment.py \
  --instances EnvTestThreeByThreeRobotPlanarDiskRandom \
  --num_agents 2 4 6 --planners XECBS PP --trials 10 \
  --runtime_limit 240 --stagger_dt 10 --frontier_width 2 \
  --time_str multitile-r5 >> "$LOG/multitile.log" 2>&1
tail -10 "$LOG/multitile.log"

echo "=== stages C+D done ($(date)) ==="
