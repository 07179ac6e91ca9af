#!/bin/bash
# Round-5 measurement queue, stages B-D (stage A — bf16 MODEL_EVAL rows —
# completed earlier; see r5_measure_queue.sh). Resumable: each experiment
# skips trials whose results.pkl already exists under its time_str.
set -u
cd "$(dirname "$0")/.."
LOG=results_summaries/r5_queue
mkdir -p "$LOG"

echo "=== stage B: lowdens-r5 sweeps ($(date)) ==="
for env in EnvHighways2D EnvDropRegion2D EnvConveyor2D; do
  python -u scripts/launch_multi_agent_experiment.py \
    --instance ${env}RobotPlanarDiskRandom \
    --num_agents 3 6 9 --planners XECBS ECBS --trials 10 \
    --runtime_limit 180 --time_str lowdens-r5-${env} \
    >> "$LOG/lowdens_${env}.log" 2>&1
  tail -8 "$LOG/lowdens_${env}.log"
done

echo "=== stage C: bf16 dense grid (conveyor vd 60s fg2 protocol) ($(date)) ==="
python -u scripts/launch_multi_agent_experiment.py \
  --instance EnvConveyor2DRobotPlanarDiskRandom \
  --num_agents 12 15 20 --planners XECBS --trials 10 \
  --runtime_limit 60 --frontier_width 2 --bf16 \
  --models_dir data_trained_models_vd --data_dir data_trajectories_vd \
  --time_str conveyor-vd-60s-fg2-bf16 \
  > "$LOG/dense_bf16.log" 2>&1
tail -8 "$LOG/dense_bf16.log"

echo "=== stage D: multi-tile refresh ($(date)) ==="
python -u scripts/launch_multi_tile_experiment.py \
  --num_agents 2 4 6 --planners XECBS PP --trials 10 \
  --runtime_limit 240 --stagger_dt 10 --frontier_width 2 \
  --time_str multitile-r5 > "$LOG/multitile.log" 2>&1
tail -10 "$LOG/multitile.log"

echo "=== queue done ($(date)) ==="
