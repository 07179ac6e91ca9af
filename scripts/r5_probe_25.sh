#!/bin/bash
# Round-5 dense-frontier probe: 25-agent Conveyor vd at the 240 s budget.
# Round-4 baseline: 5/10 f32 width-2 (results/conveyor-vd-25-fg2, failures
# hold ~36 residual collisions). Levers stacked here: bf16 inference
# (~30-40% faster expansions -> more search in budget) + mid-search Jacobi
# repair every 16 accepted expansions (LNS-style plateau breaker).
set -u
cd "$(dirname "$0")/.."
LOG=results_summaries/r5_queue
mkdir -p "$LOG"
echo "=== 25-agent probe: bf16 + width2 + repair16 ($(date)) ===" >> "$LOG/probe25.log"
python -u scripts/launch_multi_agent_experiment.py \
  --instance EnvConveyor2DRobotPlanarDiskRandom \
  --num_agents 25 --planners XECBS --trials 10 \
  --runtime_limit 240 --frontier_width 2 --bf16 --repair_period 16 \
  --models_dir data_trained_models_vd --data_dir data_trajectories_vd \
  --time_str conveyor-vd-25-r5 \
  >> "$LOG/probe25.log" 2>&1
echo "=== probe done ($(date)) ===" >> "$LOG/probe25.log"
