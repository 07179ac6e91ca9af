#!/bin/bash
# Round-5 measurement queue (single tunneled TPU chip; stages sequential).
# Stage A: bf16 MODEL_EVAL rows for the 7 variants missing them.
# Stage B: lowdens-r5 validation sweep (VERDICT item 2).
# Stage C: bf16 dense grid = conveyor vd 60s fg2 protocol (VERDICT item 4).
# Stage D: multi-tile 2x2/3x3 refresh on the round-4/5 programs (item 3).
set -u
cd "$(dirname "$0")/.."
LOG=results_summaries/r5_queue
mkdir -p "$LOG"

echo "=== stage A: bf16 MODEL_EVAL rows ($(date)) ==="
for env in EnvEmpty2D EnvHighways2D EnvDropRegion2D; do
  python scripts/eval_model.py --env $env --bf16 --out_yaml MODEL_EVAL.yaml \
    > "$LOG/evalA_${env}_bf16.log" 2>&1
  tail -5 "$LOG/evalA_${env}_bf16.log"
done
for env in EnvConveyor2D EnvHighways2D EnvDropRegion2D; do
  python scripts/eval_model.py --env $env --bf16 \
    --models_dir data_trained_models_vd --data_dir data_trajectories_vd \
    --tag vd+bf16 \
    --variant "velocity-diverse checkpoint (data_trained_models_vd), bfloat16 UNet inference" \
    --out_yaml MODEL_EVAL.yaml > "$LOG/evalA_${env}_vd_bf16.log" 2>&1
  tail -5 "$LOG/evalA_${env}_vd_bf16.log"
done
python scripts/eval_model.py --env EnvConveyor2D --bf16 \
  --models_dir data_trained_models_h128 --data_dir data_trajectories_h128 \
  --tag h128+bf16 \
  --variant "long-horizon H=128 checkpoint (data_trained_models_h128, 10 s duration), bfloat16 UNet inference" \
  --out_yaml MODEL_EVAL.yaml > "$LOG/evalA_EnvConveyor2D_h128_bf16.log" 2>&1
tail -5 "$LOG/evalA_EnvConveyor2D_h128_bf16.log"

echo "=== stage B: lowdens-r5 sweeps ($(date)) ==="
for env in EnvHighways2D EnvDropRegion2D EnvConveyor2D; do
  python scripts/launch_multi_agent_experiment.py \
    --instance ${env}RobotPlanarDiskRandom \
    --num_agents 3 6 9 --planners XECBS ECBS --trials 10 \
    --runtime_limit 180 --time_str lowdens-r5-${env} \
    > "$LOG/lowdens_${env}.log" 2>&1
  tail -8 "$LOG/lowdens_${env}.log"
done

echo "=== stage C: bf16 dense grid (conveyor vd 60s fg2 protocol) ($(date)) ==="
python scripts/launch_multi_agent_experiment.py \
  --instance EnvConveyor2DRobotPlanarDiskRandom \
  --num_agents 12 15 20 --planners XECBS --trials 10 \
  --runtime_limit 60 --frontier_width 2 --bf16 \
  --models_dir data_trained_models_vd --data_dir data_trajectories_vd \
  --time_str conveyor-vd-60s-fg2-bf16 \
  > "$LOG/dense_bf16.log" 2>&1
tail -8 "$LOG/dense_bf16.log"

echo "=== stage D: multi-tile refresh ($(date)) ==="
python scripts/launch_multi_tile_experiment.py \
  --num_agents 2 4 6 --planners XECBS PP --trials 10 \
  --runtime_limit 240 --stagger_dt 10 --frontier_width 2 \
  --time_str multitile-r5 > "$LOG/multitile.log" 2>&1
tail -10 "$LOG/multitile.log"

echo "=== queue done ($(date)) ==="
