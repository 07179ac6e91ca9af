"""Prioritized planning: agents planned in index order under hard
keep-out constraints from already-planned agents.

TPU-native re-design of PrioritizedPlanning
(reference: mmd/planners/multi_agent/prioritized_planning.py:46-298):
- per-agent constraints are the ECBS-style per-waypoint balls made HARD
  (reference :150-158)
- best-in-batch selection by fewest conflicts, batched on device here
  (reference loops get_conflicts per candidate, :172-183)
- success iff zero conflicts remain (reference :197-201); conflict counting
  uses unordered pairs (reference PP.get_conflicts :249-298).
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from mmd_tpu.common.multi_agent_utils import (
    global_pad_paths,
    is_multi_agent_start_goal_states_valid,
)
from mmd_tpu.config import params as default_params
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.planners.multi_agent.cbs import CBS, SearchState
from mmd_tpu.planners.multi_agent.conflict_detection import (
    candidate_conflict_counts,
    find_conflicts,
)


class PrioritizedPlanning(CBS):
    """Shares CBS's helpers (soft-constraint builder, conflict detection);
    the reference similarly duplicates that code between the classes."""

    def __init__(self, low_level_planner_l, start_l, goal_l,
                 start_time_l: Optional[List[int]] = None,
                 reference_robot=None, reference_task=None,
                 validate_start_goal: bool = True, verbose: bool = False,
                 **kwargs):
        super().__init__(low_level_planner_l, start_l, goal_l,
                         start_time_l=start_time_l, is_xcbs=False, is_ecbs=False,
                         reference_robot=reference_robot,
                         reference_task=reference_task,
                         validate_start_goal=validate_start_goal, verbose=verbose)

    def plan(self, runtime_limit: float = default_params.runtime_limit):
        t_start = time.time()
        status = TrialSuccessStatus.UNKNOWN

        root = SearchState([], [])
        for i in range(self.num_agents):
            constraint_l = self.create_soft_constraints_from_other_agents_paths(root, i)
            for c in constraint_l:
                c.is_soft = False  # priority constraints are hard (:150-154)
                c.t_range_l = [
                    (max(0, min(t0, default_params.horizon - 1)),
                     min(default_params.horizon - 1, t1))
                    for t0, t1 in c.t_range_l]
            out = self.low_level_planner_l[i](self.start_state_pos_l[i],
                                              self.goal_state_pos_l[i],
                                              constraints_l=constraint_l)
            if out.trajs_final_free_idxs.shape[0] == 0:
                status = TrialSuccessStatus.FAIL_NO_SOLUTION
                break
            root.path_bl.append(np.asarray(out.trajs_final))
            root.ix_best_l.append(int(out.idx_best_traj))
            # Fewest-conflicts selection among free candidates (:172-183),
            # batched on device.
            self._choose_best_in_batch(root, i, out.trajs_final_free_idxs)
            if time.time() - t_start > runtime_limit:
                status = TrialSuccessStatus.FAIL_RUNTIME_LIMIT
                break

        conflict_l = self.get_conflicts(root) if root.path_bl else []
        if status == TrialSuccessStatus.UNKNOWN:
            status = (TrialSuccessStatus.FAIL_COLLISION_AGENTS if conflict_l
                      else TrialSuccessStatus.SUCCESS)

        best_path_l = global_pad_paths(root.best_paths(), self.start_time_l)
        return best_path_l, 0, status, len(conflict_l)
