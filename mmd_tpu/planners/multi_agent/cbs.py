"""Conflict-Based Search over guided-diffusion low-level planners.

TPU-native re-design of CBS (reference: mmd/planners/multi_agent/cbs.py).
The four variants map exactly as in the reference
(inference_multi_agent.py:112-113):
  CBS   = is_ecbs=False, is_xcbs=False
  ECBS  = is_ecbs=True  (soft constraints from other agents' paths)
  XCBS  = is_xcbs=True  (experience warm-start on replans)
  XECBS = both

Host-side: the constraint-tree search (dynamic, branchy). Device-side: every
per-batch operation —
- conflict detection is one stacked pairwise-collision tensor
  (conflict_detection.find_conflicts ~ cbs.py:166-246)
- least-collisions best-in-batch selection scores ALL candidate
  trajectories in one jitted call (candidate_conflict_counts), replacing the
  reference's Python loop of B full conflict checks (cbs.py:446-458).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from mmd_tpu.common.conflict_conversion import convert_conflicts_to_constraints
from mmd_tpu.common.conflicts import PointConflict
from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.common.experiences import PathBatchExperience
from mmd_tpu.common.multi_agent_utils import (
    global_pad_paths,
    is_multi_agent_start_goal_states_valid,
)
from mmd_tpu.config import params as default_params
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.planners.multi_agent.conflict_detection import (
    candidate_conflict_counts,
    find_conflicts,
)


class SearchState:
    """Constraint-tree node (reference: cbs.py:63-106)."""

    def __init__(self, ix_best_l: List[int], path_bl: List[np.ndarray],
                 constraints: Optional[Dict[int, List[MultiPointConstraint]]] = None):
        self.path_bl = path_bl          # per agent: (B, H, D) numpy
        self.ix_best_l = ix_best_l      # per agent: best index in batch
        self.conflict_l: List[PointConflict] = []
        self.constraints = constraints or {}
        self.g = float("inf")

    def best_paths(self) -> List[np.ndarray]:
        return [self.path_bl[i][ix] for i, ix in enumerate(self.ix_best_l)]

    def update_g_l2(self):
        # Sum of full-state path lengths of the best paths (cbs.py:75-83).
        self.g = float(sum(
            np.linalg.norm(np.diff(p, axis=0), axis=-1).sum()
            for p in self.best_paths()))

    def add_constraint(self, agent_id: int, c: MultiPointConstraint):
        self.constraints.setdefault(agent_id, []).append(c)

    def get_copy(self) -> "SearchState":
        s = SearchState(list(self.ix_best_l), list(self.path_bl),
                        {k: list(v) for k, v in self.constraints.items()})
        s.conflict_l = self.conflict_l
        s.g = self.g
        return s


class CBS:
    def __init__(self, low_level_planner_l, start_l, goal_l,
                 start_time_l: Optional[List[int]] = None,
                 is_xcbs: bool = False, is_ecbs: bool = True,
                 reference_robot=None, reference_task=None,
                 validate_start_goal: bool = True, verbose: bool = False):
        self.low_level_planner_l = low_level_planner_l
        self.is_xcbs = is_xcbs
        self.is_ecbs = is_ecbs
        self.num_agents = len(start_l)
        self.start_state_pos_l = [np.asarray(s) for s in start_l]
        self.goal_state_pos_l = [np.asarray(g) for g in goal_l]
        self.start_time_l = start_time_l or [0] * self.num_agents
        self.reference_robot = reference_robot or low_level_planner_l[0].robot
        self.reference_task = reference_task or low_level_planner_l[0].task
        self.margin = self.reference_robot.rr_margin
        self.verbose = verbose
        self.open_l: List[SearchState] = []
        if validate_start_goal and not is_multi_agent_start_goal_states_valid(
                self.reference_robot, self.reference_task,
                self.start_state_pos_l, self.goal_state_pos_l):
            raise ValueError("Start or goal states are invalid (cbs.py:155-163).")

    # ------------------------------------------------------------- helpers
    def _log(self, *a):
        if self.verbose:
            print(*a)

    def get_conflicts(self, state: SearchState) -> List[PointConflict]:
        best = global_pad_paths(state.best_paths(), self.start_time_l)
        return find_conflicts(best, self.margin)

    def _padded_positions(self, paths: List[np.ndarray]) -> np.ndarray:
        return np.stack([p[:, :2] for p in global_pad_paths(paths, self.start_time_l)])

    def _pad_candidates(self, cand: np.ndarray, agent_id: int, max_t: int) -> np.ndarray:
        """Pad a (B, H, D) candidate batch to the team horizon, honoring the
        agent's start time — batched global_pad_paths."""
        B, H, _ = cand.shape
        pos = cand[:, :, :2]
        st = self.start_time_l[agent_id]
        tail = max_t - H - st
        parts = []
        if st > 0:
            parts.append(np.repeat(pos[:, :1], st, axis=1))
        parts.append(pos)
        if tail > 0:
            parts.append(np.repeat(pos[:, -1:], tail, axis=1))
        return np.concatenate(parts, axis=1)

    def _choose_best_in_batch(self, state: SearchState, agent_id: int,
                              free_idxs: np.ndarray) -> Tuple[int, List[PointConflict]]:
        """least_collisions selection, batched on device (cbs.py:446-458)."""
        best = global_pad_paths(state.best_paths(), self.start_time_l)
        max_t = best[0].shape[0]
        paths_pos = np.stack([p[:, :2] for p in best])
        cand_pos = self._pad_candidates(state.path_bl[agent_id], agent_id, max_t)
        counts = np.asarray(candidate_conflict_counts(
            jnp.asarray(cand_pos), agent_id, jnp.asarray(paths_pos), self.margin))
        counts_free = counts[free_idxs]
        ix = int(free_idxs[int(np.argmin(counts_free))])
        state.ix_best_l[agent_id] = ix
        return ix, self.get_conflicts(state)

    def create_soft_constraints_from_other_agents_paths(
            self, state: SearchState, agent_id: int) -> List[MultiPointConstraint]:
        """One soft MultiPointConstraint holding a (q, [t, t+1]) ball per
        other-agent waypoint (reference: cbs.py:468-506)."""
        if len(state.path_bl) == 0:
            return []
        q_l, t_range_l, radius_l = [], [], []
        for other in range(len(state.path_bl)):
            if other == agent_id:
                continue
            path = state.path_bl[other][state.ix_best_l[other]]
            pos = path[:, :2]
            if agent_id < len(state.path_bl):
                T_agent = len(state.path_bl[agent_id][0]) - 1
            else:
                T_agent = len(path) - 1
            for t_other in range(len(path)):
                t_agent = t_other + self.start_time_l[other] - self.start_time_l[agent_id]
                if 1 <= t_agent <= T_agent:
                    q_l.append(pos[t_other])
                    t_range_l.append((t_agent, t_agent + 1))
                    radius_l.append(default_params.vertex_constraint_radius)
        if not q_l:
            return []
        c = MultiPointConstraint(q_l=q_l, t_range_l=t_range_l, radius_l=radius_l,
                                 is_soft=True)
        return [c]

    # ---------------------------------------------------------------- plan
    def plan(self, runtime_limit: float = default_params.runtime_limit):
        """Returns (best_path_l, n_ct_expansions, TrialSuccessStatus,
        n_collisions) (reference: cbs.py:302-389)."""
        t_start = time.time()
        status = TrialSuccessStatus.UNKNOWN

        root = SearchState([], [])
        root_outs = None
        if not self.is_ecbs:
            # CBS/XCBS roots are independent -> batch the whole team's
            # unconstrained plans into one device call (vmapped sampler).
            from mmd_tpu.parallel.team import plan_team_roots
            root_outs = plan_team_roots(self.low_level_planner_l)
        for i in range(self.num_agents):
            if root_outs is not None:
                out = root_outs[i]
            else:
                soft_l = (self.create_soft_constraints_from_other_agents_paths(root, i)
                          if self.is_ecbs else [])
                out = self.low_level_planner_l[i](self.start_state_pos_l[i],
                                                  self.goal_state_pos_l[i],
                                                  constraints_l=soft_l)
            if out.trajs_final_free_idxs.shape[0] == 0:
                self._log("Failed to find valid paths in root CT node.")
                status = TrialSuccessStatus.FAIL_NO_SOLUTION
                state = root
                break
            root.path_bl.append(np.asarray(out.trajs_final))
            root.ix_best_l.append(int(out.idx_best_traj))
            if time.time() - t_start > runtime_limit:
                status = TrialSuccessStatus.FAIL_RUNTIME_LIMIT
                state = root
                break

        num_expansions = 0
        if status == TrialSuccessStatus.UNKNOWN:
            root.update_g_l2()
            root.conflict_l = self.get_conflicts(root)
            self.open_l.append(root)

        while status == TrialSuccessStatus.UNKNOWN:
            if not self.open_l:
                status = TrialSuccessStatus.FAIL_NO_SOLUTION
                state = root
                break
            # Fewest-conflicts-first (cbs.py:365; cost-sort alternative noted).
            self.open_l.sort(key=lambda s: len(s.conflict_l))
            state = self.open_l.pop(0)
            if not state.conflict_l:
                status = TrialSuccessStatus.SUCCESS
                break
            self.expand(state)
            num_expansions += 1
            if time.time() - t_start > runtime_limit:
                status = TrialSuccessStatus.FAIL_RUNTIME_LIMIT
                break

        best_path_l = global_pad_paths(state.best_paths(), self.start_time_l)
        return best_path_l, num_expansions, status, len(state.conflict_l)

    # -------------------------------------------------------------- expand
    def expand(self, state: SearchState):
        """reference: cbs.py:390-466."""
        conflict = state.conflict_l[0]
        constraints = convert_conflicts_to_constraints(conflict)
        for agent_id, constraint in constraints.items():
            # Shift to the agent's local time and clamp (cbs.py:399-406).
            H_agent = state.path_bl[agent_id].shape[1]
            constraint = constraint.shifted(-self.start_time_l[agent_id], 0, H_agent - 1)

            new_state = state.get_copy()
            new_state.add_constraint(agent_id, constraint)
            agent_constraint_l = list(new_state.constraints[agent_id])
            if self.is_ecbs:
                agent_constraint_l.extend(
                    self.create_soft_constraints_from_other_agents_paths(new_state, agent_id))
            experience = (PathBatchExperience(new_state.path_bl[agent_id])
                          if self.is_xcbs else None)

            out = self.low_level_planner_l[agent_id](
                self.start_state_pos_l[agent_id], self.goal_state_pos_l[agent_id],
                constraints_l=agent_constraint_l, experience=experience)
            if len(out.trajs_final_free_idxs) == 0:
                self._log("Failed to find valid path in CT node.")
                continue  # skip this child (cbs.py:433-435)

            new_state.path_bl[agent_id] = np.asarray(out.trajs_final)
            _, new_state.conflict_l = self._choose_best_in_batch(
                new_state, agent_id, out.trajs_final_free_idxs)
            new_state.update_g_l2()
            self.open_l.append(new_state)
