"""Prioritized planning: agents planned in index order under hard
keep-out constraints from already-planned agents.

TPU-native re-design of PrioritizedPlanning
(reference: mmd/planners/multi_agent/prioritized_planning.py:46-298):
- per-agent constraints are the ECBS-style per-waypoint balls made HARD
  (reference :150-158)
- best-in-batch selection by fewest conflicts runs as one fused device call
  (the reference loops get_conflicts per candidate, :172-183)
- success iff zero conflicts remain (reference :197-201).
"""
from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmd_tpu.common.multi_agent_utils import global_pad_paths
from mmd_tpu.config import params as default_params
from mmd_tpu.experiments.status import TrialSuccessStatus
from mmd_tpu.planners.multi_agent.cbs import CBS, SearchState, _best_paths_pos
from mmd_tpu.planners.multi_agent.conflict_detection import (
    select_candidate_and_conflicts,
    team_conflict_summary,
)


class PrioritizedPlanning(CBS):
    """Shares CBS's helpers (soft-constraint builder, conflict machinery);
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

    def _scan_eligible(self) -> bool:
        """Gate for the one-call fused PP scan: uniform start times and
        batchable single-tile MPD planners (staggered teams and ensemble
        agents keep the host loop)."""
        from mmd_tpu.parallel.team import _batchable
        from mmd_tpu.planners.single_agent.mpd import MPD

        return (self.uniform_time and self._densify == 1
                and all(isinstance(p, MPD) for p in self.low_level_planner_l)
                and _batchable(self.low_level_planner_l))

    def _plan_scan(self):
        """The whole PP pass in ONE device call (team.plan_prioritized_scan).

        Returns the plan() tuple, or None when a root agent had no free
        candidate — the caller reruns the host loop, whose partial-path
        failure semantics match the reference exactly."""
        from mmd_tpu.parallel.team import plan_prioritized_device

        out = plan_prioritized_device(
            self.low_level_planner_l,
            keys=self._team_keys(self.num_agents), margin=self.margin)
        if out is None:
            return None
        trajs, free_any, ix, free_mask, summary = out
        free_any, ix, summary = self._fetch((free_any, ix, summary))
        if not bool(np.asarray(free_any).all()):
            return None
        final = SearchState(trajs, [int(i) for i in ix])
        count, t, a, b, mid = summary
        final.n_conflicts = int(count)
        final.first_conflict = (self._mk_conflict(t, a, b, mid)
                                if count else None)
        final.summarized = True
        status = (TrialSuccessStatus.FAIL_COLLISION_AGENTS
                  if final.n_conflicts else TrialSuccessStatus.SUCCESS)
        best_path_l = global_pad_paths(final.best_paths(), self.start_time_l)
        return best_path_l, 0, status, final.n_conflicts

    def plan(self, runtime_limit: float = default_params.runtime_limit):
        # Deadline excludes jit compile seconds — the reference warms torch
        # compile at planner construction, outside plan() (mpd.py:176-177).
        from mmd_tpu.utils.profiling import compile_time_monitor

        t_start = time.time()
        status = TrialSuccessStatus.UNKNOWN
        compile_acc = self._compile_acc = {"compile_s": 0.0}
        monitor = compile_time_monitor(compile_acc)
        monitor.__enter__()
        try:
            return self._plan_body(runtime_limit, t_start, status,
                                   compile_acc)
        finally:
            monitor.__exit__(None, None, None)

    def _plan_body(self, runtime_limit, t_start, status, compile_acc):

        if self._scan_eligible():
            out = self._plan_scan()
            if out is not None:
                return out

        path_tiles: List[jax.Array] = []
        ix_best: List[int] = []
        for i in range(self.num_agents):
            partial = SearchState(jnp.stack(path_tiles) if path_tiles else None,
                                  list(ix_best))
            constraint_l = self.create_soft_constraints_from_other_agents_paths(
                partial, i, n_agents_in_state=len(path_tiles)) if path_tiles else []
            for c in constraint_l:
                c.is_soft = False  # priority constraints are hard (:150-154)
                c.t_range_l = [
                    (max(0, min(t0, default_params.horizon - 1)),
                     min(default_params.horizon - 1, t1))
                    for t0, t1 in c.t_range_l]
            planner = self.low_level_planner_l[i]
            res = planner._run(constraint_l, None)

            if path_tiles:
                # Fewest-conflicts selection vs already-planned agents
                # (:172-183), one fused device call: stack previous agents
                # plus a placeholder row for agent i.
                prev_pos = _best_paths_pos(jnp.stack(path_tiles),
                                           jnp.asarray(ix_best))
                cand_pos = res.trajs_final[..., :2]
                if not self.uniform_time:
                    # Stagger alignment (reference :150-183 compares globally
                    # padded paths): pad candidates and already-planned paths
                    # to a common global timeline before selection.
                    H = cand_pos.shape[1]
                    max_t = max(max(self.start_time_l[j] + prev_pos.shape[1]
                                    for j in range(i)),
                                self.start_time_l[i] + H)
                    prev_pos = jnp.asarray(np.stack([
                        self._pad_pos(np.asarray(prev_pos[j]), j, max_t)
                        for j in range(i)]))
                    cand_pos = jnp.asarray(self._pad_pos(
                        np.asarray(cand_pos), i, max_t))
                paths_pos = jnp.concatenate([
                    prev_pos,
                    jnp.full((1, prev_pos.shape[1], 2), 1e6)], axis=0)
                ix, count, _, _, _, _, any_free = jax.device_get(
                    (*select_candidate_and_conflicts(
                        cand_pos, res.free_mask, len(path_tiles),
                        paths_pos, self.margin), jnp.any(res.free_mask)))
            else:
                ix, any_free = jax.device_get((res.idx_best, jnp.any(res.free_mask)))
            if not bool(any_free):
                status = TrialSuccessStatus.FAIL_NO_SOLUTION
                break
            path_tiles.append(res.trajs_final)
            ix_best.append(int(ix))
            if (time.time() - t_start - compile_acc["compile_s"]
                    > runtime_limit):
                status = TrialSuccessStatus.FAIL_RUNTIME_LIMIT
                break

        if not path_tiles:
            return [], 0, status, 0

        final = SearchState(jnp.stack(path_tiles), ix_best)
        self._summarize(final)
        if status == TrialSuccessStatus.UNKNOWN:
            status = (TrialSuccessStatus.FAIL_COLLISION_AGENTS
                      if final.n_conflicts else TrialSuccessStatus.SUCCESS)
        best_path_l = global_pad_paths(final.best_paths(), self.start_time_l)
        return best_path_l, 0, status, final.n_conflicts
