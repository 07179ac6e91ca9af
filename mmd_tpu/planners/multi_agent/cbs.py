"""Conflict-Based Search over guided-diffusion low-level planners.

TPU-native re-design of CBS (reference: mmd/planners/multi_agent/cbs.py).
The four variants map exactly as in the reference
(inference_multi_agent.py:112-113):
  CBS   = is_ecbs=False, is_xcbs=False
  ECBS  = is_ecbs=True  (soft constraints from other agents' paths)
  XCBS  = is_xcbs=True  (experience warm-start on replans)
  XECBS = both

Host-side: only the constraint-tree bookkeeping. Device-side: everything
batched —
- the whole team's path batches live in ONE (n_agents, B, H, D) device array
  per CT node (jax arrays are immutable, so node copies are free)
- CBS/XCBS root creation vmaps all agents' unconstrained plans into one call
  (mmd_tpu/parallel/team.py), replacing the reference's sequential loop
  (cbs.py:316-335)
- each CT expansion is two device calls: the jitted plan, then a fused
  least-collisions selection + first-conflict summary
  (conflict_detection.select_candidate_and_conflicts), replacing the
  reference's B-candidate Python loop of full conflict rebuilds
  (cbs.py:446-458) — only a handful of scalars ever cross the host boundary.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
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
    find_conflicts,
    select_candidate_and_conflicts,
    team_conflict_summary,
)


@jax.jit
def _best_paths_pos(paths_all: jax.Array, ix: jax.Array) -> jax.Array:
    """(n, B, H, D), (n,) -> (n, H, 2) positions of each agent's best path."""
    n = paths_all.shape[0]
    return paths_all[jnp.arange(n), ix][..., :2]


@jax.jit
def _best_paths_full(paths_all: jax.Array, ix: jax.Array) -> jax.Array:
    """(n, B, H, D), (n,) -> (n, H, D) full-state best paths. Gathering on
    device before the host fetch transfers A*H*D floats instead of the whole
    sample batch (A*B*H*D ~ 6.5 MB for the 10-robot flagship — was 0.3 s of
    pure tunnel time per plan when fetched via np.asarray(paths_all))."""
    n = paths_all.shape[0]
    return paths_all[jnp.arange(n), ix]


def _plannable(constraint_l) -> List[MultiPointConstraint]:
    """Typed Vertex/Edge constraints -> plannable MultiPointConstraint form
    (the diffusion planner consumes keep-out balls only, mpd.py:329-342)."""
    return [c if isinstance(c, MultiPointConstraint) else c.as_multipoint()
            for c in constraint_l]


class SearchState:
    """Constraint-tree node (reference: cbs.py:63-106). Paths are one device
    array; copies share buffers (immutability makes get_copy free)."""

    def __init__(self, paths_all: Optional[jax.Array], ix_best: List[int],
                 constraints: Optional[Dict[int, List[MultiPointConstraint]]] = None):
        self._paths = paths_all          # (n_agents, B, H, D) device array
        # Lazy single-agent row updates: [(agent_id, traj_ref)] where
        # traj_ref is either a (B, H, D) array or an (array, index_tuple)
        # slice reference into a fused call's stacked output. Children are
        # created in bulk by the speculative greedy/frontier paths but most
        # never leave the open list; deferring the row scatter (and the
        # slice) until paths_all is actually read avoids one eager TPU
        # dispatch per child (~1 ms each over the tunnel, tens of ms per
        # plan at the flagship scale).
        self._pending: List[tuple] = []
        self.ix_best = ix_best
        self.constraints = constraints or {}
        self.n_conflicts: int = 0
        self.summarized: bool = False
        self.first_conflict: Optional[PointConflict] = None
        self.g = float("inf")

    @property
    def paths_all(self):
        if self._pending:
            rows = {}                      # agent -> latest ref (last wins)
            for agent, ref in self._pending:
                rows[agent] = ref
            trajs = jnp.stack([
                ref[0][ref[1]] if isinstance(ref, tuple) else ref
                for ref in rows.values()])
            agents = jnp.asarray(list(rows.keys()), jnp.int32)
            self._paths = self._paths.at[agents].set(trajs)
            self._pending = []
        return self._paths

    @paths_all.setter
    def paths_all(self, value):
        self._paths = value
        self._pending = []

    def add_path_update(self, agent_id: int, traj_ref) -> None:
        """Defer `paths_all[agent_id] = traj` until paths_all is read."""
        self._pending.append((agent_id, traj_ref))

    @property
    def has_paths(self) -> bool:
        """paths_all presence without materializing pending updates."""
        return self._paths is not None

    def best_paths(self) -> List[np.ndarray]:
        if isinstance(self.paths_all, jax.Array):
            sel = np.asarray(_best_paths_full(
                self.paths_all, jnp.asarray(self.ix_best, jnp.int32)))
            return list(sel)
        arr = np.asarray(self.paths_all)
        return [arr[i, ix] for i, ix in enumerate(self.ix_best)]

    def update_g_l2(self):
        # Sum of full-state path lengths of best paths (cbs.py:75-83);
        # only needed for the least-cost sort alternative.
        self.g = float(sum(
            np.linalg.norm(np.diff(p, axis=0), axis=-1).sum()
            for p in self.best_paths()))

    def add_constraint(self, agent_id: int, c: MultiPointConstraint):
        self.constraints.setdefault(agent_id, []).append(c)

    def get_copy(self) -> "SearchState":
        s = SearchState(self._paths, list(self.ix_best),
                        {k: list(v) for k, v in self.constraints.items()})
        s._pending = list(self._pending)
        s.n_conflicts = self.n_conflicts
        s.first_conflict = self.first_conflict
        s.g = self.g
        return s


class CBS:
    def __init__(self, low_level_planner_l, start_l, goal_l,
                 start_time_l: Optional[List[int]] = None,
                 is_xcbs: bool = False, is_ecbs: bool = True,
                 reference_robot=None, reference_task=None,
                 validate_start_goal: bool = True, verbose: bool = False,
                 root_repair_rounds: int = 0,
                 choose_path_strategy: Optional[str] = None,
                 conflict_types: Tuple = (PointConflict,),
                 mesh=None, frontier_width: int = 1,
                 greedy_iters: Optional[int] = None,
                 repair_period: int = 0):
        self.low_level_planner_l = low_level_planner_l
        self.is_xcbs = is_xcbs
        self.is_ecbs = is_ecbs
        self.num_agents = len(start_l)
        self.start_state_pos_l = [np.asarray(s) for s in start_l]
        self.goal_state_pos_l = [np.asarray(g) for g in goal_l]
        self.start_time_l = start_time_l or [0] * self.num_agents
        self.uniform_time = all(t == 0 for t in self.start_time_l)
        self.reference_robot = reference_robot or low_level_planner_l[0].robot
        self.reference_task = reference_task or low_level_planner_l[0].task
        self.margin = self.reference_robot.rr_margin
        self.verbose = verbose
        # Reject invalid team instances up front, as the reference does
        # (cbs.py:155-163): pairwise separation + robot-robot + world
        # collisions on both the start and goal sets.
        if validate_start_goal and not is_multi_agent_start_goal_states_valid(
                self.reference_robot, self.reference_task,
                self.start_state_pos_l, self.goal_state_pos_l):
            raise ValueError("Start or goal states are invalid (cbs.py:155-163).")
        # TPU-first extension beyond the reference: after the batched root,
        # run k Jacobi rounds where EVERY agent simultaneously re-plans with
        # soft constraints from the others' current paths (the parallel
        # analog of ECBS's sequential soft-constrained root, cbs.py:316-335).
        self.root_repair_rounds = root_repair_rounds
        # Conflict types to detect (reference conflict_type_to_constraint_
        # types, cbs.py:118-130; main pipeline uses PointConflict only,
        # inference_multi_agent.py:116). Requesting EdgeConflict switches
        # detection to x2-densified paths (cbs.py:185-245).
        from mmd_tpu.common.conflicts import EdgeConflict
        self.conflict_types = tuple(conflict_types)
        self._densify = 2 if EdgeConflict in self.conflict_types else 1
        # 'least_collisions' (default) or 'least_cost'
        # (reference: mmd_params.py:53, cbs.py:436-462).
        self.choose_path_strategy = (choose_path_strategy or
                                     default_params.low_level_choose_path_from_batch_strategy)
        # Team-level PRNG stream: ONE split serves a whole batched call
        # instead of one device dispatch per planner. Seeded from the first
        # planner's stream so consecutive searches draw fresh randomness.
        p0 = low_level_planner_l[0]
        self._key = (p0._next_key() if hasattr(p0, "_next_key")
                     else jax.random.PRNGKey(default_params.seed))
        self.open_l: List[SearchState] = []
        self._hard_all = None  # lazily stacked (A, H, D) team hard conds
        # Multi-chip execution is a flag flip, not a rewrite: with a mesh
        # whose 'agent' axis divides the team size, the team-batched root,
        # Jacobi repair rounds, and (by sharding propagation) the fused
        # expansions run SPMD over the mesh — XLA inserts the collectives
        # at the pairwise conflict reductions. The host search loop is
        # unchanged. Single-device behavior is the mesh=None default.
        if mesh is not None:
            if "agent" not in mesh.axis_names:
                raise ValueError(f"mesh {mesh.axis_names} has no 'agent' axis")
            if self.num_agents % mesh.shape["agent"] != 0:
                raise ValueError(
                    f"num_agents={self.num_agents} not divisible by the "
                    f"mesh 'agent' axis ({mesh.shape['agent']})")
        self.mesh = mesh
        # Throughput mode for dense instances (beyond-reference): expand the
        # top `frontier_width` open nodes' first conflicts — 2*M child
        # replans — in ONE fused device call (fused.frontier_expand). Every
        # child is the exact single-node CBS expansion of its own parent;
        # only the host-side expansion ORDER generalizes from "one best
        # node per round trip" to "M best nodes". 1 = reference order.
        self.frontier_width = max(1, int(frontier_width))
        if self.frontier_width & (self.frontier_width - 1):
            self._log(
                f"frontier_width={self.frontier_width} is not a power of "
                "two; frontier batches are power-of-two shaped, so it runs "
                f"as width {1 << (self.frontier_width.bit_length() - 1)}.")
        # Test/diagnostic hook: when set to a list, the greedy CT search
        # appends one event per speculative step — ("step", parent_conflicts,
        # open_list_min) before each accepted expansion, plus ("freeze",),
        # ("starved",), and ("stop", chosen_conflicts, open_list_min)
        # markers for its recovery/stop branches.
        self.greedy_audit: Optional[list] = None
        # Speculative-chain depth per fused greedy/frontier call. Default is
        # the class attribute (monkeypatchable for small CPU programs); an
        # explicit value shadows it per instance. Each distinct depth
        # compiles its own program variant.
        if greedy_iters:
            self.GREEDY_ITERS = int(greedy_iters)
        # Beyond-reference dense-instance lever: every `repair_period`
        # accepted expansions, run ONE Jacobi repair round on the node just
        # popped (every agent re-plans fresh+soft in one batched call;
        # accept-if-improved damping, conflict_detection.repair_accept) and
        # insert the result as a sibling node if it strictly improves. Large-
        # neighborhood-search-style move: the repaired node's paths need not
        # respect its CT-constraint lineage — solution validity is judged by
        # actual conflicts (0 conflicts = SUCCESS), and the strict post-hoc
        # collision audit in experiments/trial.py is unchanged. 0 = off
        # (reference semantics).
        self.repair_period = int(repair_period)
        self._last_repair = 0
        # Blocking device time (dispatch queue + compute + tunnel transfer)
        # accumulated over plan(); host share = wall - device_s. Surfaced by
        # bench.py so host-overhead regressions are visible per round.
        self.timing = {"device_s": 0.0, "device_calls": 0}

    def _fetch(self, tree, phase: str = "other"):
        """jax.device_get with blocking-time accounting, per search phase
        (root / greedy / children / expand / summary / repair) so bench.py
        can print where the one-device-call latency actually goes."""
        t0 = time.perf_counter()
        out = jax.device_get(tree)
        dt = time.perf_counter() - t0
        self.timing["device_s"] += dt
        self.timing["device_calls"] += 1
        key = f"device_{phase}_s"
        self.timing[key] = self.timing.get(key, 0.0) + dt
        return out

    def _team_keys(self, n: int) -> jax.Array:
        keys = jax.random.split(self._key, n + 1)
        self._key = keys[0]
        return keys[1:]

    # ------------------------------------------------------------- helpers
    def _log(self, *a):
        if self.verbose:
            print(*a)

    def _pad_pos(self, pos: np.ndarray, agent_id: int, max_t: int) -> np.ndarray:
        st = self.start_time_l[agent_id]
        tail = max_t - pos.shape[-2] - st
        parts = []
        if st > 0:
            parts.append(np.repeat(pos[..., :1, :], st, axis=-2))
        parts.append(pos)
        if tail > 0:
            parts.append(np.repeat(pos[..., -1:, :], tail, axis=-2))
        return np.concatenate(parts, axis=-2)

    def _team_pos(self, state: SearchState):
        """Padded (n, T, 2) team positions, computed on device (staggered
        teams pad by start time with an in-graph gather,
        conflict_detection.pad_team_positions)."""
        pos = _best_paths_pos(state.paths_all, jnp.asarray(state.ix_best))
        if self.uniform_time:
            return pos
        from mmd_tpu.planners.multi_agent.conflict_detection import (
            pad_team_positions,
        )
        L = state.paths_all.shape[2]
        return pad_team_positions(pos, jnp.asarray(self.start_time_l, jnp.int32),
                                  max(self.start_time_l) + L)

    def _summarize(self, state: SearchState):
        """Fill n_conflicts / first_conflict from one device summary call."""
        pos = self._team_pos(state)
        if self._densify > 1:
            from mmd_tpu.planners.multi_agent.conflict_detection import (
                densify_positions,
            )
            dense = densify_positions(pos, self._densify)
            count, t, a, b, mid = self._fetch(
                team_conflict_summary(dense, self.margin), phase="summary")
            state.n_conflicts = int(count)
            state.first_conflict = (
                self._mk_conflict_dense(int(t), int(a), int(b),
                                        np.asarray(mid), np.asarray(pos))
                if count else None)
            return
        count, t, a, b, mid = self._fetch(
            team_conflict_summary(pos, self.margin), phase="summary")
        state.n_conflicts = int(count)
        state.first_conflict = self._mk_conflict(t, a, b, mid) if count else None

    def _mk_conflict(self, t, a, b, mid) -> PointConflict:
        mid = np.asarray(mid)
        return PointConflict(agent_ids=[int(a), int(b)], p_l=[mid, mid],
                             q_l=[mid, mid], t_from=int(t), t_to=int(t))

    def _mk_conflict_dense(self, t_dense: int, a: int, b: int,
                           mid: np.ndarray, pos: np.ndarray):
        """First-conflict record from a densified hit (reference
        cbs.py:195-245): integral time -> VertexConflict, fractional ->
        EdgeConflict, PointConflict as the fallback/requested type."""
        from mmd_tpu.common.conflicts import EdgeConflict, VertexConflict

        t_from = t_dense // self._densify
        t_to = -(-t_dense // self._densify)
        if t_from == t_to and VertexConflict in self.conflict_types:
            return VertexConflict(agent_ids=[a, b],
                                  q_map={a: pos[a, t_from], b: pos[b, t_from]},
                                  t=t_from)
        if t_from != t_to and EdgeConflict in self.conflict_types:
            return EdgeConflict(agent_ids=[a, b],
                                q_from_map={a: pos[a, t_from],
                                            b: pos[b, t_from]},
                                q_to_map={a: pos[a, t_to], b: pos[b, t_to]},
                                t_from=t_from, t_to=t_to)
        return PointConflict(agent_ids=[a, b], p_l=[mid, mid], q_l=[mid, mid],
                             t_from=t_from, t_to=t_to)

    def render_paths(self, paths_l, constraints_l=None,
                     animation_duration: float = 10.0,
                     output_fpath: str = "ct-paths.gif",
                     n_frames: Optional[int] = None, plot_trajs: bool = True,
                     show_robot_in_image: bool = True) -> str:
        """Render the team solution — GIF animation, or a PNG when
        animation_duration is falsy (reference: cbs.py:248-300)."""
        from mmd_tpu.viz.visualizer import PlanningVisualizer

        viz = PlanningVisualizer(task=self.reference_task)
        if not animation_duration:
            import matplotlib.pyplot as plt
            fig = ax = None
            for i, p in enumerate(paths_l):
                fig, ax = viz.render_robot_trajectories(
                    fig=fig, ax=ax, trajs=np.asarray(p)[None],
                    start_state=self.start_state_pos_l[i],
                    goal_state=self.goal_state_pos_l[i],
                    constraints_l=constraints_l,
                    show_robot_in_image=show_robot_in_image)
            if not output_fpath.endswith(".png"):
                output_fpath = output_fpath.rsplit(".", 1)[0] + ".png"
            ax.axis("off")
            fig.savefig(output_fpath, dpi=100, bbox_inches="tight",
                        pad_inches=0)
            plt.close(fig)
            return output_fpath
        T = max(np.asarray(p).shape[0] for p in paths_l)
        return viz.animate_multi_robot_trajectories(
            trajs_l=paths_l, start_state_l=self.start_state_pos_l,
            goal_state_l=self.goal_state_pos_l, plot_trajs=plot_trajs,
            video_filepath=output_fpath,
            n_frames=n_frames or max(2, min(T, 100)),
            anim_time=animation_duration, constraints=constraints_l)

    def get_conflicts(self, state: SearchState) -> List[PointConflict]:
        """Full conflict list (host records) — kept for API parity/rendering."""
        best = global_pad_paths(state.best_paths(), self.start_time_l)
        return find_conflicts(best, self.margin,
                              conflict_types=self.conflict_types)

    def create_soft_constraints_from_other_agents_paths(
            self, state: SearchState, agent_id: int,
            n_agents_in_state: Optional[int] = None) -> List[MultiPointConstraint]:
        """One soft MultiPointConstraint holding a (q, [t, t+1]) ball per
        other-agent waypoint (reference: cbs.py:468-506)."""
        n_in_state = (n_agents_in_state if n_agents_in_state is not None
                      else (state._paths.shape[0] if state.has_paths else 0))
        if n_in_state == 0:
            return []
        pos_all = np.asarray(_best_paths_pos(
            state.paths_all, jnp.asarray(state.ix_best + [0] * (state.paths_all.shape[0] - len(state.ix_best)))))
        q_l, t_range_l, radius_l = [], [], []
        H = pos_all.shape[1]
        for other in range(n_in_state):
            if other == agent_id:
                continue
            T_agent = H - 1
            for t_other in range(H):
                t_agent = t_other + self.start_time_l[other] - self.start_time_l[agent_id]
                if 1 <= t_agent <= T_agent:
                    q_l.append(pos_all[other, t_other])
                    t_range_l.append((t_agent, t_agent + 1))
                    radius_l.append(default_params.vertex_constraint_radius)
        if not q_l:
            return []
        return [MultiPointConstraint(q_l=q_l, t_range_l=t_range_l,
                                     radius_l=radius_l, is_soft=True)]

    # ---------------------------------------------------------------- plan
    def plan(self, runtime_limit: float = default_params.runtime_limit,
             anytime: bool = True):
        """Returns (best_path_l, n_ct_expansions, TrialSuccessStatus,
        n_collisions) (reference: cbs.py:302-389).

        anytime (beyond-reference): on FAIL_RUNTIME_LIMIT, return the
        LEAST-CONFLICTED node seen anywhere in the search (popped or still
        open) with its residual conflict count, instead of the last popped
        node — a runtime-limited trial becomes a measurable near-miss. The
        status is unchanged; SUCCESS paths are identical either way.

        The runtime limit is checked against SEARCH time: jit compile
        seconds observed during the call are excluded from the deadline
        (the reference pays its torch.compile warmup at planner
        construction, outside plan() — diffusion_model_base.py:314,
        mpd.py:176-177 — so counting first-trial XLA compiles against the
        budget would fail trials the reference protocol would not)."""
        from mmd_tpu.utils.profiling import compile_time_monitor

        with compile_time_monitor() as acc:
            out = self._plan_timed(runtime_limit, anytime, acc)
        self.timing["compile_s"] = self.timing.get("compile_s", 0.0) + \
            acc["compile_s"]
        return out

    def _plan_timed(self, runtime_limit: float, anytime: bool,
                    compile_acc: dict):
        t_start = time.time()

        def over_limit() -> bool:
            elapsed = time.time() - t_start
            # XLA compiles programs on parallel threads, so the SUM of
            # compile-event durations can exceed wall time; cap the
            # exclusion at elapsed so search time is never negative (a
            # negative budget must always be over limit).
            return elapsed - min(compile_acc["compile_s"], elapsed) \
                > runtime_limit
        status = TrialSuccessStatus.UNKNOWN
        state = root = SearchState(None, [])

        # ---- fused root+greedy fast path ------------------------------
        # Root creation + conflict summary + k speculative greedy CT
        # expansions in ONE device call (fused.root_greedy): easy instances
        # complete the whole search in a single tunnel round trip.
        num_expansions = 0
        rg_handled = False
        if self._root_greedy_eligible():
            rg_root, n_rg = self._plan_root_greedy()
            rg_handled = True
            if rg_root is None:
                status = TrialSuccessStatus.FAIL_NO_SOLUTION
            else:
                state = root = rg_root
                num_expansions = n_rg
                if n_rg == 0 or root.n_conflicts == 0:
                    # Unexpanded (or already-solved) root: the search loop
                    # pops it as usual; otherwise its children are already
                    # in the open list.
                    self.open_l.append(root)

        # ---- root creation --------------------------------------------
        # The root's conflict summary is computed INSIDE the root program
        # when possible (uniform time, integral densification, no repair
        # rounds — repair re-summarizes anyway): one device call and one
        # tunnel round trip for root + summary instead of two.
        fused_summary_margin = (
            self.margin if (self.uniform_time and self._densify == 1
                            and self.root_repair_rounds == 0) else None)
        path_tiles: List[jax.Array] = []
        team = None
        if rg_handled:
            pass
        elif not self.is_ecbs or self.root_repair_rounds > 0:
            # CBS/XCBS roots are independent -> one vmapped device call.
            # With repair rounds, the batched Jacobi soft re-plan substitutes
            # for ECBS's sequential soft-constrained root.
            from mmd_tpu.parallel.team import plan_team_roots_device
            team = plan_team_roots_device(self.low_level_planner_l,
                                          keys=self._team_keys(self.num_agents),
                                          summary_margin=fused_summary_margin,
                                          mesh=self.mesh)
        elif self.uniform_time:
            # ECBS sequential soft-constrained root as ONE device call
            # (lax.scan over agents; reference cbs.py:316-335 semantics).
            from mmd_tpu.parallel.team import (
                plan_team_roots_sequential_soft_device,
            )
            team = plan_team_roots_sequential_soft_device(
                self.low_level_planner_l, keys=self._team_keys(self.num_agents),
                summary_margin=fused_summary_margin)

        if team is not None:
            trajs_all, free_any, idx_best, free_mask_all = team[:4]
            summary = team[4] if len(team) > 4 else None
            if summary is not None:
                free_any, idx_best, summary = self._fetch(
                    (free_any, idx_best, summary), phase="root")
            else:
                free_any, idx_best = self._fetch((free_any, idx_best), phase="root")
            if not bool(free_any.all()):
                status = TrialSuccessStatus.FAIL_NO_SOLUTION
            else:
                root = SearchState(trajs_all, [int(i) for i in idx_best])
                if summary is not None:
                    count, t, a, b, mid = summary
                    root.n_conflicts = int(count)
                    root.first_conflict = (self._mk_conflict(t, a, b, mid)
                                           if count else None)
                    root.summarized = True
                if self.root_repair_rounds > 0:
                    # Free coordination pass: re-select each agent's path
                    # among its ALREADY-SAMPLED 64 candidates to minimize
                    # team conflicts (no re-planning) before re-sampling.
                    root = self._reselect_root(root, free_mask_all)
                for _ in range(self.root_repair_rounds):
                    root, free_mask_all = self._repair_root(root, free_mask_all)
                if self.root_repair_rounds > 0:
                    root = self._reselect_root(root, free_mask_all)
        elif not rg_handled:
            for i in range(self.num_agents):
                partial = SearchState(
                    jnp.stack(path_tiles) if path_tiles else None,
                    root.ix_best[: len(path_tiles)])
                soft_l = (self.create_soft_constraints_from_other_agents_paths(
                    partial, i, n_agents_in_state=len(path_tiles))
                    if self.is_ecbs and path_tiles else [])
                out = self.low_level_planner_l[i](self.start_state_pos_l[i],
                                                  self.goal_state_pos_l[i],
                                                  constraints_l=soft_l)
                if out.trajs_final_free_idxs.shape[0] == 0 and soft_l:
                    # Soft constraints starved the batch of free samples —
                    # degrade to a constraint-free replan for this agent
                    # instead of the reference's whole-trial abort
                    # (cbs.py:326-330); the CT search resolves the conflicts.
                    self._log("Soft-constrained root starved; replanning "
                              f"agent {i} unconstrained.")
                    out = self.low_level_planner_l[i](
                        self.start_state_pos_l[i], self.goal_state_pos_l[i],
                        constraints_l=[])
                if out.trajs_final_free_idxs.shape[0] == 0:
                    self._log("Failed to find valid paths in root CT node.")
                    status = TrialSuccessStatus.FAIL_NO_SOLUTION
                    break
                path_tiles.append(jnp.asarray(out.trajs_final))
                root.ix_best.append(int(out.idx_best_traj))
                if over_limit():
                    status = TrialSuccessStatus.FAIL_RUNTIME_LIMIT
                    break
            if status == TrialSuccessStatus.UNKNOWN:
                root.paths_all = jnp.stack(path_tiles)

        if status == TrialSuccessStatus.UNKNOWN and not rg_handled:
            if not root.summarized or self._densify > 1:
                self._summarize(root)
            self.open_l.append(root)
            state = root

        # ---- search ----------------------------------------------------
        best_seen = state if state.has_paths else None
        while status == TrialSuccessStatus.UNKNOWN:
            # Deadline BEFORE pop/success-check (reference cbs.py:366-389
            # order): a 0-conflict node that materialized past the budget —
            # e.g. in a fused expansion call straddling the deadline — is a
            # near-miss, not a win. The anytime return below still surfaces
            # its paths; only the status is strict.
            if over_limit():
                status = TrialSuccessStatus.FAIL_RUNTIME_LIMIT
                break
            if not self.open_l:
                status = TrialSuccessStatus.FAIL_NO_SOLUTION
                break
            # Fewest-conflicts-first (cbs.py:365; cost-sort alternative noted).
            self.open_l.sort(key=lambda s: s.n_conflicts)
            state = self.open_l.pop(0)
            if best_seen is None or state.n_conflicts < best_seen.n_conflicts:
                best_seen = state
            if state.n_conflicts == 0:
                status = TrialSuccessStatus.SUCCESS
                break
            if (self.repair_period > 0
                    and num_expansions - self._last_repair >= self.repair_period
                    and self._repair_eligible()):
                self._last_repair = num_expansions
                repaired, _ = self._repair_root(state)
                num_expansions += 1  # one batched device call, like a round
                if repaired.n_conflicts < state.n_conflicts:
                    self.open_l.append(repaired)
                    if repaired.n_conflicts < best_seen.n_conflicts:
                        best_seen = repaired
            n_frontier = (self._expand_frontier(state)
                          if self.frontier_width > 1 else 0)
            if n_frontier:
                num_expansions += n_frontier
            elif (n_greedy := self._expand_greedy(state)):
                num_expansions += n_greedy
            else:
                self.expand(state)
                num_expansions += 1

        if anytime and status == TrialSuccessStatus.FAIL_RUNTIME_LIMIT:
            # Anytime return: the least-conflicted node anywhere in the
            # search — popped-and-expanded (best_seen) or still open. The
            # STATUS stays FAIL_RUNTIME_LIMIT even if a 0-conflict node sits
            # in the open list: the reference protocol counts a deadline
            # miss as a failure (reference cbs.py:366-389), and fused
            # expansion calls can land past the deadline — promoting those
            # to SUCCESS would inflate head-to-head success-rate tables.
            # The returned paths/residual still reflect the best near-miss.
            cands = ([best_seen] if best_seen is not None else []) + [
                n for n in self.open_l if n.has_paths]
            if cands:
                state = min(cands, key=lambda s: s.n_conflicts)
        if not state.has_paths:
            return [], num_expansions, status, 0
        best_path_l = global_pad_paths(state.best_paths(), self.start_time_l)
        return best_path_l, num_expansions, status, state.n_conflicts

    # ------------------------------------------------------ greedy search
    GREEDY_ITERS = 8
    # Constraint-buffer sizes for the fused greedy program. Adaptive: the
    # small buffer keeps shallow searches (the common case, incl. the
    # 10-robot bench) on the cheapest compiled variant; deep searches on
    # dense maps (dozens of constraints per agent) pick the large buffer
    # instead of dropping off the fused path entirely.
    GREEDY_KBUFS = (16, 48)

    def _greedy_kbuf(self, state: SearchState) -> Optional[int]:
        """Smallest eligible constraint buffer for this node, or None."""
        from mmd_tpu.parallel.team import _batchable
        from mmd_tpu.planners.single_agent.mpd import MPD

        if not (self.uniform_time and self._densify == 1
                and self.choose_path_strategy == "least_collisions"
                and isinstance(state.first_conflict, PointConflict)):
            return None
        if not all(isinstance(p, MPD) for p in self.low_level_planner_l):
            return None
        if not _batchable(self.low_level_planner_l):
            return None
        max_cons = 0
        for cons_l in state.constraints.values():
            max_cons = max(max_cons, len(cons_l))
            if any(not isinstance(c, MultiPointConstraint) or len(c.q_l) != 1
                   or c.is_soft for c in cons_l):
                return None
        for kbuf in self.GREEDY_KBUFS:
            if max_cons + 1 <= kbuf:
                return kbuf
        return None

    def _root_greedy_eligible(self) -> bool:
        """Gate for the fused root+greedy program: the per-node greedy gate
        evaluated on a constraint-free probe (the root always has empty
        constraint sets and point-typed conflicts), plus no repair rounds
        (repair re-plans between root and search). Delegating to
        `_greedy_kbuf` keeps the two gates — and any test override of the
        greedy path — in lockstep."""
        if self.root_repair_rounds > 0:
            return False
        probe = SearchState(None, [])
        z = np.zeros(2)
        probe.first_conflict = PointConflict(agent_ids=[0, 1], p_l=[z, z],
                                             q_l=[z, z], t_from=0, t_to=0)
        return self._greedy_kbuf(probe) is not None

    def _plan_root_greedy(self):
        """Fused root + summary + greedy descent (fused.root_greedy).

        Returns (root SearchState | None on root failure, accepted
        expansions). With accepted > 0, the root's greedy children are
        already in the open list (`_process_greedy`)."""
        from mmd_tpu.models.diffusion import HardConds
        from mmd_tpu.planners.multi_agent.fused import root_greedy

        planners = self.low_level_planner_l
        p0 = planners[0]
        k_iters = self.GREEDY_ITERS
        if self._hard_all is None:
            self._hard_all = HardConds(
                mask=p0.hard_conds.mask,
                values=jnp.stack([p.hard_conds.values for p in planners]))
        hard_all = self._hard_all
        keys_root = self._team_keys(self.num_agents)
        if self.mesh is not None:
            from mmd_tpu.parallel.team import shard_team_inputs
            hard_all, keys_root = shard_team_inputs(self.mesh, hard_all,
                                                    keys_root)
        keys_greedy = self._team_keys(2 * k_iters).reshape(k_iters, 2, 2)
        base_cset, _ = p0._pack(None)

        team_out, summary, outs = root_greedy(
            p0.model.apply, p0.params, p0.schedule, hard_all, base_cset,
            keys_root, keys_greedy, p0.cfg, p0.guide_cfg, p0.task.scene,
            p0.dataset.normalizer, p0.robot.radius, p0.robot.q_min,
            p0.robot.q_max, p0._savgol, self.margin,
            default_params.vertex_constraint_radius,
            default_params.weight_grad_cost_constraints,
            default_params.vertex_constraint_radius,
            default_params.weight_grad_cost_soft_constraints,
            kbuf=self.GREEDY_KBUFS[0], use_soft=self.is_ecbs,
            local=self.is_xcbs,
            n_noise=default_params.n_local_inference_noising_steps,
            n_denoise=default_params.n_local_inference_denoising_steps,
            k_iters=k_iters, sequential_root=self.is_ecbs)
        trajs_all = team_out[0]                       # stays on device
        free_any, idx_best, summary, scalars = self._fetch(
            (team_out[1], team_out[2], summary, outs[1:]), phase="root")
        if not bool(np.asarray(free_any).all()):
            return None, 0
        root = SearchState(trajs_all, [int(i) for i in idx_best])
        count, t, a, b, mid = summary
        root.n_conflicts = int(count)
        root.first_conflict = (self._mk_conflict(t, a, b, mid)
                               if count else None)
        root.summarized = True
        if root.n_conflicts == 0:
            return root, 0
        return root, self._process_greedy(root, outs[0], scalars)

    def _expand_greedy(self, state: SearchState) -> int:
        """k speculative best-first expansions in ONE device call
        (fused.greedy_expand), validated against the open list.

        The device program greedily descends into the less-conflicted child
        each iteration; a recorded step is accepted only while the popped
        node really was the global best (strictly fewer conflicts than every
        open node), so the search explores exactly the nodes host-driven
        CBS would. Returns the number of accepted expansions (0 = caller
        falls back to the one-node expansion path)."""
        K = self._greedy_kbuf(state)
        if K is None:
            return 0
        from mmd_tpu.models.diffusion import HardConds
        from mmd_tpu.planners.multi_agent.fused import greedy_expand

        planners = self.low_level_planner_l
        p0 = planners[0]
        A = self.num_agents
        k_iters = self.GREEDY_ITERS
        H_all = state.paths_all.shape[2]

        cons_q = np.zeros((A, K, 2), np.float32)
        cons_t = np.zeros((A, K, 2), np.float32)
        cons_n = np.zeros((A,), np.int32)
        for agent_id, cons_l in state.constraints.items():
            for k, c in enumerate(cons_l):
                cons_q[agent_id, k] = np.asarray(c.q_l[0], np.float32)[:2]
                cons_t[agent_id, k] = c.t_range_l[0]
            cons_n[agent_id] = len(cons_l)

        if self._hard_all is None:
            self._hard_all = HardConds(
                mask=p0.hard_conds.mask,
                values=jnp.stack([p.hard_conds.values for p in planners]))
        fc = state.first_conflict
        conflict0 = (jnp.asarray(state.n_conflicts, jnp.int32),
                     jnp.asarray(fc.t_from, jnp.int32),
                     jnp.asarray(fc.agent_ids[0], jnp.int32),
                     jnp.asarray(fc.agent_ids[1], jnp.int32),
                     jnp.asarray(fc.q_l[0], jnp.float32)[:2])
        keys = self._team_keys(2 * k_iters).reshape(k_iters, 2, 2)

        outs = greedy_expand(
            p0.model.apply, p0.params, p0.schedule, self._hard_all, keys,
            p0.cfg, p0.guide_cfg, p0.task.scene, p0.dataset.normalizer,
            p0.robot.radius, p0.robot.q_min, p0.robot.q_max, p0._savgol,
            state.paths_all, jnp.asarray(state.ix_best, jnp.int32),
            jnp.asarray(cons_q), jnp.asarray(cons_t), jnp.asarray(cons_n),
            conflict0, self.margin,
            default_params.vertex_constraint_radius,
            default_params.weight_grad_cost_constraints,
            default_params.vertex_constraint_radius,
            default_params.weight_grad_cost_soft_constraints,
            use_soft=self.is_ecbs, local=self.is_xcbs,
            n_noise=default_params.n_local_inference_noising_steps,
            n_denoise=default_params.n_local_inference_denoising_steps,
            k_iters=k_iters)
        trajs = outs[0]  # stays on device: (k, 2, B, H, D)
        return self._process_greedy(state, trajs,
                                    self._fetch(outs[1:], phase="greedy"))

    def _process_greedy(self, state: SearchState, trajs,
                        scalars, validate: bool = True) -> int:
        """Validate one fused greedy run's records against the open list and
        materialize the accepted expansions (shared by `_expand_greedy`,
        the fused root+greedy path, and — with validate=False — the
        parallel-descent frontier, whose throughput mode accepts the whole
        speculative chain instead of stopping when an open node ties it)."""
        (agents_k, free_k, ix_k, counts_k, t_k, a_k, b_k, mid_k, chosen_k,
         valid_k) = scalars
        k_iters = len(valid_k)
        H_all = state.paths_all.shape[2]

        accepted = 0
        parent = state
        for s in range(k_iters):
            if not valid_k[s]:
                # Speculation stopped (device froze on overflow/solved); the
                # current greedy node is unexpanded — return it to the open
                # list for the host-driven paths.
                if self.greedy_audit is not None:
                    self.greedy_audit.append(("freeze",))
                if parent is not state:
                    self.open_l.append(parent)
                break
            if self.greedy_audit is not None:
                # Best-first invariant record: the node expanded this step
                # must not be beaten by any node waiting in the open list.
                self.greedy_audit.append((
                    "step", parent.n_conflicts,
                    min((n.n_conflicts for n in self.open_l), default=None)))
            t_pad = 2
            lo = int(np.clip(parent.first_conflict.t_from - t_pad, 0, H_all - 1))
            hi = int(np.clip(parent.first_conflict.t_to + t_pad, 0, H_all - 1))
            mid = np.asarray(parent.first_conflict.q_l[0], np.float32)[:2]

            children = []
            for idx in range(2):
                agent = int(agents_k[s, idx])
                if not bool(free_k[s, idx]):
                    self._log("Failed to find valid path in CT node.")
                    children.append(None)
                    continue
                child = parent.get_copy()
                child.add_constraint(agent, MultiPointConstraint(
                    q_l=[mid], t_range_l=[(lo, hi)],
                    radius_l=[default_params.vertex_constraint_radius]))
                child.add_path_update(agent, (trajs, (s, idx)))
                child.ix_best[agent] = int(ix_k[s, idx])
                child.n_conflicts = int(counts_k[s, idx])
                child.first_conflict = (
                    self._mk_conflict(t_k[s, idx], a_k[s, idx], b_k[s, idx],
                                      mid_k[s, idx])
                    if counts_k[s, idx] else None)
                children.append(child)

            accepted += 1
            j = int(chosen_k[s])
            chosen = children[j]
            if chosen is None:
                if self.greedy_audit is not None:
                    self.greedy_audit.append(("starved",))
                # Both children starved (the device carry froze here too).
                # Under ECBS the likely cause is soft-constraint starvation:
                # re-expand this node through the batched path, whose
                # hard-only retry recovers the children. Otherwise both are
                # skipped (reference cbs.py:433-435).
                if self.is_ecbs:
                    # (the greedy iteration's count stands in for this
                    # expand() call's expansion)
                    self.expand(parent)
                else:
                    for c in children:
                        if c is not None:
                            self.open_l.append(c)
                break
            other = children[1 - j]
            # Greedy continuation stays best-first as long as the chosen
            # child is A minimum of the open list (<=): fewest-conflicts-
            # first only requires popping *some* min-conflict node; the
            # host sort's insertion-order tie-break is an artifact, not a
            # semantic (reference cbs.py:365 sorts on the count alone).
            min_open = min(
                [n.n_conflicts for n in self.open_l]
                + ([other.n_conflicts] if other is not None else []),
                default=None)
            if chosen.n_conflicts == 0 or (
                    validate and min_open is not None
                    and chosen.n_conflicts > min_open):
                if self.greedy_audit is not None:
                    self.greedy_audit.append(
                        ("stop", chosen.n_conflicts, min_open))
                # Stop descending: re-insert both children in expansion
                # order so tie-breaking matches the host-driven search.
                for c in children:
                    if c is not None:
                        self.open_l.append(c)
                break
            if other is not None:
                self.open_l.append(other)
            parent = chosen
        else:
            # All k iterations accepted; the final chosen node returns to
            # the open list for the next round.
            if parent is not state:
                self.open_l.append(parent)
        return accepted

    def _expand_frontier(self, state: SearchState) -> int:
        """Run k-step speculative greedy descents from `state` plus up to
        frontier_width-1 more open nodes in ONE device call
        (fused.frontier_greedy_expand). Returns the number of accepted
        expansions (0 = not applicable; caller falls back to greedy/expand).

        Depth x breadth: the single-expansion frontier variant measurably
        lost to the plain greedy descent on dense instances (Conveyor vd,
        20 agents, 60 s protocol: 0/10 at width 4 vs 3/10 greedy-only —
        near-tied siblings soaked the budget one level deep), so throughput
        mode now runs M parallel DESCENTS. Soundness: each accepted step is
        its parent's exact single-node expansion (same constraint
        accumulation, least-collisions selection, conflict summary) and
        every child enters the open list — only the best-first expansion
        ORDER is relaxed (validate=False in _process_greedy), which is the
        documented semantics of frontier_width > 1. Under ECBS a node with
        a soft-starved child falls back to the batched expansion path,
        whose hard-only retry recovers it."""
        if len(self.open_l) == 0:
            return 0
        K0 = self._greedy_kbuf(state)
        if K0 is None:
            return 0
        from mmd_tpu.models.diffusion import HardConds
        from mmd_tpu.planners.multi_agent.fused import frontier_greedy_expand

        # Gather the top-M eligible nodes (open_l is already sorted; every
        # open node has > 0 conflicts here, since the popped `state` was the
        # minimum and had > 0).
        nodes = [(state, K0)]
        rest = []
        for n in self.open_l:
            if len(nodes) >= self.frontier_width:
                rest.append(n)
                continue
            Kn = self._greedy_kbuf(n)
            if Kn is None:
                rest.append(n)
            else:
                nodes.append((n, Kn))
        # M is a compiled shape: bucket to powers of two so a search compiles
        # at most log2(width) frontier variants (the persistent cache then
        # covers every later trial). A non-power-of-two frontier_width runs
        # as the next LOWER power (warned once at construction).
        M = 1
        while M * 2 <= len(nodes):
            M *= 2
        if M < 2:
            return 0  # nothing to batch; greedy descent handles one node
        rest = [n for n, _ in nodes[M:]] + rest
        nodes = nodes[:M]
        self.open_l = rest
        # The buffer size is a compiled shape too: size it over the RETAINED
        # nodes only, so a node trimmed into `rest` can't force the large
        # 48-row variant when all M kept nodes fit the 16-row one.
        kbuf = max(k for _, k in nodes)
        nodes = [n for n, _ in nodes]

        planners = self.low_level_planner_l
        p0 = planners[0]
        A = self.num_agents
        H_all = state.paths_all.shape[2]
        if self._hard_all is None:
            self._hard_all = HardConds(
                mask=p0.hard_conds.mask,
                values=jnp.stack([p.hard_conds.values for p in planners]))

        cons_q = np.zeros((M, A, kbuf, 2), np.float32)
        cons_t = np.zeros((M, A, kbuf, 2), np.float32)
        cons_n = np.zeros((M, A), np.int32)
        cflt = np.zeros((M, 5), np.float32)  # count, t, a, b + mid packed below
        mid_m = np.zeros((M, 2), np.float32)
        for m, node in enumerate(nodes):
            for agent_id, cons_l in node.constraints.items():
                for k, c in enumerate(cons_l):
                    cons_q[m, agent_id, k] = np.asarray(c.q_l[0], np.float32)[:2]
                    cons_t[m, agent_id, k] = c.t_range_l[0]
                cons_n[m, agent_id] = len(cons_l)
            fc = node.first_conflict
            cflt[m, :4] = (node.n_conflicts, fc.t_from, fc.agent_ids[0],
                           fc.agent_ids[1])
            mid_m[m] = np.asarray(fc.q_l[0], np.float32)[:2]
        conflict_m = (jnp.asarray(cflt[:, 0], jnp.int32),
                      jnp.asarray(cflt[:, 1], jnp.int32),
                      jnp.asarray(cflt[:, 2], jnp.int32),
                      jnp.asarray(cflt[:, 3], jnp.int32),
                      jnp.asarray(mid_m))
        k_iters = self.GREEDY_ITERS
        keys = self._team_keys(M * 2 * k_iters).reshape(M, k_iters, 2, 2)
        paths_m = jnp.stack([n.paths_all for n in nodes])
        ix_m = jnp.asarray([n.ix_best for n in nodes], jnp.int32)

        out = frontier_greedy_expand(
            p0.model.apply, p0.params, p0.schedule, self._hard_all, keys,
            p0.cfg, p0.guide_cfg, p0.task.scene, p0.dataset.normalizer,
            p0.robot.radius, p0.robot.q_min, p0.robot.q_max, p0._savgol,
            paths_m, ix_m, jnp.asarray(cons_q), jnp.asarray(cons_t),
            jnp.asarray(cons_n), conflict_m, self.margin,
            default_params.vertex_constraint_radius,
            default_params.weight_grad_cost_constraints,
            default_params.vertex_constraint_radius,
            default_params.weight_grad_cost_soft_constraints,
            use_soft=self.is_ecbs, local=self.is_xcbs,
            n_noise=default_params.n_local_inference_noising_steps,
            n_denoise=default_params.n_local_inference_denoising_steps,
            k_iters=k_iters)
        trajs_m = out[0]                        # (M, k, 2, B, H, D), device
        scalars_m = self._fetch(out[1:], phase="frontier")

        accepted = 0
        for m, node in enumerate(nodes):
            acc = self._process_greedy(
                node, trajs_m[m],
                tuple(np.asarray(x[m]) for x in scalars_m), validate=False)
            if acc == 0:
                # Chain froze immediately (soft-starved children or a
                # constraint-buffer overflow): recover through the batched
                # expansion path, exactly as _expand_greedy's caller does.
                self.expand(node)
                accepted += 1
            else:
                accepted += acc
        return accepted

    def _expand_children_batched(self, state: SearchState, constraints,
                                 H_all: int) -> bool:
        """All children of a conflict in one vmapped device call, for every
        CBS variant (fresh/local x with/without ECBS soft constraints).

        Requires uniform start times, least-collisions selection, and MPD
        planners sharing one model. Children with different constraint
        counts pad to a COMMON (K, P) bucket; ECBS soft constraints are
        built in-graph from the team's current best paths (no host packing).
        Returns True when handled."""
        from mmd_tpu.costs.constraints import pack_constraint_set
        from mmd_tpu.parallel.team import _batchable
        from mmd_tpu.planners.single_agent.mpd import (
            K_BUCKETS, MPD, P_BUCKETS, _bucket)

        if not (self.uniform_time and len(constraints) >= 1
                and self.choose_path_strategy == "least_collisions"):
            return False
        agent_ids = list(constraints.keys())
        planners = [self.low_level_planner_l[a] for a in agent_ids]
        p0 = planners[0]
        if not all(isinstance(p, MPD) for p in planners) or not _batchable(planners):
            return False

        children, hard_lists = [], []
        for agent_id in agent_ids:
            constraint = constraints[agent_id].shifted(
                -self.start_time_l[agent_id], 0, H_all - 1)
            child = state.get_copy()
            child.add_constraint(agent_id, constraint)
            children.append(child)
            hard_lists.append(_plannable(child.constraints[agent_id]))
        try:
            K = max(_bucket(len(hl), K_BUCKETS) for hl in hard_lists)
            P = max(_bucket(max(len(c.q_l) for c in hl), P_BUCKETS)
                    for hl in hard_lists)
        except ValueError:
            return False  # exceeds the largest bucket; generic path

        from mmd_tpu.models.diffusion import HardConds
        from mmd_tpu.planners.multi_agent.fused import expand_children

        cset_c = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[pack_constraint_set(hl, K, P) for hl in hard_lists])
        hard_c = HardConds(
            mask=planners[0].hard_conds.mask,
            values=jnp.stack([p.hard_conds.values for p in planners]))
        keys = self._team_keys(len(agent_ids))

        def run_children(use_soft, keys_):
            return expand_children(
                p0.model.apply, p0.params, p0.schedule, hard_c, cset_c, keys_,
                p0.cfg, p0.guide_cfg, p0.task.scene, p0.dataset.normalizer,
                p0.robot.radius, p0.robot.q_min, p0.robot.q_max, p0._savgol,
                state.paths_all, jnp.asarray(state.ix_best),
                jnp.asarray(agent_ids), self.margin,
                default_params.vertex_constraint_radius,
                default_params.weight_grad_cost_soft_constraints,
                use_soft=use_soft, local=self.is_xcbs,
                n_noise=default_params.n_local_inference_noising_steps,
                n_denoise=default_params.n_local_inference_denoising_steps)

        trajs, scalars = run_children(self.is_ecbs, keys)
        any_free, ix, count, t, a, b, mid = (
            np.array(x) for x in self._fetch(scalars, phase="children"))
        if self.is_ecbs and not all(bool(f) for f in any_free):
            # Soft-starved children: one more vmapped call with the soft
            # constraints dropped replaces every starved child (the hard CT
            # constraints are kept — see the plan() root fallback rationale).
            trajs2, scalars2 = run_children(False, self._team_keys(len(agent_ids)))
            any_free2, ix2, count2, t2, a2, b2, mid2 = self._fetch(scalars2,
                                                                   phase="children")
            for i in range(len(agent_ids)):
                if not bool(any_free[i]):
                    any_free[i], ix[i], count[i] = any_free2[i], ix2[i], count2[i]
                    t[i], a[i], b[i], mid[i] = t2[i], a2[i], b2[i], mid2[i]
                    trajs = trajs.at[i].set(trajs2[i])
        for i, agent_id in enumerate(agent_ids):
            if not bool(any_free[i]):
                self._log("Failed to find valid path in CT node.")
                continue
            child = children[i]
            child.add_path_update(agent_id, (trajs, (i,)))
            child.ix_best[agent_id] = int(ix[i])
            child.n_conflicts = int(count[i])
            child.first_conflict = (self._mk_conflict(t[i], a[i], b[i], mid[i])
                                    if count[i] else None)
            self.open_l.append(child)
        return True

    # ------------------------------------------------------------- repair
    def _repair_eligible(self) -> bool:
        """Mid-search Jacobi repair needs the batched fresh-team program:
        uniform start times and batch-compatible MPD planners."""
        from mmd_tpu.parallel.team import _batchable
        from mmd_tpu.planners.single_agent.mpd import MPD

        return (self.uniform_time
                and all(isinstance(p, MPD) for p in self.low_level_planner_l)
                and _batchable(self.low_level_planner_l))

    def _reselect_root(self, root: SearchState, free_all: jax.Array,
                       sweeps: int = 2) -> SearchState:
        """Jacobi re-selection among existing candidate batches: each agent
        picks its least-conflicts FREE candidate vs the others' current best;
        accepted per sweep only when the team's total conflict count strictly
        decreases. ONE device call (conflict_detection.team_reselect)."""
        from mmd_tpu.planners.multi_agent.conflict_detection import team_reselect

        ix, count, t, a, b, mid = self._fetch(team_reselect(
            root.paths_all[..., :2], jnp.asarray(root.ix_best), free_all,
            self.margin, sweeps=sweeps), phase="repair")
        state = SearchState(root.paths_all, [int(i) for i in ix],
                            root.constraints)
        state.n_conflicts = int(count)
        state.first_conflict = (self._mk_conflict(t, a, b, mid)
                                if count else None)
        state.summarized = True
        return state

    def _repair_root(self, root: SearchState,
                     free_all: Optional[jax.Array] = None):
        """One Jacobi repair round: every agent re-plans in parallel under
        soft constraints from the others' current best paths, then selects
        its least-conflicts free candidate vs those paths.

        Returns (state, free_all) with free masks tracking whichever batch
        (old or repaired) each agent's row ended up holding."""
        from mmd_tpu.parallel.team import (
            plan_fresh_team_soft_device,
            stack_hard_conds,
            team_soft_paths,
        )

        planners = self.low_level_planner_l
        p0 = planners[0]
        prev_pos = _best_paths_pos(root.paths_all, jnp.asarray(root.ix_best))
        soft_team = team_soft_paths(np.asarray(prev_pos),
                                    default_params.vertex_constraint_radius)
        hard_team = stack_hard_conds([p.hard_conds for p in planners])
        keys = self._team_keys(self.num_agents)
        if self.mesh is not None:
            from mmd_tpu.parallel.team import shard_team_inputs
            hard_team, keys = shard_team_inputs(self.mesh, hard_team, keys)
            from mmd_tpu.parallel.sharding import shard_leading_axis
            soft_team = shard_leading_axis(soft_team, self.mesh, "agent")
        res = plan_fresh_team_soft_device(p0, hard_team, soft_team, keys)
        # Fused: per-agent selection + accept-if-improved damping + global
        # monotonicity + conflict summary, one device call
        # (conflict_detection.repair_accept).
        from mmd_tpu.planners.multi_agent.conflict_detection import repair_accept

        accept, ix, count, t, a, b, mid = self._fetch(repair_accept(
            res.trajs_final[..., :2], res.free_mask, prev_pos, self.margin),
            phase="repair")
        if free_all is None:
            free_all = jnp.ones(root.paths_all.shape[:2], bool)
        new_paths = jnp.where(jnp.asarray(accept)[:, None, None, None],
                              res.trajs_final, root.paths_all)
        new_ix = [int(ix[i]) if accept[i] else root.ix_best[i]
                  for i in range(self.num_agents)]
        state = SearchState(new_paths, new_ix, root.constraints)
        state.n_conflicts = int(count)
        state.first_conflict = (self._mk_conflict(t, a, b, mid)
                                if count else None)
        state.summarized = True
        new_free = jnp.where(jnp.asarray(accept)[:, None], res.free_mask,
                             free_all)
        return state, new_free

    # -------------------------------------------------------------- expand
    def expand(self, state: SearchState):
        """reference: cbs.py:390-466. One fused device call for both
        children when possible, else two calls per child."""
        conflict = state.first_conflict
        constraints = convert_conflicts_to_constraints(conflict)
        H_all = state.paths_all.shape[2]

        # The fused paths summarize conflicts at densification 1; with edge
        # conflicts enabled, take the generic path and re-summarize densified.
        if self._densify == 1 and self._expand_children_batched(
                state, constraints, H_all):
            return

        for agent_id, constraint in constraints.items():
            constraint = constraint.shifted(-self.start_time_l[agent_id], 0,
                                            H_all - 1)
            new_state = state.get_copy()
            new_state.add_constraint(agent_id, constraint)
            planner = self.low_level_planner_l[agent_id]
            from mmd_tpu.planners.single_agent.mpd_ensemble import MPDEnsemble
            fused_ensemble = (self._densify == 1
                              and isinstance(planner, MPDEnsemble)
                              and self.choose_path_strategy == "least_collisions")
            agent_constraint_l = _plannable(new_state.constraints[agent_id])
            if self.is_ecbs and not fused_ensemble:
                # The fused ensemble path builds ECBS soft constraints
                # IN-GRAPH; the host build is only for the generic paths.
                agent_constraint_l.extend(
                    self.create_soft_constraints_from_other_agents_paths(
                        new_state, agent_id))

            from mmd_tpu.planners.single_agent.mpd import MPD
            if (self.uniform_time and self._densify == 1
                    and isinstance(planner, MPD)
                    and self.choose_path_strategy == "least_collisions"):
                # Fully-fused expansion: plan + select + conflict summary +
                # team update in ONE device call (fused.py).
                from mmd_tpu.planners.multi_agent.fused import (
                    expand_fresh, expand_local)

                def run_once(cons_l):
                    gd = planner._guide_data(*planner._pack(cons_l))
                    common = (planner.model.apply, planner.params,
                              planner.schedule, planner.hard_conds, gd,
                              planner._next_key(), planner.cfg,
                              planner.guide_cfg, planner.task.scene,
                              planner.robot.radius, planner.robot.q_min,
                              planner.robot.q_max, planner._savgol,
                              new_state.paths_all,
                              jnp.asarray(new_state.ix_best),
                              agent_id, self.margin)
                    if self.is_xcbs:
                        return expand_local(
                            *common,
                            n_noise=default_params.n_local_inference_noising_steps,
                            n_denoise=default_params.n_local_inference_denoising_steps)
                    return expand_fresh(*common)

                new_paths, scalars = run_once(agent_constraint_l)
                any_free, ix, count, t, a, b, mid = self._fetch(scalars,
                                                                phase="expand")
                if not bool(any_free) and self.is_ecbs:
                    # Soft constraints starved the batch: retry with the
                    # hard CT constraints only (see plan() root fallback).
                    hard_only = _plannable(new_state.constraints[agent_id])
                    new_paths, scalars = run_once(hard_only)
                    any_free, ix, count, t, a, b, mid = self._fetch(scalars,
                                                                phase="expand")
                if not bool(any_free):
                    self._log("Failed to find valid path in CT node.")
                    continue
                new_state.paths_all = new_paths
                new_state.ix_best[agent_id] = int(ix)
                new_state.n_conflicts = int(count)
                new_state.first_conflict = (self._mk_conflict(t, a, b, mid)
                                            if count else None)
                self.open_l.append(new_state)
                continue

            if fused_ensemble:
                # Fused multi-tile expansion: ensemble plan + stagger pad +
                # select + summary + team update in ONE device call
                # (fused.expand_child_ensemble). ECBS soft constraints are
                # built in-graph, so only the HARD constraints route here.
                from mmd_tpu.planners.multi_agent.fused import (
                    expand_child_ensemble)
                gds = planner._guide_data(
                    *planner._route_constraints(agent_constraint_l))
                L = state.paths_all.shape[2]
                T_out = max(self.start_time_l) + L

                def run_once_ens(use_soft):
                    return expand_child_ensemble(
                        planner.model.apply, planner.stacked_params,
                        planner.schedule, planner.hard_conds, planner.cc, gds,
                        planner._next_key(), planner.cfg, planner.guide_cfg,
                        jnp.asarray(planner.transforms),
                        planner.task.stacked_scenes, planner.robot.radius,
                        planner.robot.q_min, planner.robot.q_max,
                        planner._savgol, new_state.paths_all,
                        jnp.asarray(new_state.ix_best, jnp.int32), agent_id,
                        jnp.asarray(self.start_time_l, jnp.int32), self.margin,
                        jnp.asarray(default_params.vertex_constraint_radius),
                        jnp.asarray(default_params.weight_grad_cost_soft_constraints),
                        n_tiles=planner.n_tiles, use_soft=use_soft,
                        local=self.is_xcbs,
                        n_noise=default_params.n_local_inference_noising_steps,
                        n_denoise=default_params.n_local_inference_denoising_steps,
                        T_out=T_out)

                new_paths, scalars = run_once_ens(self.is_ecbs)
                any_free, ix, count, t, a, b, mid = self._fetch(scalars,
                                                                phase="expand")
                if not bool(any_free) and self.is_ecbs:
                    # Soft-starved batch: retry hard-constraints-only.
                    new_paths, scalars = run_once_ens(False)
                    any_free, ix, count, t, a, b, mid = self._fetch(scalars,
                                                                phase="expand")
                if not bool(any_free):
                    self._log("Failed to find valid path in CT node.")
                    continue
                new_state.paths_all = new_paths
                new_state.ix_best[agent_id] = int(ix)
                new_state.n_conflicts = int(count)
                new_state.first_conflict = (self._mk_conflict(t, a, b, mid)
                                            if count else None)
                self.open_l.append(new_state)
                continue

            experience = (PathBatchExperience(new_state.paths_all[agent_id])
                          if self.is_xcbs else None)
            res = planner._run(agent_constraint_l, experience)  # device call 1
            if self.is_ecbs and not bool(jnp.any(res.free_mask)):
                # Soft-starved batch: retry hard-constraints-only.
                res = planner._run(
                    _plannable(new_state.constraints[agent_id]), experience)

            best = global_pad_paths(new_state.best_paths(), self.start_time_l)
            max_t = best[0].shape[0]
            others_pos = jnp.asarray(np.stack([p[:, :2] for p in best]))
            cand_pos = jnp.asarray(self._pad_pos(
                np.asarray(res.trajs_final[..., :2]), agent_id, max_t))

            if self.choose_path_strategy == "least_cost":
                # Reference alternative (cbs.py:436-441): keep the planner's
                # least-cost best, then summarize conflicts for that choice.
                ix, any_free = self._fetch((res.idx_best,
                                            jnp.any(res.free_mask)),
                                           phase="expand")
                if not bool(any_free):
                    self._log("Failed to find valid path in CT node.")
                    continue
                chosen = others_pos.at[agent_id].set(cand_pos[int(ix)])
                count, t, a, b, mid = self._fetch(
                    team_conflict_summary(chosen, self.margin),
                    phase="expand")
            else:
                ix, count, t, a, b, mid, any_free = self._fetch(  # call 2
                    (*select_candidate_and_conflicts(
                        cand_pos, res.free_mask, agent_id, others_pos,
                        self.margin),
                     jnp.any(res.free_mask)), phase="expand")
                if not bool(any_free):
                    self._log("Failed to find valid path in CT node.")
                    continue  # skip this child (cbs.py:433-435)

            new_state.paths_all = new_state.paths_all.at[agent_id].set(res.trajs_final)
            new_state.ix_best[agent_id] = int(ix)
            if self._densify > 1:
                # Selection ran at densification 1 (a heuristic); the node's
                # recorded conflicts must use the densified detector.
                self._summarize(new_state)
            else:
                new_state.n_conflicts = int(count)
                new_state.first_conflict = (self._mk_conflict(t, a, b, mid)
                                            if count else None)
            self.open_l.append(new_state)
