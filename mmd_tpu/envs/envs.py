"""The five 2D planning environments, TPU-native.

Geometry mirrors the reference maps exactly (all workspaces are [-1, 1]^2):
- EnvEmpty2D / EnvEmptyNoWait2D: no obstacles
  (reference: env_empty_2d.py, env_empty_nowait_2d.py:15)
- EnvConveyor2D: 3 boxes forming two one-way corridors (env_conveyor_2d.py:47-67)
- EnvHighways2D: 9 boxes forming a ring road (env_highways_2d.py:46-77)
- EnvDropRegion2D: 4 boxes 0.4x0.4 at (+-0.4, +-0.4) + 16 drop-region centers
  (env_drop_region_2d.py:62-95)

Design difference from the reference: every env precomputes a `GridSDF`
(even the empty one, whose grid is a constant BIG with zero gradient), so the
scene handed to the jitted guided sampler is a fixed-shape pytree
(`SceneData`) and one compiled program serves every map and every tile.
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass

from mmd_tpu.envs.primitives import BIG, BoxField, SphereField, union_sdf
from mmd_tpu.envs.grid_sdf import GridSDF, build_grid_sdf, grid_sdf


@pytree_dataclass
class SceneData:
    """Fixed-shape scene pytree consumed by jitted cost/guide functions.

    `extra_grid` carries the env's *extra objects* (the reference's
    `obj_extra_list` / `use_extra_objects` mechanism, env_base.py:76-89,
    tasks.py:60-72). Every released environment ships with EMPTY extra
    lists (e.g. env_empty_2d_extra_objects.py:16-37), so by default it is a
    constant-free grid; keeping it in the pytree keeps one compiled program
    for both modes.
    """

    grid: GridSDF
    extra_grid: GridSDF
    ws_min: jax.Array  # (2,) workspace bounds for the boundary field
    ws_max: jax.Array


class Env2D:
    """Host-side environment object: geometry + skills + adherence.

    The device-facing state is `self.scene` (a SceneData pytree); everything
    else (skills, adherence, data-gen params) runs on host per trial.
    """

    name = "Env2D"

    def __init__(self, boxes: Optional[np.ndarray] = None,
                 box_sizes: Optional[np.ndarray] = None,
                 sdf_cell_size: float = 0.005,
                 grid_shape: Optional[tuple] = None,
                 extra_boxes: Optional[np.ndarray] = None,
                 extra_box_sizes: Optional[np.ndarray] = None):
        self.limits = np.array([[-1.0, -1.0], [1.0, 1.0]], np.float32)
        self.box_field = self._make_box_field(boxes, box_sizes)
        # Extra objects (reference obj_extra_list; EMPTY in every released
        # env, the mechanism is kept for the use_extra_objects mode).
        self.extra_box_field = self._make_box_field(extra_boxes, extra_box_sizes)
        self.sdf_cell_size = sdf_cell_size
        self.grid = self._build_grid(self.box_field, grid_shape)
        self.extra_grid = self._build_grid(self.extra_box_field, grid_shape)
        self.scene = SceneData(
            grid=self.grid,
            extra_grid=self.extra_grid,
            ws_min=jnp.asarray(self.limits[0]),
            ws_max=jnp.asarray(self.limits[1]),
        )

    @staticmethod
    def _make_box_field(boxes, sizes) -> BoxField:
        if boxes is None or len(boxes) == 0:
            return BoxField(centers=jnp.zeros((0, 2)), half_sizes=jnp.zeros((0, 2)))
        return BoxField(centers=jnp.asarray(boxes, jnp.float32),
                        half_sizes=jnp.asarray(sizes, jnp.float32) / 2.0)

    # ----------------------------------------------------------------- grid
    def _build_grid(self, field: BoxField, grid_shape=None) -> GridSDF:
        lo, hi = self.limits[0], self.limits[1]
        if field.centers.shape[0] == 0:
            # Empty map: constant-BIG grid, zero gradient. Same shape as the
            # obstacle grids so one compiled sampler serves all envs.
            n = grid_shape or tuple(int(np.ceil((hi[d] - lo[d]) / self.sdf_cell_size)) for d in range(2))
            return GridSDF(
                lower=jnp.asarray(lo), upper=jnp.asarray(hi),
                values=jnp.full(n, BIG, jnp.float32),
                grads=jnp.zeros((*n, 2), jnp.float32),
            )
        return build_grid_sdf(lambda p: union_sdf([field], p), lo, hi,
                              self.sdf_cell_size)

    # ------------------------------------------------------------------ sdf
    def compute_sdf(self, x: jax.Array) -> jax.Array:
        """Grid-backed SDF query (reference: env_base.compute_sdf :152-168)."""
        return grid_sdf(self.grid, x)

    def compute_sdf_exact(self, x: jax.Array) -> jax.Array:
        """Analytic primitive SDF (used to build the grid; tests compare)."""
        return union_sdf([self.box_field], x)

    # --------------------------------------------------------------- skills
    def get_skill_pos_seq_l(self, start_pos=None, goal_pos=None,
                            rng: Optional[np.random.Generator] = None) -> Optional[List[np.ndarray]]:
        """Env-specific 'skill' waypoint sequences for data generation."""
        return None

    # ------------------------------------------------------------ adherence
    def compute_traj_data_adherence(self, path: np.ndarray) -> float:
        """Per-env behavioral adherence metric on a (H, >=2) path."""
        return float("-inf")

    def is_start_goal_valid_for_data_gen(self, start_pos, goal_pos) -> bool:
        return True

    def __repr__(self):
        return f"{self.name}(boxes={self.box_field.centers.shape[0]})"


class EnvEmpty2D(Env2D):
    """reference: env_empty_2d.py (no obstacles)."""

    name = "EnvEmpty2D"

    def __init__(self, **kw):
        super().__init__(boxes=None, **kw)

    def compute_traj_data_adherence(self, path: np.ndarray,
                                    fraction_of_length: float = 0.1) -> float:
        # Deviation of path from the straight start->goal line
        # (reference: env_empty_2d.py:132-146).
        p = np.asarray(path)[:, :2]
        start, goal = p[0], p[-1]
        length = np.linalg.norm(goal - start)
        if length < 1e-9:
            return 1.0
        d = goal - start
        rel = p - start
        cross = np.abs(d[0] * rel[:, 1] - d[1] * rel[:, 0])
        deviation = cross / length
        return float((deviation < fraction_of_length * length).mean())


class EnvEmptyNoWait2D(EnvEmpty2D):
    """reference: env_empty_nowait_2d.py:15 (same geometry, no wait skills;
    exists as a distinct model id for training data without dwell skills)."""

    name = "EnvEmptyNoWait2D"


class EnvConveyor2D(Env2D):
    """reference: env_conveyor_2d.py:47-67."""

    name = "EnvConveyor2D"
    _BOXES = np.array([[0.0, 0.0], [0.0, 0.35], [0.0, -0.35]], np.float32)
    _SIZES = np.array([[0.8, 0.1], [1.0, 0.1], [1.0, 0.1]], np.float32)

    def __init__(self, **kw):
        super().__init__(boxes=self._BOXES, box_sizes=self._SIZES, **kw)

    def get_skill_pos_seq_l(self, start_pos=None, goal_pos=None, rng=None):
        # Two corridor traversal skills (reference: env_conveyor_2d.py:143-159):
        # bottom corridor left->right at y=-0.2, top corridor right->left at
        # y=+0.2, each 30 lerped waypoints.
        def lerp_seq(a, b, n=30):
            alphas = np.linspace(0.0, 1.0, n, dtype=np.float32)[:, None]
            return (1 - alphas) * np.asarray(a, np.float32) + alphas * np.asarray(b, np.float32)

        return [lerp_seq([-0.6, -0.2], [0.6, -0.2]), lerp_seq([0.6, 0.2], [-0.6, 0.2])]

    def compute_traj_data_adherence(self, path: np.ndarray) -> float:
        # Adhering iff the path passes a corridor's enter/middle/exit gates in
        # order (reference: env_conveyor_2d.py:161-185).
        p = np.asarray(path)[:, :2]
        gates = {
            "top": np.array([[0.6, 0.2], [0.0, 0.2], [-0.6, 0.2]], np.float32),
            "bottom": np.array([[-0.6, -0.2], [0.0, -0.2], [0.6, -0.2]], np.float32),
        }
        for g in gates.values():
            t_hit = np.full(3, -1.0)
            for t in range(p.shape[0]):
                nxt = int(np.argmin(t_hit))
                if np.linalg.norm(p[t] - g[nxt]) < 0.2:
                    t_hit[nxt] = t
            if np.all(t_hit != -1):
                return 1.0
        return 0.0


class EnvHighways2D(Env2D):
    """reference: env_highways_2d.py:46-77."""

    name = "EnvHighways2D"
    _BOXES = np.array([
        [0.0, 0.0], [0.0, 0.875], [0.0, -0.875], [0.875, 0.0], [-0.875, 0.0],
        [0.875, 0.875], [0.875, -0.875], [-0.875, 0.875], [-0.875, -0.875],
    ], np.float32)
    _SIZES = np.array([
        [0.5, 0.5], [0.5, 0.25], [0.5, 0.25], [0.25, 0.5], [0.25, 0.5],
        [0.25, 0.25], [0.25, 0.25], [0.25, 0.25], [0.25, 0.25],
    ], np.float32)

    def __init__(self, **kw):
        super().__init__(boxes=self._BOXES, box_sizes=self._SIZES, **kw)

    def get_skill_pos_seq_l(self, start_pos=None, goal_pos=None, rng=None):
        # Counterclockwise quadrant-midpoint route from nearest-to-start to
        # nearest-to-goal, densified x10, edges trimmed, plus one noised copy
        # (reference: env_highways_2d.py:199-254).
        rng = rng or np.random.default_rng(0)
        wps = np.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]], np.float32)
        i0 = int(np.argmin(np.linalg.norm(wps - np.asarray(start_pos)[:2], axis=-1)))
        i1 = int(np.argmin(np.linalg.norm(wps - np.asarray(goal_pos)[:2], axis=-1)))
        seq = [wps[i0]]
        i = i0
        if i0 == i1:
            i = (i + 1) % 4
            seq.append(wps[i])
        while i != i1:
            i = (i + 1) % 4
            seq.append(wps[i])
        seq = np.stack(seq)
        dense = _densify(seq, 10)[4:-4]
        if dense.shape[0] == 0:
            dense = _densify(seq, 10)
        noised = dense + rng.normal(size=dense.shape).astype(np.float32) * 0.01
        return [dense, noised]

    def compute_traj_data_adherence(self, path: np.ndarray) -> float:
        # Counterclockwise iff aggregate cross product of consecutive
        # normalized position vectors > 0 (reference: env_highways_2d.py:255-275;
        # note the reference normalizes the *positions*, not the deltas).
        p = np.asarray(path)[:, :2]
        norms = np.linalg.norm(p, axis=1, keepdims=True)
        norms = np.where(norms < 1e-12, 1.0, norms)
        v = p / norms
        cross = v[:-1, 0] * v[1:, 1] - v[:-1, 1] * v[1:, 0]
        return 1.0 if float(np.sum(cross)) > 0 else 0.0

    def is_start_goal_valid_for_data_gen(self, start_pos, goal_pos) -> bool:
        # Data-gen gating to the four open corner squares
        # (reference: env_highways_2d.py:168-197).
        def in_corner(q):
            return abs(abs(q[0]) - 0.5) < 0.25 and abs(abs(q[1]) - 0.5) < 0.25

        return in_corner(np.asarray(start_pos)) and in_corner(np.asarray(goal_pos))


class EnvDropRegion2D(Env2D):
    """reference: env_drop_region_2d.py:62-95."""

    name = "EnvDropRegion2D"
    _BOXES = np.array([[0.4, 0.4], [-0.4, 0.4], [0.4, -0.4], [-0.4, -0.4]], np.float32)
    _SIZES = np.array([[0.4, 0.4]] * 4, np.float32)
    DROP_REGION_CENTERS = np.array([
        [0.4, 0.75], [0.4, 0.05], [0.4, -0.05], [0.4, -0.75],
        [-0.4, 0.75], [-0.4, 0.05], [-0.4, -0.05], [-0.4, -0.75],
        [0.75, 0.4], [0.05, 0.4], [-0.05, 0.4], [-0.75, 0.4],
        [0.75, -0.4], [0.05, -0.4], [-0.05, -0.4], [-0.75, -0.4],
    ], np.float32)

    def __init__(self, **kw):
        super().__init__(boxes=self._BOXES, box_sizes=self._SIZES, **kw)

    def get_skill_pos_seq_l(self, start_pos=None, goal_pos=None, rng=None):
        # Dwell 35 steps at each drop-region center
        # (reference: env_drop_region_2d.py:173-181).
        return [np.tile(c[None], (35, 1)) for c in self.DROP_REGION_CENTERS]

    def compute_traj_data_adherence(self, path: np.ndarray,
                                    drop_region_radius: float = 0.15,
                                    ratio_traj_steps_in_region: float = 0.25) -> float:
        # 1.0 iff the path dwells in any drop region for >=25% consecutive
        # steps (reference: env_drop_region_2d.py:183-197).
        p = np.asarray(path)[:, :2]
        n_req = int(p.shape[0] * ratio_traj_steps_in_region)
        if n_req <= 0:
            return 0.0
        for c in self.DROP_REGION_CENTERS:
            inside = np.linalg.norm(p - c, axis=-1) < drop_region_radius
            run = 0
            for flag in inside:
                run = run + 1 if flag else 0
                if run >= n_req:
                    return 1.0
        return 0.0


def _densify(seq: np.ndarray, n_points_interp: int) -> np.ndarray:
    """Linear densify a (K, 2) waypoint sequence with n interior points per
    segment (reference: mmd/common/trajectory_utils.py:54-70)."""
    out = []
    for a, b in zip(seq[:-1], seq[1:]):
        alphas = np.linspace(0.0, 1.0, n_points_interp, endpoint=False, dtype=np.float32)[:, None]
        out.append((1 - alphas) * a + alphas * b)
    out.append(seq[-1:])
    return np.concatenate(out, axis=0)


ENV_REGISTRY = {
    "EnvEmpty2D": EnvEmpty2D,
    "EnvEmptyNoWait2D": EnvEmptyNoWait2D,
    "EnvConveyor2D": EnvConveyor2D,
    "EnvHighways2D": EnvHighways2D,
    "EnvDropRegion2D": EnvDropRegion2D,
}


@functools.lru_cache(maxsize=None)
def make_env(name: str, sdf_cell_size: float = 0.005) -> Env2D:
    """Construct (and cache) an environment by class name, as the reference
    does via string ids (reference: mmd/datasets/trajectories.py:46-57)."""
    return ENV_REGISTRY[name](sdf_cell_size=sdf_cell_size)
