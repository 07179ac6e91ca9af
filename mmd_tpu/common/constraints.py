"""Host-side constraint objects handed between multi-agent search and the
single-agent planners.

Mirrors mmd/common/constraints.py:34-144. These are plain Python records;
before reaching the device they are packed into a fixed-shape
`mmd_tpu.costs.constraints.ConstraintSet`.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mmd_tpu.config import params as default_params


@dataclasses.dataclass
class MultiPointConstraint:
    """A set of (q, t-range, radius) keep-out balls for one agent.

    reference: mmd/common/constraints.py:46-86. `t_range_l` entries are
    (start, end); the reference's cost masks start <= h < end
    (cost_functions.py:303-305).
    """

    q_l: List[np.ndarray]
    t_range_l: List[Tuple[int, int]]
    radius_l: Optional[List[float]] = None
    is_soft: bool = False

    def __post_init__(self):
        if self.radius_l is None:
            self.radius_l = [default_params.vertex_constraint_radius] * len(self.q_l)
        assert len(self.q_l) == len(self.t_range_l) == len(self.radius_l)

    def get_t_range_start(self) -> int:
        return min(t0 for t0, _ in self.t_range_l)

    def get_t_range_end(self) -> int:
        return max(t1 for _, t1 in self.t_range_l)

    def shifted(self, dt: int, t_min: int, t_max: int) -> "MultiPointConstraint":
        """Shift all t-ranges by dt and clamp to [t_min, t_max]
        (CBS shifts constraints by agent start times, cbs.py:399-406)."""
        new_ranges = [(int(np.clip(t0 + dt, t_min, t_max)),
                       int(np.clip(t1 + dt, t_min, t_max)))
                      for t0, t1 in self.t_range_l]
        return MultiPointConstraint(q_l=list(self.q_l), t_range_l=new_ranges,
                                    radius_l=list(self.radius_l), is_soft=self.is_soft)


@dataclasses.dataclass
class VertexConstraint:
    """Agent must avoid q at time t (reference: constraints.py:88-112)."""

    q: np.ndarray
    t: int

    def shifted(self, dt: int, t_min: int, t_max: int) -> "VertexConstraint":
        return VertexConstraint(q=self.q,
                                t=int(np.clip(self.t + dt, t_min, t_max)))

    def as_multipoint(self, radius: float = None,
                      t_pad: int = 2) -> MultiPointConstraint:
        """Plannable keep-out-ball form. The reference defines vertex
        constraints but its diffusion planner only consumes
        MultiPointConstraints (mpd.py:329-342); this conversion makes them
        usable end-to-end (TPU-framework extension)."""
        radius = radius if radius is not None else default_params.vertex_constraint_radius
        return MultiPointConstraint(q_l=[np.asarray(self.q, np.float32)],
                                    t_range_l=[(self.t - t_pad, self.t + t_pad)],
                                    radius_l=[radius])


@dataclasses.dataclass
class EdgeConstraint:
    """Agent must not traverse q_from->q_to over [t_from, t_to]
    (reference: constraints.py:114-144)."""

    q_from: np.ndarray
    q_to: np.ndarray
    t_from: int
    t_to: int

    def shifted(self, dt: int, t_min: int, t_max: int) -> "EdgeConstraint":
        return EdgeConstraint(q_from=self.q_from, q_to=self.q_to,
                              t_from=int(np.clip(self.t_from + dt, t_min, t_max)),
                              t_to=int(np.clip(self.t_to + dt, t_min, t_max)))

    def as_multipoint(self, radius: float = None) -> MultiPointConstraint:
        """Plannable form: keep-out balls at both endpoints plus the edge
        midpoint over [t_from, t_to+1), covering the swept segment (see
        VertexConstraint.as_multipoint on why this conversion exists)."""
        radius = radius if radius is not None else default_params.vertex_constraint_radius
        q_from = np.asarray(self.q_from, np.float32)
        q_to = np.asarray(self.q_to, np.float32)
        mid = 0.5 * (q_from + q_to)
        span = (self.t_from, self.t_to + 1)
        return MultiPointConstraint(q_l=[q_from, q_to, mid],
                                    t_range_l=[span, span, span],
                                    radius_l=[radius] * 3)
