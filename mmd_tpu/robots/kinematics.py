"""Differentiable forward kinematics for articulated robots.

TPU-native counterpart of the reference's torch_kinematics_tree
(reference: deps/torch_robotics/torch_robotics/torch_kinematics_tree/
models/robot_tree.py:75-492 — DifferentiableTree with URDF parsing,
update_kinematic_state, compute_forward_kinematics_all_links, autograd
jacobians, damped-least-squares inverse_kinematics). The torch version
walks a RigidBody object list per call and keeps mutable joint state on the
module; here the robot is a frozen pytree of stacked joint arrays with
STATIC topology (parents / joint types / dof map), so `fk` is one traced
program that composes fixed origin transforms with per-joint motions —
`jax.vmap` batches it over configuration batches and `jax.jacfwd` gives
exact link jacobians without autograd tape bookkeeping.

Conventions:
- a joint j attaches link j to link parents[j] (parents[j] < j, -1 = base);
- `origins[j]` is the CONSTANT parent-link -> joint frame SE(3) transform;
- a revolute/prismatic joint then moves about/along `axes[j]` (unit vector
  in the joint frame) by q[dof_index[j]]; fixed joints contribute origins
  only (dof_index -1);
- world transform of link j = world[parents[j]] @ origins[j] @ motion_j.

Collision geometry follows the reference's sphere-margin model
(robot_base.py:59-142): each row of `coll_link`/`coll_offset`/`coll_radius`
is one sphere rigidly attached to a link frame; `fk_collision_spheres`
returns their world centers for SDF queries (fk_map_collision,
robot_base.py:175-192).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass
from flax.struct import field

REVOLUTE, PRISMATIC, FIXED = 0, 1, 2


@pytree_dataclass
class KinematicTree:
    """Stacked-array articulated robot with static topology."""

    origins: jax.Array       # (J, 4, 4) fixed parent->joint transforms
    axes: jax.Array          # (J, 3) unit joint axes (joint frame)
    q_min: jax.Array         # (DOF,)
    q_max: jax.Array         # (DOF,)
    coll_link: jax.Array     # (S,) int32 link index per collision sphere
    coll_offset: jax.Array   # (S, 3) sphere center in link frame
    coll_radius: jax.Array   # (S,) sphere radii
    parents: Tuple[int, ...] = field(pytree_node=False, default=())
    types: Tuple[int, ...] = field(pytree_node=False, default=())
    dof_index: Tuple[int, ...] = field(pytree_node=False, default=())

    @property
    def n_links(self) -> int:
        return len(self.parents)

    @property
    def n_dof(self) -> int:
        return self.q_min.shape[0]


def _rodrigues(axis: jax.Array, theta: jax.Array) -> jax.Array:
    """Rotation matrix about a unit axis (Rodrigues' formula)."""
    kx, ky, kz = axis[0], axis[1], axis[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def _joint_motion(tree: KinematicTree, j: int, q: jax.Array) -> jax.Array:
    """SE(3) motion of joint j at configuration q (4x4)."""
    T = jnp.eye(4)
    if tree.types[j] == FIXED:
        return T
    qj = q[tree.dof_index[j]]
    if tree.types[j] == REVOLUTE:
        return T.at[:3, :3].set(_rodrigues(tree.axes[j], qj))
    return T.at[:3, 3].set(tree.axes[j] * qj)  # PRISMATIC


def fk(tree: KinematicTree, q: jax.Array) -> jax.Array:
    """World SE(3) transforms of every link: (DOF,) -> (J, 4, 4).

    Topology is static, so the compose loop unrolls at trace time into a
    chain of (4x4) matmuls XLA fuses freely (the torch reference walks a
    Python body list per call, robot_tree.py:136-190). Batch with jax.vmap.
    """
    world = []
    for j in range(tree.n_links):
        local = tree.origins[j] @ _joint_motion(tree, j, q)
        parent = tree.parents[j]
        world.append(local if parent < 0 else world[parent] @ local)
    return jnp.stack(world)


def link_positions(tree: KinematicTree, q: jax.Array) -> jax.Array:
    """(DOF,) -> (J, 3) world positions of the link frames."""
    return fk(tree, q)[:, :3, 3]


def fk_collision_spheres(tree: KinematicTree, q: jax.Array) -> jax.Array:
    """(DOF,) -> (S, 3) world centers of the collision spheres
    (fk_map_collision analog, robot_base.py:175-192)."""
    T = fk(tree, q)[tree.coll_link]                     # (S, 4, 4)
    return (jnp.einsum("sij,sj->si", T[:, :3, :3], tree.coll_offset)
            + T[:, :3, 3])


def position_jacobian(tree: KinematicTree, q: jax.Array,
                      link: int) -> jax.Array:
    """Exact (3, DOF) jacobian of one link position
    (compute_analytical_jacobian_all_links, robot_tree.py:250-266)."""
    return jax.jacfwd(lambda qq: fk(tree, qq)[link, :3, 3])(q)


def ik_position(tree: KinematicTree, target_pos: jax.Array, q0: jax.Array,
                link: Optional[int] = None, n_iters: int = 50,
                damping: float = 1e-2, step: float = 1.0) -> jax.Array:
    """Damped-least-squares position IK, one lax.scan program
    (reference inverse_kinematics, robot_tree.py:303-443, runs a Python
    gradient loop with early termination; fixed-iteration DLS jits and
    vmaps over target batches).
    """
    lnk = tree.n_links - 1 if link is None else link

    def body(q, _):
        err = target_pos - fk(tree, q)[lnk, :3, 3]
        J = position_jacobian(tree, q, lnk)
        JJt = J @ J.T + damping * jnp.eye(3)
        dq = J.T @ jnp.linalg.solve(JJt, err)
        q = jnp.clip(q + step * dq, tree.q_min, tree.q_max)
        return q, jnp.linalg.norm(err)

    q, _ = jax.lax.scan(body, q0, None, length=n_iters)
    return q


# ------------------------------------------------------------ constructors
def make_chain(origins: np.ndarray, axes: np.ndarray,
               types: Sequence[int], q_min: np.ndarray, q_max: np.ndarray,
               coll_spheres: Optional[Sequence[Tuple[int, Sequence[float], float]]] = None,
               ) -> KinematicTree:
    """Serial chain: link j's parent is j-1."""
    J = len(types)
    dof_index, d = [], 0
    for t in types:
        dof_index.append(-1 if t == FIXED else d)
        d += t != FIXED
    spheres = coll_spheres or []
    return KinematicTree(
        origins=jnp.asarray(origins, jnp.float32),
        axes=jnp.asarray(axes, jnp.float32),
        q_min=jnp.asarray(q_min, jnp.float32),
        q_max=jnp.asarray(q_max, jnp.float32),
        coll_link=jnp.asarray([s[0] for s in spheres], jnp.int32).reshape(-1),
        coll_offset=jnp.asarray([s[1] for s in spheres],
                                jnp.float32).reshape(-1, 3),
        coll_radius=jnp.asarray([s[2] for s in spheres],
                                jnp.float32).reshape(-1),
        parents=tuple(range(-1, J - 1)),
        types=tuple(types),
        dof_index=tuple(dof_index),
    )


def _mdh_origin(a: float, alpha: float, d: float) -> np.ndarray:
    """Modified-DH constant part: RotX(alpha) @ TransX(a) @ TransZ(d)
    (the theta rotation is the joint motion about z)."""
    ca, sa = np.cos(alpha), np.sin(alpha)
    T = np.eye(4)
    T[:3, :3] = [[1, 0, 0], [0, ca, -sa], [0, sa, ca]]
    T[:3, 3] = [a, -d * sa, d * ca]
    return T


# Franka Panda modified-DH table (public, Franka Control Interface docs):
# (a_{i-1}, alpha_{i-1}, d_i) per joint + fixed flange (0, 0, 0.107).
_PANDA_MDH = [
    (0.0, 0.0, 0.333),
    (0.0, -np.pi / 2, 0.0),
    (0.0, np.pi / 2, 0.316),
    (0.0825, np.pi / 2, 0.0),
    (-0.0825, -np.pi / 2, 0.384),
    (0.0, np.pi / 2, 0.0),
    (0.088, np.pi / 2, 0.0),
]
_PANDA_Q_MIN = [-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973]
_PANDA_Q_MAX = [2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973]


def make_panda() -> KinematicTree:
    """7-DOF Franka Panda arm + fixed flange (the reference's demo robot,
    DifferentiableFrankaPanda, models/robots.py:56-69 — built from its URDF;
    here from the equivalent public modified-DH table)."""
    origins = np.stack([_mdh_origin(*row) for row in _PANDA_MDH]
                       + [_mdh_origin(0.0, 0.0, 0.107)])
    axes = np.tile([0.0, 0.0, 1.0], (8, 1))
    types = [REVOLUTE] * 7 + [FIXED]
    # One sphere at each joint frame + flange (coarse self/world collision).
    spheres = [(j, (0.0, 0.0, 0.0), 0.06) for j in range(8)]
    return make_chain(origins, axes, types, _PANDA_Q_MIN, _PANDA_Q_MAX,
                      spheres)


def make_planar_arm(n_links: int = 3, link_length: float = 0.3,
                    n_spheres_per_link: int = 3,
                    sphere_radius: float = 0.04,
                    base_xy: Tuple[float, float] = (0.0, 0.0)) -> KinematicTree:
    """Planar n-revolute-joint arm in the 2D disk world (base at origin,
    links along +x, joints about +z). Extends the framework beyond the
    reference's 2D pipeline, which only ever instantiates the point/disk
    robot (robot_planar_disk.py:40) — the xy rows of its collision-sphere
    centers drop straight into the existing SDF cost fields.
    """
    origins = np.stack([_mdh_origin(0.0 if j == 0 else link_length, 0.0, 0.0)
                        for j in range(n_links)])
    origins[0][:2, 3] += np.asarray(base_xy, np.float32)
    axes = np.tile([0.0, 0.0, 1.0], (n_links, 1))
    types = [REVOLUTE] * n_links
    lim = np.full(n_links, np.pi, np.float32)
    spheres = [(j, ((k + 1) * link_length / n_spheres_per_link, 0.0, 0.0),
                sphere_radius)
               for j in range(n_links) for k in range(n_spheres_per_link)]
    return make_chain(origins, axes, types, -lim, lim, spheres)


def arm_scene_clearances(tree: KinematicTree, scene, q: jax.Array,
                         margin: float = 0.0) -> jax.Array:
    """Signed clearance of every collision sphere of the arm at q against
    the 2D scene (grid SDF + workspace boundary); <0 = penetration."""
    from mmd_tpu.envs.grid_sdf import grid_sdf

    centers = fk_collision_spheres(tree, q)[:, :2]
    sdf = grid_sdf(scene.grid, centers)
    ws = jnp.minimum(centers - scene.ws_min, scene.ws_max - centers).min(-1)
    return jnp.minimum(sdf, ws) - tree.coll_radius - margin


def plan_arm_gpmp2(tree: KinematicTree, scene, q_start: jax.Array,
                   q_goal: jax.Array, key: jax.Array, n_particles: int = 16,
                   horizon: int = 64, opt_iters: int = 400,
                   margin: float = 0.01, sigma_coll: float = 5e-5):
    """Plan an articulated-arm motion in a 2D scene with GPMP2 over joint
    space: the collision factor maps configurations through the FK sphere
    model (this is what the reference's articulated pipeline would wire via
    fk_map_collision; its 2D release never exercises it). Returns
    (trajs (P, H, 2*DOF) sorted input order, free (P,) bool)."""
    from mmd_tpu.datagen.gpmp2 import GPMP2Config, gpmp2_optimize

    D = tree.n_dof
    cfg = GPMP2Config(n_support_points=horizon, opt_iters=opt_iters,
                      sigma_coll=sigma_coll, step_size=0.15)

    def coll_fn(states):  # (H-1, 2D) -> (H-1, S) clearances
        return jax.vmap(
            lambda s: arm_scene_clearances(tree, scene, s[:D], margin))(states)

    # Per-particle random VIA-POINT seeds: piecewise-linear
    # start -> q_via -> goal with q_via uniform in the joint box (the
    # reference's 'random' trajectory init, mp_baselines base.py:141-203).
    # GPMP2 is local — diverse homotopy classes must come from the seeds.
    vias = jax.random.uniform(key, (n_particles, D), minval=tree.q_min,
                              maxval=tree.q_max)
    vias = vias.at[0].set(0.5 * (q_start + q_goal))  # keep one direct seed
    h2 = horizon // 2
    def one_seed(via):
        a = jnp.linspace(0.0, 1.0, h2)[:, None]
        first = (1 - a) * q_start[None] + a * via[None]
        b = jnp.linspace(0.0, 1.0, horizon - h2)[:, None]
        second = (1 - b) * via[None] + b * q_goal[None]
        qs = jnp.concatenate([first, second], 0)                  # (H, D)
        vel = jnp.gradient(qs, axis=0)
        return jnp.concatenate([qs, vel], -1)                     # (H, 2D)
    inits = jax.vmap(one_seed)(vias)

    start_state = jnp.concatenate([q_start, jnp.zeros(D)])
    goal_state = jnp.concatenate([q_goal, jnp.zeros(D)])
    trajs = gpmp2_optimize(scene, start_state, goal_state, inits, cfg,
                           coll_fn=coll_fn)
    free = jax.vmap(lambda tr: jnp.all(jax.vmap(
        lambda s: jnp.all(arm_scene_clearances(tree, scene, s[:D]) >= 0.0)
    )(tr)))(trajs)
    return trajs, free


def arm_scene_collision(tree: KinematicTree, scene, q: jax.Array,
                        margin: float = 0.0) -> jax.Array:
    """True iff any collision sphere of the arm at q penetrates the 2D
    scene (grid SDF + workspace boundary), batched-friendly."""
    from mmd_tpu.envs.grid_sdf import grid_sdf

    centers = fk_collision_spheres(tree, q)[:, :2]
    sdf = grid_sdf(scene.grid, centers)
    ws = jnp.minimum(centers - scene.ws_min, scene.ws_max - centers).min(-1)
    clearance = jnp.minimum(sdf, ws) - tree.coll_radius - margin
    return jnp.any(clearance < 0.0)
