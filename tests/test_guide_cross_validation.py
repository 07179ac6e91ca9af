"""Cross-framework validation: the guide gradient against an independent
torch implementation of the same math (GP prior + constraint cost with
per-cost norm clipping, endpoint zeroing, unnormalized-space gradients).

This is a from-scratch reimplementation of the FORMULAS (guides.py:180-226,
gp_factor.py:34-52, cost_functions.py:297-326) in torch autograd — not a
copy — used purely as an oracle.
"""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mmd_tpu.common.constraints import MultiPointConstraint
from mmd_tpu.costs.constraints import pack_constraint_set
from mmd_tpu.costs.guide import GuideConfig, GuideData, guide_gradient
from mmd_tpu.datasets.normalization import LimitsNormalizer
from mmd_tpu.envs.envs import make_env


def torch_guide_gradient(x_norm, mins, maxs, dt, constraint, w_smooth, w_con):
    """Oracle: per-cost autograd gradients w.r.t. the unnormalized
    trajectory, clipped per-waypoint-norm (max 1), endpoints zeroed,
    weighted, negated."""
    x = torch.tensor(x_norm, dtype=torch.float64)
    mins_t = torch.tensor(mins, dtype=torch.float64)
    maxs_t = torch.tensor(maxs, dtype=torch.float64)
    u = (torch.clamp(x, -1, 1) + 1) / 2 * (maxs_t - mins_t) + mins_t
    u = u.detach().requires_grad_(True)

    H = u.shape[1]
    q_dim = u.shape[2] // 2

    # GP cost: e_t = s_{t+1} - Phi s_t; cost = sum e^T Qinv e.
    I = torch.eye(q_dim, dtype=torch.float64)
    Z = torch.zeros(q_dim, q_dim, dtype=torch.float64)
    phi = torch.cat([torch.cat([I, dt * I], 1), torch.cat([Z, I], 1)], 0)
    q_inv = torch.cat([
        torch.cat([12 * dt**-3 * I, -6 * dt**-2 * I], 1),
        torch.cat([-6 * dt**-2 * I, 4 * dt**-1 * I], 1)], 0)
    e = u[:, 1:] - u[:, :-1] @ phi.T
    gp_cost = torch.einsum("bti,ij,btj->", e, q_inv, e)

    # Constraint cost: masked relu(radius - dist).
    qc = torch.tensor(constraint["q"], dtype=torch.float64)
    t0, t1 = constraint["t_range"]
    r = constraint["radius"]
    h_idx = torch.arange(H, dtype=torch.float64)
    in_range = ((h_idx >= t0) & (h_idx < t1)).double()
    dist = torch.linalg.norm(u[..., :q_dim] - qc, dim=-1)
    con_cost = (torch.relu(r - dist) * in_range).sum()

    total = torch.zeros_like(u)
    for cost, w in ((gp_cost, w_smooth), (con_cost, w_con)):
        g = torch.autograd.grad(cost, u, retain_graph=True)[0]
        norm = torch.linalg.norm(g + 1e-6, dim=-1, keepdim=True)
        g = g * (torch.clamp(norm, 0, 1.0) / norm)
        g[:, 0] = 0
        g[:, -1] = 0
        total = total + w * g
    return (-total).numpy()


def test_guide_gradient_matches_torch_oracle():
    rng = np.random.default_rng(0)
    B, H = 3, 12
    x_norm = rng.uniform(-0.4, 0.4, (B, H, 4)).astype(np.float32)
    mins = np.array([-1, -1, -2, -2], np.float32)
    maxs = np.array([1, 1, 2, 2], np.float32)
    dt = 5.0 / H
    con = {"q": np.array([0.05, -0.05]), "t_range": (3, 9), "radius": 0.5}

    cfg = GuideConfig(dt=dt)
    env = make_env("EnvEmpty2D")  # object SDF cost is identically zero
    cset = pack_constraint_set(
        [MultiPointConstraint(q_l=[con["q"]], t_range_l=[con["t_range"]],
                              radius_l=[con["radius"]])],
        max_constraints=4, max_points=4)
    gd = GuideData(scene=env.scene,
                   normalizer=LimitsNormalizer.from_limits(mins, maxs),
                   constraints=cset)
    ours = np.asarray(guide_gradient(jnp.asarray(x_norm), gd, cfg))

    oracle = torch_guide_gradient(
        x_norm, mins, maxs, dt, con,
        w_smooth=cfg.weight_smoothness, w_con=0.2)

    # Interior positions are far from the 1.08-scaled walls, so the boundary
    # cost contributes nothing and the comparison is exact.
    np.testing.assert_allclose(ours, oracle, atol=2e-4)
