"""Planning visualization: environment + robot trajectories, PNG and GIF.

Mirrors PlanningVisualizer (reference: deps/torch_robotics/torch_robotics/
visualizers/planning_visualizer.py:23-397): env render + per-robot circles,
trails, constraint overlays, and multi-robot GIF animation via matplotlib
FuncAnimation.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib import animation
from matplotlib.patches import Circle, Rectangle

from mmd_tpu.envs.envs import Env2D


def create_fig_and_axes(figsize=(6, 6)):
    fig, ax = plt.subplots(figsize=figsize)
    ax.set_aspect("equal")
    return fig, ax


class PlanningVisualizer:
    def __init__(self, task=None, env: Optional[Env2D] = None,
                 robot_radius: float = 0.05):
        self.task = task
        if env is None and task is not None:
            env = getattr(task, "env", None)
        self.env = env
        self.robot_radius = (task.robot.radius if task is not None and
                             hasattr(task, "robot") else robot_radius)

    # ------------------------------------------------------------ rendering
    def render_env(self, ax, env: Optional[Env2D] = None,
                   transform: Sequence[float] = (0.0, 0.0)):
        env = env or self.env
        if env is None:
            return
        tx, ty = transform
        centers = np.asarray(env.box_field.centers)
        halves = np.asarray(env.box_field.half_sizes)
        for c, h in zip(centers, halves):
            ax.add_patch(Rectangle((c[0] - h[0] + tx, c[1] - h[1] + ty),
                                   2 * h[0], 2 * h[1], color="wheat", zorder=1))
        ax.set_xlim(env.limits[0][0] + tx - 0.05, env.limits[1][0] + tx + 0.05)
        ax.set_ylim(env.limits[0][1] + ty - 0.05, env.limits[1][1] + ty + 0.05)

    def render_tiled_env(self, ax, envs: List[Env2D], transforms: np.ndarray):
        los, his = [], []
        for env, t in zip(envs, transforms):
            self.render_env(ax, env, t)
            los.append(env.limits[0] + t)
            his.append(env.limits[1] + t)
        lo = np.min(np.stack(los), axis=0)
        hi = np.max(np.stack(his), axis=0)
        ax.set_xlim(lo[0] - 0.05, hi[0] + 0.05)
        ax.set_ylim(lo[1] - 0.05, hi[1] + 0.05)

    def render_robot_trajectories(self, fig=None, ax=None, trajs=None,
                                  start_state=None, goal_state=None,
                                  colors=None, constraints_l=None,
                                  show_robot_in_image: bool = True, **kw):
        """trajs: (B, H, D) — plot every trajectory, robot circle at start
        (reference: planning_visualizer.py:37-77)."""
        if ax is None:
            fig, ax = create_fig_and_axes()
            self.render_env(ax)
        trajs = np.asarray(trajs)
        colors = colors or ["blue"] * len(trajs)
        for traj, color in zip(trajs, colors):
            ax.plot(traj[:, 0], traj[:, 1], color=color, alpha=0.5, lw=1.0, zorder=3)
            if show_robot_in_image:
                ax.add_patch(Circle(traj[0, :2], self.robot_radius,
                                    color=color, alpha=0.6, zorder=4))
        if start_state is not None:
            s = np.asarray(start_state)
            ax.plot(s[0], s[1], "go", markersize=6, zorder=5)
        if goal_state is not None:
            g = np.asarray(goal_state)
            ax.plot(g[0], g[1], "r*", markersize=9, zorder=5)
        if constraints_l:
            for c in constraints_l:
                for q, r in zip(c.q_l, c.radius_l):
                    ax.add_patch(Circle(np.asarray(q)[:2], r, fill=False,
                                        color="red", ls="--", zorder=6))
        return fig, ax

    # ----------------------------------------------------- field rendering
    def render_env_sdf(self, ax=None, fig=None, n: int = 200):
        """Filled SDF contours over the workspace (reference:
        env_base.py:183-222 render_sdf)."""
        import jax.numpy as jnp

        from mmd_tpu.envs.grid_sdf import grid_sdf

        if ax is None:
            fig, ax = create_fig_and_axes()
        lo, hi = np.asarray(self.env.limits[0]), np.asarray(self.env.limits[1])
        xs = np.linspace(lo[0], hi[0], n)
        ys = np.linspace(lo[1], hi[1], n)
        X, Y = np.meshgrid(xs, ys, indexing="xy")
        pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], -1), jnp.float32)
        sdf = np.asarray(grid_sdf(self.env.scene.grid, pts)).reshape(X.shape)
        ctf = ax.contourf(X, Y, sdf)
        if fig is not None:
            fig.colorbar(ctf, orientation="vertical")
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_aspect("equal")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        return fig, ax

    def render_env_grad_sdf(self, ax=None, fig=None, n: int = 40):
        """Quiver of the SDF gradient field — the exact gradients guidance
        sees through the custom_vjp lookup (reference:
        env_base.py:225-264 render_grad_sdf)."""
        import jax
        import jax.numpy as jnp

        from mmd_tpu.envs.grid_sdf import grid_sdf

        if ax is None:
            fig, ax = create_fig_and_axes()
        lo, hi = np.asarray(self.env.limits[0]), np.asarray(self.env.limits[1])
        xs = np.linspace(lo[0], hi[0], n)
        ys = np.linspace(lo[1], hi[1], n)
        X, Y = np.meshgrid(xs, ys, indexing="xy")
        pts = jnp.asarray(np.stack([X.ravel(), Y.ravel()], -1), jnp.float32)
        grad = np.asarray(jax.vmap(jax.grad(
            lambda p: grid_sdf(self.env.scene.grid, p[None])[0]))(pts))
        ax.quiver(X, Y, grad[:, 0].reshape(X.shape), grad[:, 1].reshape(X.shape),
                  color="red", scale=40, width=0.002, zorder=3)
        self.render_env(ax)
        ax.set_aspect("equal")
        return fig, ax

    # ------------------------------------------------------ joint-space plot
    def plot_joint_space_trajectories(self, trajs, free_mask=None,
                                      pos_start=None, pos_goal=None,
                                      q_min=None, q_max=None,
                                      output_fpath=None):
        """Per-dimension position/velocity-vs-time panels, free trajectories
        in blue and colliding ones in red, joint limits dashed (reference:
        planning_visualizer.py:257-340 plot_joint_space_state_trajectories).

        trajs: (B, H, D) with D = 2*q_dim; free_mask: (B,) bool or None.
        """
        trajs = np.asarray(trajs)
        B, H, D = trajs.shape
        q_dim = D // 2
        free = (np.asarray(free_mask).astype(bool) if free_mask is not None
                else np.ones(B, bool))
        fig, axs = plt.subplots(q_dim, 2, squeeze=False,
                                figsize=(9, 2.6 * q_dim))
        axs[0, 0].set_title("Position")
        axs[0, 1].set_title("Velocity")
        t = np.arange(H)
        for d in range(q_dim):
            for col, off in ((0, 0), (1, q_dim)):
                ax = axs[d, col]
                for b in range(B):
                    ax.plot(t, trajs[b, :, d + off],
                            color="blue" if free[b] else "red",
                            alpha=0.6 if free[b] else 0.25, lw=1.0)
                ax.set_ylabel(f"q{d}" if col == 0 else f"dq{d}")
                if col == 0:
                    if pos_start is not None:
                        ax.plot(0, np.asarray(pos_start)[d], "go", ms=6)
                    if pos_goal is not None:
                        ax.plot(H - 1, np.asarray(pos_goal)[d], "r*", ms=9)
                    if q_min is not None and q_max is not None:
                        ax.axhline(np.asarray(q_min)[d], color="k", ls="--", lw=0.8)
                        ax.axhline(np.asarray(q_max)[d], color="k", ls="--", lw=0.8)
        axs[-1, 0].set_xlabel("t")
        axs[-1, 1].set_xlabel("t")
        fig.tight_layout()
        if output_fpath:
            fig.savefig(output_fpath, dpi=150)
            plt.close(fig)
            return output_fpath
        return fig, axs

    # ------------------------------------------------------------ animation
    def animate_opt_iters(self, trajs_iters, idx_best=None, start_state=None,
                          goal_state=None, video_filepath="opt-iters.gif",
                          n_frames=10, anim_time=5.0):
        """Animate the denoising chain: frame k shows the whole batch at
        diffusion iteration k; the last frame highlights the selected best
        trajectory (reference: planning_visualizer.py:225-255
        animate_opt_iters_robots over (S, B, H, D) chains)."""
        chain = np.asarray(trajs_iters)
        S = chain.shape[0]
        n_frames = min(n_frames, S)
        idxs = np.round(np.linspace(0, S - 1, n_frames)).astype(int)

        fig, ax = create_fig_and_axes()

        def update(i):
            ax.clear()
            self.render_env(ax)
            ax.set_title(f"iter: {idxs[i]}/{S - 1}")
            self.render_robot_trajectories(fig=fig, ax=ax, trajs=chain[idxs[i]],
                                           start_state=start_state,
                                           goal_state=goal_state,
                                           show_robot_in_image=False)
            if i == n_frames - 1 and idx_best is not None:
                best = chain[-1, int(idx_best)]
                ax.plot(best[:, 0], best[:, 1], color="black", lw=2.0, zorder=7)
            return []

        anim = animation.FuncAnimation(fig, update, frames=n_frames,
                                       interval=1000 * anim_time / n_frames,
                                       blit=False)
        anim.save(video_filepath, writer=animation.PillowWriter(
            fps=max(1, int(n_frames / anim_time))))
        plt.close(fig)
        return video_filepath

    def animate_multi_robot_trajectories(self, trajs_l=None, start_state_l=None,
                                         goal_state_l=None, plot_trajs=True,
                                         video_filepath="robot-traj.gif",
                                         n_frames=None, anim_time=10.0,
                                         constraints=None, colors=None,
                                         envs=None, env_transforms=None, **kw):
        """trajs_l: list of (H, D) (or (1, H, D)) per robot -> GIF
        (reference: planning_visualizer.py:142-224)."""
        paths = [np.asarray(t).reshape(-1, np.asarray(t).shape[-1])
                 for t in trajs_l]
        T = max(len(p) for p in paths)
        n_frames = n_frames or min(T, 100)
        frame_ts = np.linspace(0, T - 1, n_frames).astype(int)
        if colors is None:
            cmap = plt.get_cmap("tab20")
            colors = [cmap(i / max(1, len(paths) - 1) if len(paths) > 1 else 0.0)
                      for i in range(len(paths))]

        fig, ax = create_fig_and_axes()
        if envs is not None and env_transforms is not None:
            self.render_tiled_env(ax, envs, env_transforms)
        else:
            self.render_env(ax)
        if plot_trajs:
            for p, c in zip(paths, colors):
                ax.plot(p[:, 0], p[:, 1], color=c, alpha=0.3, lw=1.0, zorder=2)
        for i, (s, g) in enumerate(zip(start_state_l or [], goal_state_l or [])):
            ax.plot(np.asarray(s)[0], np.asarray(s)[1], "o", color=colors[i],
                    markersize=4, zorder=3)
            ax.plot(np.asarray(g)[0], np.asarray(g)[1], "*", color=colors[i],
                    markersize=8, zorder=3)

        # Constraint keep-out overlays (reference draws per-robot constraint
        # markers, robot_planar_disk.py:109-167).
        for c in (constraints or []):
            for q, r in zip(getattr(c, "q_l", []), getattr(c, "radius_l", [])):
                ax.add_patch(Circle(np.asarray(q)[:2], r, fill=False,
                                    color="red", ls="--", lw=0.8, zorder=6))

        trail_steps = int(kw.get("trail_steps", 12))
        circles, trails = [], []
        for p, c in zip(paths, colors):
            circle = Circle(p[0, :2], self.robot_radius, color=c, zorder=5)
            ax.add_patch(circle)
            circles.append(circle)
            (trail,) = ax.plot([], [], color=c, lw=2.0, alpha=0.8, zorder=4)
            trails.append(trail)

        def update(frame_i):
            t = frame_ts[frame_i]
            for circle, trail, p in zip(circles, trails, paths):
                ti = min(t, len(p) - 1)
                circle.center = p[ti, :2]
                seg = p[max(0, ti - trail_steps):ti + 1, :2]
                trail.set_data(seg[:, 0], seg[:, 1])
            return circles + trails

        anim = animation.FuncAnimation(fig, update, frames=n_frames,
                                       interval=1000 * anim_time / n_frames,
                                       blit=True)
        anim.save(video_filepath, writer=animation.PillowWriter(
            fps=max(1, int(n_frames / anim_time))))
        plt.close(fig)
        return video_filepath

    def save_frame(self, trajs_l, start_state_l=None, goal_state_l=None,
                   output_fpath="robot-traj.png", colors=None,
                   envs=None, env_transforms=None):
        fig, ax = create_fig_and_axes()
        if envs is not None and env_transforms is not None:
            self.render_tiled_env(ax, envs, env_transforms)
        else:
            self.render_env(ax)
        if colors is None:
            cmap = plt.get_cmap("tab20")
            colors = [cmap(i / max(1, len(trajs_l) - 1) if len(trajs_l) > 1 else 0.0)
                      for i in range(len(trajs_l))]
        for i, t in enumerate(trajs_l):
            p = np.asarray(t).reshape(-1, np.asarray(t).shape[-1])
            ax.plot(p[:, 0], p[:, 1], color=colors[i], lw=1.5, zorder=3)
            ax.add_patch(Circle(p[0, :2], self.robot_radius, color=colors[i],
                                alpha=0.7, zorder=4))
        ax.axis("off")
        fig.savefig(output_fpath, dpi=100, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
        return output_fpath
