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

    # ------------------------------------------------------------ animation
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

        circles = []
        for p, c in zip(paths, colors):
            circle = Circle(p[0, :2], self.robot_radius, color=c, zorder=5)
            ax.add_patch(circle)
            circles.append(circle)

        def update(frame_i):
            t = frame_ts[frame_i]
            for circle, p in zip(circles, paths):
                circle.center = p[min(t, len(p) - 1), :2]
            return circles

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
