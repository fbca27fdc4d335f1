"""Host-side rendering.

Behavioral reference: /root/reference/vmas/simulator/rendering.py +
Environment.render (environment.py:756-1064). The reference renders through
pyglet/OpenGL; the TPU build is intentionally host-side and framework-free:
state is fetched once per frame and drawn with matplotlib's Agg canvas
(rgb_array) or an interactive window (human). Camera semantics (auto-zoom to
fit agents, agent focus, semidim boundary lines) follow the reference.
"""

from __future__ import annotations

import numpy as np

from vmas_tpu.core.shapes import Box, Line, Sphere
from vmas_tpu.core.utils import VIEWER_DEFAULT_ZOOM


def _entity_patches(env, state, env_index):
    """Matplotlib patches for every entity at env_index."""
    import matplotlib.patches as mpatches
    import matplotlib.transforms as mtransforms

    patches = []
    pos = np.asarray(state.pos[env_index])
    rot = np.asarray(state.rot[env_index])
    rendering = np.asarray(state.rendering[env_index])
    for e in env.world.entities:
        if not rendering[e.index]:
            continue
        p = pos[e.index]
        r = rot[e.index]
        color = e.color
        if hasattr(color, "__len__") and len(np.asarray(color).shape) > 1:
            color = np.asarray(color)[env_index]
        alpha = getattr(e, "alpha", 1.0) if hasattr(e, "alpha") else 1.0
        if isinstance(e.shape, Sphere):
            patches.append(mpatches.Circle(p, e.shape.radius, color=color, alpha=alpha))
        elif isinstance(e.shape, Box):
            rect = mpatches.Rectangle(
                (-e.shape.length / 2, -e.shape.width / 2), e.shape.length, e.shape.width,
                color=color, alpha=alpha,
            )
            t = mtransforms.Affine2D().rotate(r).translate(*p)
            rect.set_transform(t)
            patches.append(rect)
        elif isinstance(e.shape, Line):
            half = e.shape.length / 2
            d = np.array([np.cos(r), np.sin(r)]) * half
            patches.append(
                mpatches.FancyArrow(
                    *(p - d), *(2 * d), width=0.005, head_width=0, color=color, alpha=alpha
                )
            )
    return patches


def render_env(
    env,
    mode: str = "human",
    env_index: int = 0,
    agent_index_focus: int = None,
    visualize_when_rgb: bool = False,
    **kwargs,
):
    """Render one env of a live Environment. Returns an RGB array for
    mode='rgb_array' (reference environment.py:756-847)."""
    import matplotlib

    if mode == "rgb_array":
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    state = env.state
    scenario = env.scenario
    viewer_size = getattr(scenario, "viewer_size", (700, 700))
    zoom = getattr(scenario, "viewer_zoom", VIEWER_DEFAULT_ZOOM)

    fig, ax = plt.subplots(figsize=(viewer_size[0] / 100, viewer_size[1] / 100), dpi=100)
    for patch in _entity_patches(env, state, env_index):
        ax.add_patch(patch)

    # camera (reference environment.py:855-903)
    pos = np.asarray(state.pos[env_index])
    if agent_index_focus is not None:
        c = pos[env.agents[agent_index_focus].index]
        ax.set_xlim(c[0] - zoom, c[0] + zoom)
        ax.set_ylim(c[1] - zoom, c[1] + zoom)
    else:
        agent_pos = pos[[a.index for a in env.world.agents]] if env.world.agents else pos
        cx, cy = getattr(scenario, "render_origin", (0.0, 0.0))
        extent = max(
            float(np.abs(agent_pos[:, 0] - cx).max(initial=1.0)),
            float(np.abs(agent_pos[:, 1] - cy).max(initial=1.0)),
            1.0,
        ) * zoom
        ax.set_xlim(cx - extent, cx + extent)
        ax.set_ylim(cy - extent, cy + extent)

    # semidim boundaries (reference environment.py:941-997)
    if getattr(scenario, "visualize_semidims", True):
        if env.world.x_semidim is not None:
            ax.axvline(-env.world.x_semidim, color="k", lw=0.8)
            ax.axvline(env.world.x_semidim, color="k", lw=0.8)
        if env.world.y_semidim is not None:
            ax.axhline(-env.world.y_semidim, color="k", lw=0.8)
            ax.axhline(env.world.y_semidim, color="k", lw=0.8)
    if getattr(scenario, "plot_grid", False):
        ax.grid(True, alpha=0.3)

    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])

    if mode == "rgb_array":
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        plt.close(fig)
        return buf
    else:
        plt.show(block=False)
        plt.pause(0.001)
        return None
