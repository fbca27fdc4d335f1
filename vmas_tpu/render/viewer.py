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


def _entity_patches(env, state, env_index, ax):
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
            # compose with transData: a bare Affine2D would leave the patch
            # in display (pixel) coordinates and Axes.add_patch would skip
            # assigning the data transform
            t = mtransforms.Affine2D().rotate(r).translate(*p) + ax.transData
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


def _draw_sensors(ax, env, state, env_index):
    """Lidar ray fans + hit dots (reference sensors.py:127-161)."""
    import matplotlib.patches as mpatches

    for agent in env.world.agents:
        for sensor in getattr(agent, "sensors", []):
            if not getattr(sensor, "_render", True):
                continue
            try:
                meas = np.asarray(sensor.measure(state))[env_index]
            except Exception:
                continue
            p = np.asarray(agent.pos(state)[env_index])
            rot = float(np.asarray(agent.rot(state)[env_index]).reshape(-1)[0])
            angles = np.asarray(sensor._angles) + rot
            color = getattr(sensor, "render_color", (0.0, 0.0, 0.0))
            if hasattr(color, "value"):
                color = color.value
            for ang, dist in zip(angles, meas):
                end = p + dist * np.array([np.cos(ang), np.sin(ang)])
                ax.plot([p[0], end[0]], [p[1], end[1]], color=color, lw=0.5, alpha=0.3)
                if dist < sensor.max_range - 1e-6:
                    ax.add_patch(mpatches.Circle(end, 0.01, color=color, alpha=0.6))


def _draw_actions(ax, env, state, env_index):
    """Force arrows on agents with render_action=True (reference core.py:1063-1085)."""
    for agent in env.world.agents:
        if not getattr(agent, "render_action", False):
            continue
        f = np.asarray(state.force[env_index, agent.index])
        if np.linalg.norm(f) < 1e-6:
            continue
        p = np.asarray(state.pos[env_index, agent.index])
        scale = 0.1 / max(np.linalg.norm(f), 1e-6) * min(np.linalg.norm(f), 1.0)
        ax.annotate(
            "", xy=p + f * scale, xytext=p,
            arrowprops=dict(arrowstyle="->", color="black", lw=1.0),
        )


def render_function_util(f, plot_range, ax, cmap_range=None, cmap_alpha=0.5,
                         precision=0.01, cmap_name="viridis"):
    """Evaluate ``f`` over a meshgrid and draw it as an image overlay
    (reference rendering.py:456-524). ``f`` maps [N,2] positions to [N] values
    or [N,4] RGBA rows."""
    if isinstance(plot_range, (int, float)):
        x_min, x_max = -plot_range, plot_range
        y_min, y_max = -plot_range, plot_range
    else:
        xr, yr = plot_range
        x_min, x_max = (-xr, xr) if isinstance(xr, (int, float)) else xr
        y_min, y_max = (-yr, yr) if isinstance(yr, (int, float)) else yr
    xs = np.arange(x_min, x_max, precision, dtype=np.float32)
    ys = np.arange(y_min, y_max, precision, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    vals = np.asarray(f(pts))
    if vals.ndim == 2 and vals.shape[-1] == 4:
        img = vals.reshape(len(ys), len(xs), 4)
    else:
        vals = vals.reshape(len(ys), len(xs)).astype(np.float32)
        lo, hi = cmap_range if cmap_range is not None else (vals.min(), vals.max())
        import matplotlib

        norm = (vals - lo) / max(hi - lo, 1e-9)
        img = matplotlib.colormaps[cmap_name](np.clip(norm, 0, 1))
        img[..., 3] = cmap_alpha
    ax.imshow(img, extent=(x_min, x_max, y_min, y_max), origin="lower", zorder=-1)


def _call_render_hook(hook, env, ax, env_index):
    """Invoke a scenario render hook. The contract is
    ``hook(env, ax, env_index)``; a hook written against the pre-round-2
    signature ``hook(env_index=0) -> list`` (the reference's geom-list
    style) is detected by arity and called legacy-style, its return value
    ignored."""
    import inspect

    try:
        n_params = len(inspect.signature(hook).parameters)
    except (TypeError, ValueError):
        n_params = 3
    if n_params >= 3:
        hook(env, ax, env_index)
    else:
        hook(env_index)


def render_env(
    env,
    mode: str = "human",
    env_index: int = 0,
    agent_index_focus: int = None,
    visualize_when_rgb: bool = False,
    plot_position_function=None,
    plot_position_function_precision: float = 0.01,
    plot_position_function_range=None,
    plot_position_function_cmap_range=None,
    plot_position_function_cmap_alpha: float = 1.0,
    plot_position_function_cmap_name: str = "viridis",
    **kwargs,
):
    """Render one env of a live Environment. Returns an RGB array for
    mode='rgb_array' (reference environment.py:756-847)."""
    import matplotlib.pyplot as plt

    state = env.state
    scenario = env.scenario
    viewer_size = getattr(scenario, "viewer_size", (700, 700))
    zoom = getattr(scenario, "viewer_zoom", VIEWER_DEFAULT_ZOOM)

    # one cached figure per Environment: reuse and clear instead of leaking a
    # window per frame (the reference keeps a single Viewer);
    # never switch backends — a GUI backend's canvas also supports
    # buffer_rgba, and switching to Agg mid-session kills open windows
    fig = getattr(env, "_render_fig", None)
    if fig is None or not plt.fignum_exists(fig.number):
        fig, _ = plt.subplots(
            figsize=(viewer_size[0] / 100, viewer_size[1] / 100), dpi=100
        )
        env._render_fig = fig
    fig.clf()
    ax = fig.add_subplot(111)

    # camera (reference environment.py:855-903) — computed FIRST so a
    # range=None heat-map overlay can span the visible bounds like the
    # reference's plot_function (environment.py:999-1013)
    pos = np.asarray(state.pos[env_index])
    if agent_index_focus is not None:
        c = pos[env.agents[agent_index_focus].index]
        xlim = (c[0] - zoom, c[0] + zoom)
        ylim = (c[1] - zoom, c[1] + zoom)
    else:
        agent_pos = pos[[a.index for a in env.world.agents]] if env.world.agents else pos
        cx, cy = getattr(scenario, "render_origin", (0.0, 0.0))
        # reference camera: fit all agents plus a 2*max_agent_radius margin,
        # never tighter than zoom * cam_range (environment.py:855-903)
        max_radius = max(
            (a.shape.radius for a in env.world.agents
             if isinstance(a.shape, Sphere)), default=0.05,
        )
        fit = max(
            float(np.abs(agent_pos[:, 0] - cx).max(initial=0.0)),
            float(np.abs(agent_pos[:, 1] - cy).max(initial=0.0)),
        )
        extent = max(fit + 2 * max_radius, zoom * 1.0)
        xlim = (cx - extent, cx + extent)
        ylim = (cy - extent, cy + extent)

    if plot_position_function is not None:
        rng = plot_position_function_range
        if rng is None:
            rng = (xlim, ylim)  # reference: None -> current viewer bounds
        render_function_util(
            plot_position_function, rng, ax,
            cmap_range=plot_position_function_cmap_range,
            cmap_alpha=plot_position_function_cmap_alpha,
            precision=plot_position_function_precision,
            cmap_name=plot_position_function_cmap_name,
        )
    # scenario-specific extras (reference BaseScenario.extra_render)
    _call_render_hook(scenario.extra_render, env, ax, env_index)
    for patch in _entity_patches(env, state, env_index, ax):
        ax.add_patch(patch)
    _draw_sensors(ax, env, state, env_index)
    _draw_actions(ax, env, state, env_index)
    # drawn ABOVE the entity geoms (reference BaseScenario.top_layer_render,
    # scenario.py:24-451 hook list)
    _call_render_hook(scenario.top_layer_render, env, ax, env_index)

    # applied after all drawing — imshow/artists autoscale must not win
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)

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

    # per-agent comm-message text lines (reference environment.py:1042-1064:
    # one TextLine per non-silent agent at y = idx*40 px, "<name> sends
    # <word>" where word is the comm vector for continuous actions or the
    # ALPHABET letter of its argmax for discrete)
    if env.world.dim_c > 0:
        from vmas_tpu.core.utils import ALPHABET

        c_all = np.asarray(state.c[env_index])
        idx = 0
        for a_i, agent in enumerate(env.world.agents):
            if agent.silent:
                continue
            c = c_all[a_i]
            if env.continuous_actions:
                word = "[" + ",".join(f"{v:.2f}" for v in c) + "]"
            else:
                word = ALPHABET[int(np.argmax(c))]
            fig.text(
                0.01, (10 + idx * 40) / viewer_size[1],
                f"{agent.name} sends {word}   ", fontsize=9,
            )
            idx += 1

    if mode == "rgb_array":
        if visualize_when_rgb:
            # reference semantics: show the live window while also returning
            # the frame (what interactive play relies on)
            plt.show(block=False)
            plt.pause(0.001)
        fig.canvas.draw()
        return np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    else:
        plt.show(block=False)
        plt.pause(0.001)
        return None
