"""Module-path alias of :mod:`vmas_tpu.render.interactive`, matching the
reference's ``vmas/interactive_rendering.py`` import path (the class, the
``render_interactively`` entry point, and the argparse CLI), so reference
users' imports and ``python -m`` invocations port unchanged."""

from vmas_tpu.render.interactive import (  # noqa: F401
    InteractiveEnv,
    parse_args,
    render_interactively,
)

if __name__ == "__main__":
    args = parse_args()
    render_interactively(
        scenario=args.scenario,
        control_two_agents=args.control_two_agents,
        display_info=args.display_info,
        save_render=args.save_render,
    )
