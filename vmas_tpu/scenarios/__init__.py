"""Scenario registry.

Behavioral reference: /root/reference/vmas/scenarios/__init__.py (file-walk
discovery) — here an explicit module registry (importlib by dotted name), so
discovery works from any install layout.
"""

from __future__ import annotations

import importlib

_MAIN = [
    "balance", "ball_passage", "ball_trajectory", "buzz_wire", "discovery",
    "dispersion", "dropout", "flocking", "football", "give_way",
    "joint_passage", "joint_passage_size", "multi_give_way", "navigation",
    "passage", "reverse_transport", "sampling", "transport", "wheel",
    "wind_flocking", "painting", "construction", "road_traffic",
]
_DEBUG = [
    "asym_joint", "circle_trajectory", "goal", "het_mass", "line_trajectory",
    "vel_control", "waterfall", "diff_drive", "kinematic_bicycle", "pollock",
    "drone",
]
_MPE = [
    "simple", "simple_adversary", "simple_crypto", "simple_push",
    "simple_reference", "simple_speaker_listener", "simple_spread",
    "simple_tag", "simple_world_comm",
]


def _names():
    return {
        **{n: f"vmas_tpu.scenarios.{n}" for n in _MAIN},
        **{n: f"vmas_tpu.scenarios.debug.{n}" for n in _DEBUG},
        **{n: f"vmas_tpu.scenarios.mpe.{n}" for n in _MPE},
    }


def load(name: str):
    """Load a scenario module by name (``.py`` suffix accepted for parity
    with the reference's file-based loader, make_env.py:74-77)."""
    if name.endswith(".py"):
        name = name[:-3]
    table = _names()
    if name not in table:
        raise ValueError(
            f"Scenario {name!r} not found. Available: {sorted(table)}"
        )
    return importlib.import_module(table[name])
