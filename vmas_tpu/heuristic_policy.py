"""Heuristic policy base classes.

Behavioral reference: /root/reference/vmas/simulator/heuristic_policy.py.
"""

from vmas_tpu.scenario import BaseHeuristicPolicy, RandomPolicy

__all__ = ["BaseHeuristicPolicy", "RandomPolicy"]
