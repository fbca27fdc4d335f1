"""Dynamics models mapping agent actions to forces/torques.

Behavioral reference: /root/reference/vmas/simulator/dynamics/ (all 9 files).
"""

from vmas_tpu.dynamics.common import Dynamics
from vmas_tpu.dynamics.diff_drive import DiffDrive
from vmas_tpu.dynamics.drone import Drone
from vmas_tpu.dynamics.forward import Forward
from vmas_tpu.dynamics.holonomic import Holonomic
from vmas_tpu.dynamics.holonomic_with_rot import HolonomicWithRotation
from vmas_tpu.dynamics.kinematic_bicycle import KinematicBicycle
from vmas_tpu.dynamics.rotation import Rotation
from vmas_tpu.dynamics.static import Static

__all__ = [
    "Dynamics", "Holonomic", "HolonomicWithRotation", "Forward", "Rotation",
    "Static", "DiffDrive", "KinematicBicycle", "Drone",
]
