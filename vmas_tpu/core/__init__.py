from vmas_tpu.core.joints import Joint, JointConstraint
from vmas_tpu.core.shapes import Box, Line, Shape, Sphere
from vmas_tpu.core.state import WorldState, blend
from vmas_tpu.core.utils import Color, JaxUtils, X, Y
from vmas_tpu.core.world import Agent, Entity, Landmark, World

__all__ = [
    "Agent", "Box", "Color", "Entity", "JaxUtils", "Joint", "JointConstraint",
    "Landmark", "Line", "Shape", "Sphere", "World", "WorldState", "blend", "X", "Y",
]
