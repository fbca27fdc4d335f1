from vmas_tpu.controllers.velocity_controller import VelocityController

__all__ = ["VelocityController"]
