from vmas_tpu.parallel.mesh import distribute, env_mesh, shard_state
from vmas_tpu.parallel.rollout import rollout, rollout_fn

__all__ = ["env_mesh", "shard_state", "distribute", "rollout", "rollout_fn"]
