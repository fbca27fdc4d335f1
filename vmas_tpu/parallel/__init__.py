from vmas_tpu.parallel.mesh import distribute, env_mesh, shard_state
from vmas_tpu.parallel.rollout import (
    rollout,
    rollout_fn,
    rows_policy_rollout_fn,
    rows_rollout_fn,
    rows_rollout_supported,
)

__all__ = [
    "env_mesh", "shard_state", "distribute", "rollout", "rollout_fn",
    "rows_rollout_fn", "rows_policy_rollout_fn", "rows_rollout_supported",
]
