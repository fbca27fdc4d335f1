"""In-situ stub A/B decomposition of road_traffic's step on TPU.

Same-process, same rollout harness, three variants of the REAL step:

  A full      default scenario (pallas sweeps + obs kernels on)
  B obs=0     observations() returns zeros of the right shape — everything
              else identical, so A-B = in-situ cost of the obs layer
  C hooks=0   B plus pre_rewards/post_rewards/done stubbed — C = decode +
              dynamics + world.step + scan glue; B-C = reward layer
              (sweep kernel + interX + reward math + buffers)

Isolated-phase scans were tried first and are NOT decision grade: their
per-phase times summed to ~2x the full step (artifacts of carrying the
full state pytree per phase); differences of full-rollout variants are the
honest in-situ numbers.

Usage: python tests/golden/time_rt_ab.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from vmas_tpu.environment.environment import Environment
from vmas_tpu.parallel.rollout import rollout_fn
from vmas_tpu.scenarios.road_traffic import Scenario

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
# 500-step calls: the ~5.4 ms per-dispatch tunnel cost is ~11 us/step here
# (round-4 measurement) — at the original horizon 50 it was ~108 us/step,
# i.e. bigger than the layers being attributed. Differences cancel it, but
# the absolute C (phys+glue) number is only honest at long horizons.
HORIZON = 500
KW = dict(is_add_noise=False)


def measure(env):
    run = jax.jit(rollout_fn(env, horizon=HORIZON))
    key = jax.random.PRNGKey(0)
    st, steps, traj = run(env.state, env.steps, key)
    jax.block_until_ready(traj["rewards"])
    t0 = time.time()
    while time.time() - t0 < 6.0:
        st, steps, traj = run(st, steps, jax.random.fold_in(key, 1))
        jax.block_until_ready(traj["rewards"])
    best = float("inf")
    for w in range(4):
        t0 = time.perf_counter()
        st, steps, traj = run(st, steps, jax.random.fold_in(key, w))
        jax.block_until_ready(traj["rewards"])
        best = min(best, (time.perf_counter() - t0) / HORIZON)
    return best


def obs_width():
    env = Environment(Scenario(), num_envs=4, seed=0, **KW)
    obs = env.scenario.observations(env.state)
    return int(obs[0].shape[-1])


W = obs_width()


class StubObs(Scenario):
    def observations(self, state):
        return tuple(
            jnp.zeros((state.batch_dim, W)) for _ in self.world.policy_agents
        )


class StubPost(StubObs):
    """obs=0 AND post_rewards=identity: B-D = short-term path refresh +
    action buffers (post_rewards), D-C = pre_rewards (sweep kernel +
    agent interX + reward math) + done."""

    def post_rewards(self, state):
        return state


class StubAll(StubPost):
    def pre_rewards(self, state):
        return state

    def done(self, state):
        return jnp.zeros((state.batch_dim,), bool)


def main():
    results = {}
    for name, cls in (
        ("A full", Scenario),
        ("B obs=0", StubObs),
        ("D post=0", StubPost),
        ("C hooks=0", StubAll),
    ):
        env = Environment(cls(), num_envs=B, seed=0, **KW)
        results[name] = measure(env)
        print(f"  {name:10s} {results[name]*1e6:8.1f} us/step", flush=True)
    a, b = results["A full"], results["B obs=0"]
    d, c = results["D post=0"], results["C hooks=0"]
    print(f"  obs layer    {(a-b)*1e6:8.1f} us/step (A-B)")
    print(f"  post_rewards {(b-d)*1e6:8.1f} us/step (B-D)")
    print(f"  pre_rew+done {(d-c)*1e6:8.1f} us/step (D-C)")
    print(f"  phys+glue    {c*1e6:8.1f} us/step (C)")


if __name__ == "__main__":
    print(f"road_traffic in-situ A/B  B={B}  horizon={HORIZON}", flush=True)
    main()
