"""Compiled rollouts.

The reference steps the world from Python once per env.step; the TPU-native
fast path compiles K steps into one XLA program with ``lax.scan`` (SURVEY.md
section 2.13: the long-rollout analog of sequence parallelism), so HBM never
round-trips to host between steps and XLA can overlap/fuse across steps.

The scan body is the ENVIRONMENT'S OWN step function (``env._step_fn_raw``),
not a re-implementation — the rollout performs exactly what ``env.step``
performs (action decode incl. multipliers/noise, dynamics, physics, obs/rew/
info/done with max_steps truncation), and trajectories include the
observations so nothing is dead-code-eliminated out of benchmarks.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _random_actions_for_horizon(env, key, horizon):
    """Pre-sampled uniform random actions for all steps — mirrors
    Environment.get_random_action per agent, but hoisted out of the scan body
    (a serial per-step threefry chain costs ~10x the physics on TPU)."""
    agents = env.agents
    xs = []
    for i, a in enumerate(agents):
        k = jax.random.fold_in(key, i)
        if env.continuous_actions:
            ranges = jnp.asarray(a.u_range_array)
            u = jax.random.uniform(
                k, (horizon, env.num_envs, a.action_size), minval=-1.0, maxval=1.0
            ) * ranges[None, None]
            if env.world.dim_c != 0 and not a.silent:
                comm = jax.random.uniform(
                    jax.random.fold_in(k, 1),
                    (horizon, env.num_envs, env.world.dim_c),
                )
                u = jnp.concatenate([u, comm], axis=-1)
            xs.append(u)
        else:
            space = env.get_agent_action_space(a)
            if env.multidiscrete_actions:
                cols = [
                    jax.random.randint(
                        jax.random.fold_in(k, j), (horizon, env.num_envs), 0, int(n)
                    )
                    for j, n in enumerate(space.nvec)
                ]
                xs.append(jnp.stack(cols, axis=-1))
            else:
                xs.append(
                    jax.random.randint(k, (horizon, env.num_envs), 0, int(space.n))
                )
    return tuple(xs)


def rollout_fn(env, policy: Optional[Callable] = None, horizon: int = 100,
               autoreset: bool = False, policy_aux: bool = False):
    """Build ``(state, steps, key) -> (state', steps', traj)`` scanning
    ``horizon`` env steps through the env's own compiled step semantics.

    ``policy(obs_tuple, key) -> actions_tuple`` defaults to uniform random
    actions in each agent's full action space (incl. comm / discrete).
    ``traj`` holds per-step ``rewards [T, B, A]``, ``dones [T, B]`` and
    ``obs`` (tuple of [T, B, obs_dim] per agent). The returned function is
    jit-compatible and shards over the env axis like everything else.

    ``policy_aux=True`` changes the policy contract to
    ``policy(obs, key) -> (actions, aux)`` and records the per-step ``aux``
    pytree (stacked over T) in ``traj["policy_aux"]``, plus the initial
    observations in ``traj["obs0"]`` — everything an on-policy learner
    (PPO) needs (sampled raw actions, log-probs) recorded in-scan, so no
    key-stream replication outside the rollout is ever required.

    ``autoreset=True`` resets done envs inside the scan via the env's own
    masked reset (the compiled analog of the reference's per-index
    ``reset_at`` loop, environment.py:131-148): after each step, envs whose
    ``terminated | truncated`` flag is set are re-spawned, their step
    counters zeroed, and the recorded/carried observations for those envs
    are the post-reset observations (gymnasium-vec convention — the done
    flag in ``traj`` still marks the boundary, so returns/GAE masks work
    unchanged). Each step's key is split between the step and the masked
    reset, so a given rollout key yields different random streams with
    autoreset on vs off.
    """
    random_pol = policy is None
    assert not (policy_aux and random_pol), (
        "policy_aux needs an explicit policy returning (actions, aux)"
    )

    def one_step(carry, xs):
        # policy rollouts carry the step's own emitted observations — the
        # policy at t acts on the obs the env emitted at t-1, and the obs
        # pipeline (plural batch hook / fused-output rows) runs exactly once
        # per step instead of being re-derived from the carry state
        state, steps = carry[:2]
        pol_input, step_key = xs
        if autoreset:
            step_key, reset_key = jax.random.split(step_key)
        if random_pol:
            actions = pol_input
            aux = None
        elif policy_aux:
            actions, aux = policy(carry[2], pol_input)
        else:
            actions = policy(carry[2], pol_input)
            aux = None
        state, obs, rews, terminated, truncated, infos, steps = env._step_fn_raw(
            state, steps, tuple(actions), step_key
        )
        done = terminated | truncated
        if autoreset:
            state, steps, obs_reset, _, _, _ = env._reset_masked(
                state, steps, reset_key, done
            )
            obs = jax.tree_util.tree_map(
                lambda o, r: jnp.where(
                    done.reshape((-1,) + (1,) * (o.ndim - 1)), r, o
                ),
                obs, obs_reset,
            )
        new_carry = (state, steps) if random_pol else (state, steps, obs)
        # Record observations BATCH-MINOR (env axis last): the fused-output
        # and obs-kernel paths produce obs as `rows.T`, so recording the
        # moveaxis'd copy lets XLA CANCEL the transpose pair and the scan
        # body stacks the raw rows — one big inverse transpose after the
        # scan restores the [T, B, w] contract. Round-4 same-process A/B at
        # amortized dispatch (tests/golden/time_glue_split.py): the per-step
        # obs assembly/recording was ~31 of transport's ~59 us/step; this
        # cut the rollout 59.3 -> ~31 us/step. (Round 3 measured the same
        # idea NEUTRAL — at horizon 100, where ~54 us/step of per-CALL
        # tunnel dispatch buried the effect; see docs/PERFORMANCE.md.)
        obs_rec = jax.tree_util.tree_map(
            lambda o: jnp.moveaxis(o, 0, -1), obs
        )
        return new_carry, (jnp.stack(rews, axis=-1), done, obs_rec, aux)

    def run(state, steps, key):
        k_pol, k_step, k_obs0 = jax.random.split(key, 3)
        if random_pol:
            pol_xs = _random_actions_for_horizon(env, k_pol, horizon)
            carry0 = (state, steps)
        else:
            pol_xs = jax.random.split(k_pol, horizon)
            # initial observations through the env's own obs pipeline
            # (fresh obs-noise key, like every eager observation call)
            carry0 = (state, steps, env._obs_fn_raw(state, k_obs0))
        step_keys = jax.random.split(k_step, horizon)
        carry, (rews, dones, obs_rows, auxs) = jax.lax.scan(
            one_step, carry0, (pol_xs, step_keys), length=horizon
        )
        state, steps = carry[:2]
        # invert the batch-minor recording: [T, ..., B] -> [T, B, ...]
        obs = jax.tree_util.tree_map(
            lambda o: jnp.moveaxis(o, -1, 1), obs_rows
        )
        traj = {"rewards": rews, "dones": dones, "obs": obs}
        if policy_aux:
            traj["policy_aux"] = auxs
            traj["obs0"] = carry0[2]
        return state, steps, traj

    return run


_ROLLOUT_CACHE_MAX = 16


def rollout(env, policy=None, horizon: int = 100, key=None):
    """Convenience: run a compiled rollout on the env's current state.

    Rows-eligible envs (``rows_rollout_supported``) are transparently
    upgraded to the rows-carried fast paths — the trajectory contract and
    values are identical (bitwise on hardware; tests/test_rows_rollout.py).

    The jitted program is cached on the env per (policy identity, horizon),
    so pass the SAME policy callable across calls — a fresh lambda per call
    re-traces and recompiles every time. The cache is bounded (oldest entry
    evicted past 16) so leaked closures can't pin compiled executables for
    the env's lifetime; for full control build ``rollout_fn`` + ``jax.jit``
    yourself."""
    if key is None:
        key = env._next_key()
    cache = getattr(env, "_rollout_cache", None)
    if cache is None:
        cache = env._rollout_cache = {}
    # the cached closure keeps `policy` alive, so its id cannot be recycled
    # while the entry exists
    cache_key = (id(policy), horizon)
    fn = cache.get(cache_key)
    if fn is None:
        if len(cache) >= _ROLLOUT_CACHE_MAX:
            cache.pop(next(iter(cache)))
        rows_ok = (
            rows_rollout_supported(env)
            # a scenario may declare the rows path a measured perf LOSS for
            # its shape (football: ~350 emit rows/step make recording the
            # dominant cost — 0.91x, tests/golden/time_football_ab.py);
            # rows_rollout_fn stays available explicitly
            and getattr(env._fused_outputs, "rows_auto", True)
            and (
                policy is None
                or (
                    "state"
                    not in getattr(env._fused_outputs, "unpack_reads", ())
                    and not getattr(env._fused_outputs, "script_slots", ())
                )
            )
        )
        if rows_ok:
            build = (
                rows_rollout_fn(env, horizon)
                if policy is None
                else rows_policy_rollout_fn(env, policy, horizon)
            )
        else:
            build = rollout_fn(env, policy, horizon)
        fn = cache[cache_key] = jax.jit(build)
    env.state, env.steps, traj = fn(env.state, env.steps, key)
    return traj


def rows_rollout_supported(env) -> bool:
    """Whether the rows-carried rollouts can run this env (see
    fused.rows_step_supported; additionally the env must be on fused
    physics with noise-free actions — continuous unclamped or discrete —
    and a hook pipeline the kernel fully replaces: default hooks, or the
    declared escapes ``process_action_noop`` /
    ``post_rewards_rollout_safe`` / ``unpack_reads`` documented in
    docs/FUSED_OUTPUTS.md)."""
    from vmas_tpu.core import fused as F
    from vmas_tpu.scenario import BaseScenario

    sc = type(env.scenario)
    return (
        getattr(env.world, "fused", False)
        and env._fused_outputs is not None
        and not env.grad_enabled
        and not (env.continuous_actions and env.clamp_action)
        and (
            sc.post_rewards is BaseScenario.post_rewards
            # rule-3-idempotent post_rewards (dropout): the scenario
            # asserts it only rewrites scratch unpack already merged and
            # touches rollout-unobservable fields; the rows paths apply
            # it once to the final state
            or getattr(env._fused_outputs, "post_rewards_rollout_safe", False)
        )
        # fused outputs replace pre_rewards/reward/obs/done, and the kernel
        # realizes Holonomic's force=u — but a scenario-level process_action
        # (give_way's PID velocity controller) would run OUTSIDE the kernel.
        # A scenario may declare its override a no-op FOR THIS CONFIG
        # (controller disabled) via process_action_noop, or realize it
        # IN-KERNEL via process_act_rows (the PID controller rides carry
        # rows; docs/FUSED_OUTPUTS.md).
        and (
            sc.process_action is BaseScenario.process_action
            or getattr(env._fused_outputs, "process_action_noop", False)
            or getattr(env._fused_outputs, "process_act_rows", None)
            is not None
        )
        and (
            sc.pre_step is BaseScenario.pre_step
            # overridden but provably identity for this config (football's
            # pre_step only acts under enable_shooting)
            or getattr(env._fused_outputs, "pre_step_noop", False)
        )
        and sc.post_step is BaseScenario.post_step
        and type(env._fused_outputs).finish_obs
        is F.FusedOutputs.finish_obs
        # unpack may read rollout-constant state freely; declared
        # step-varying reads can be "u" (the rows paths substitute the
        # per-step decoded actions they already hold) and "state" (the
        # random-action rows path records its carry rows and reconstructs
        # per-step states post-scan — navigation's Lidar; the policy path
        # refuses "state", see rows_policy_rollout_fn)
        and set(getattr(env._fused_outputs, "unpack_reads", ()))
        <= {"u", "c", "state", "obs_key"}
        # a "c" read is substituted from the hoisted comm decode, which only
        # exists when some policy agent actually emits comm — otherwise the
        # rows paths would hit a trace-time assert instead of falling back
        and (
            "c" not in getattr(env._fused_outputs, "unpack_reads", ())
            or any(
                env.world.dim_c > 0 and not a.silent for a in env.agents
            )
        )
        and F.rows_step_supported(env.world, env._fused_outputs, env.agents)
    )


def _decode_horizon(env, agent, raw):
    """``Environment._decode_action``'s u + comm math, vectorized over a
    leading horizon axis — same ops per element, so continuous decode (cast
    + stop_gradient + one multiply) is bitwise the per-step form, and the
    discrete mixed-radix/odd-n decode is exact (integer ops) up to the same
    final scale-multiply. Returns ``(u [T, B, action_size], uc)`` with
    ``uc`` a [T, B, dim_c] comm vector for non-silent agents in comm
    worlds, else None. Noise-free unclamped actions only (the rows
    eligibility class)."""
    import math

    dim_c = env.world.dim_c
    has_comm = dim_c > 0 and not agent.silent
    u_range = jnp.asarray(agent.u_range_array)
    u_mult = jnp.asarray(agent.u_multiplier_array)
    uc = None
    if env.continuous_actions:
        raw = jax.lax.stop_gradient(jnp.asarray(raw).astype(jnp.float32))
        u = raw[..., : agent.action_size]
        if has_comm:
            uc = raw[..., agent.action_size :]
    else:
        action = jnp.asarray(raw)
        if action.ndim == 2:  # flat Discrete: [T, B]
            action = action[..., None]
        nvec = list(agent.discrete_action_nvec)
        radix = nvec + ([dim_c] if has_comm else [])
        if not env.multidiscrete_actions:
            flat = jnp.clip(
                action[..., 0].astype(jnp.int32), 0, math.prod(radix) - 1
            )
            cols = []
            for i in range(len(radix)):
                n = math.prod(radix[i + 1 :])
                cols.append(flat // n)
                flat = flat % n
            action = jnp.stack(cols, axis=-1)
        action = action.astype(jnp.int32)
        us = []
        for j, n in enumerate(nvec):
            a = action[..., j]
            if n % 2 != 0:
                stay = a == 0
                decrement = (a > 0) & (a <= n // 2)
                a = jnp.where(stay, n // 2, jnp.where(decrement, a - 1, a))
            u_max = u_range[j]
            us.append((a.astype(jnp.float32) / (n - 1)) * (2 * u_max) - u_max)
        u = jnp.stack(us, axis=-1)
        if has_comm:
            uc = jax.nn.one_hot(
                action[..., len(nvec)], dim_c, dtype=jnp.float32
            )
    return u * u_mult[None, None], uc


def _decode_u_horizon(env, agent, raw):
    """The u half of ``_decode_horizon`` (kept for comm-free callers)."""
    return _decode_horizon(env, agent, raw)[0]


def _needs_decode_noise(env):
    import numpy as np

    return any(
        np.any(np.asarray(a.u_noise_array) > 0)
        or (env.world.dim_c > 0 and not a.silent and a.c_noise > 0)
        for a in env.agents
    )


def _noise_streams(env, k_step, horizon):
    """Per-step decode-noise agent keys and observation keys, derived
    EXACTLY as the step pipeline derives them (environment.step_fn:
    ``key, obs_key = split(step_key); keys = split(key, n_agents)``), so
    hoisted noise draws are bitwise the per-step draws."""
    step_keys = jax.random.split(k_step, horizon)

    def per_step(k):
        key, obs_key = jax.random.split(k)
        return jax.random.split(key, max(env.n_agents, 1)), obs_key

    return jax.vmap(per_step)(step_keys)  # [T, A] keys, [T] keys


def _apply_decode_noise(env, agents, us, ucs, agent_keys):
    """Hoisted u/comm noise — the decode's ``u += normal(key)*u_noise`` and
    ``comm += normal(fold_in(key,1))*c_noise`` (environment.py
    _decode_action), vectorized over the horizon with the per-step keys."""
    import numpy as np

    B = env.num_envs
    us, ucs = list(us), list(ucs)
    for i, a in enumerate(agents):
        if np.any(np.asarray(a.u_noise_array) > 0):
            nz = jax.vmap(
                lambda k: jax.random.normal(k, (B, a.action_size))
            )(agent_keys[:, i])
            us[i] = us[i] + nz * jnp.asarray(a.u_noise_array)[None, None]
        if ucs[i] is not None and a.c_noise > 0:
            ck = jax.vmap(lambda k: jax.random.fold_in(k, 1))(
                agent_keys[:, i]
            )
            cz = jax.vmap(
                lambda k: jax.random.normal(k, (B, env.world.dim_c))
            )(ck)
            ucs[i] = ucs[i] + cz * a.c_noise
    return us, ucs


def _vmapped_unpack(env, fo, agents, extras, us, state, carries_t=None,
                    uc_t=None, obs_keys_t=None):
    """One vmapped ``unpack`` over the recorded emit rows. Declared
    step-varying reads are substituted so unpack sees exactly what the
    standard per-step path saw: ``"u"`` from the per-step decoded actions
    the rollout already holds (dropout's energy term), ``"c"`` from the
    hoisted comm decode (``uc_t`` [T, B, A, dim_c] — the MPE comm
    scenarios), ``"state"`` reconstructed inside the vmap from the
    recorded carry rows (navigation's Lidar — batching the raycast over
    T*B)."""
    from vmas_tpu.core import fused as F

    reads = set(getattr(fo, "unpack_reads", ()))

    def unp(e, c, comm, ok, *uts):
        st = state if c is None else F.unpack_carry(env.world, c, state)
        if comm is not None:
            # physics copies uc -> state.c for non-silent agents each step
            # (physics.py); comm_t is that post-step comm state
            st = st.replace(c=comm)
        if ok is not None:
            # per-step observation-noise key — the step pipeline injects
            # it as scenario["__obs_key"] before unpack (environment.py
            # outputs()); substituting the same per-step keys makes noisy
            # observations bitwise the hook pipeline's
            st = st.replace(scenario={**st.scenario, "__obs_key": ok})
        if "u" in reads:
            for a, ut in zip(agents, uts):
                st = a.set_u(st, ut)
        return fo.unpack(e, st)

    c_ax = 0 if "state" in reads else None
    uc_ax = 0 if "c" in reads else None
    ok_ax = 0 if "obs_key" in reads else None
    if c_ax is None:
        carries_t = None
    if uc_ax is None:
        uc_t = None
    else:
        assert uc_t is not None
    if ok_ax is None:
        obs_keys_t = None
    else:
        assert obs_keys_t is not None
    return jax.vmap(unp, in_axes=(0, c_ax, uc_ax, ok_ax) + (0,) * len(us))(
        extras, carries_t, uc_t, obs_keys_t, *us
    )


def _apply_ctrl_finish(env, fo, state_out, carryT, state0):
    """Controller carry rows (in-kernel process_action state, e.g. the PID
    integrator) -> final scenario scratch, via the scenario's
    ``ctrl_updates``."""
    n_ctrl = int(getattr(fo, "n_ctrl", 0))
    if not n_ctrl:
        return state_out
    from vmas_tpu.core import fused as F

    base = F.rows_layout(env.world, fo) - n_ctrl
    crows = carryT[base : base + n_ctrl, : env.num_envs]
    return state_out.replace(scenario={
        **state_out.scenario, **fo.ctrl_updates(crows, state0.scenario),
    })


def _last_us(fo, us_last, extras):
    """The final state's per-agent u: the decoded action, unless the
    scenario's in-kernel process_action rewrote it (ctrl_u_idx names the
    emit rows holding the post-process u — the hook pipeline stores the
    controller's output in state.u, so the rows path must too)."""
    idx = getattr(fo, "ctrl_u_idx", None)
    if idx is None:
        return us_last
    us_last = list(us_last)
    for i, (ix, iy) in enumerate(idx):
        us_last[i] = jnp.stack(
            [extras[-1, int(ix)], extras[-1, int(iy)]], axis=-1
        )
    return us_last


def _kernel_script_us(env, fo, extras):
    """Final-step u for IN-KERNEL scripted agents (football's ball): the
    hook emits their per-step u rows; ``kernel_script_u`` names
    ``(entity_index, ix, iy)`` per agent."""
    out = []
    for aidx, ix, iy in getattr(fo, "kernel_script_u", ()):
        agent = next(a for a in env.world.agents if a.index == int(aidx))
        out.append(
            (agent, jnp.stack([extras[-1, int(ix)], extras[-1, int(iy)]], -1))
        )
    return out


def _finish_rows_rollout(env, agents, state_out, us_last, uc_last, updates,
                         terminated, steps, k_step, horizon, rews, obs):
    """Shared finale of the rows rollouts: truncation flags, and a final
    state that mirrors the standard path's exactly — last decoded u
    (+ comm), last step's scratch updates, last obs-noise key, and one
    post_rewards application (identity unless the scenario declared
    post_rewards_rollout_safe)."""
    if env.max_steps is not None:
        steps_t = steps[None] + 1 + jnp.arange(horizon)[:, None]
        truncated = steps_t >= env.max_steps
    else:
        truncated = jnp.zeros_like(terminated)
    dones = terminated | truncated
    for a, u in zip(agents, us_last):
        state_out = a.set_u(state_out, u)
    for slot, v in uc_last:
        state_out = state_out.replace(
            uc=state_out.uc.at[:, slot].set(v),
            c=state_out.c.at[:, slot].set(v),
        )
    last_updates = jax.tree_util.tree_map(lambda x: x[-1], updates)
    # pure step-counter scratch keys (scenario clocks incremented once per
    # step, read by nothing the kernel emits): the vmapped unpack computed
    # them from the rollout-INITIAL state, so its last value is t0+1 —
    # override with t0+horizon (exact f32 integer adds, bitwise the
    # standard path's horizon unit increments)
    for k in getattr(env._fused_outputs, "step_count_keys", ()):
        last_updates[k] = state_out.scenario[k] + float(horizon)
    step_keys = jax.random.split(k_step, horizon)
    _, obs_key_last = jax.random.split(step_keys[-1])
    state_out = state_out.replace(scenario={
        **state_out.scenario, **last_updates, "__obs_key": obs_key_last,
    })
    state_out = env.scenario.post_rewards(state_out)
    return state_out, steps + horizon, {
        "rewards": jnp.stack(rews, axis=-1), "dones": dones, "obs": obs,
    }


def _chunked_reset_rollout(env, run_chunk, horizon, reset_every):
    """Wrap a rows-rollout chunk runner with synchronized episodic resets
    every ``reset_every`` steps (the rows analog of in-scan autoreset —
    reference environment.py:131-148 resets per-index on done; the rows
    carry cannot reset mid-scan, so episodes are FIXED-LENGTH and
    synchronized: every env resets at the statically-known boundary,
    matching max_steps-truncated training setups). Boundary-step
    observations are the post-reset observations and the boundary done
    flag is True for every env (the gymnasium-vec convention rollout_fn's
    autoreset uses), so GAE masks and PPO's obs/action alignment work
    unchanged across chunks."""
    assert horizon % reset_every == 0, (
        "reset_every must divide horizon"
    )
    n_chunks = horizon // reset_every

    def run(state, steps, key):
        parts = []
        for c in range(n_chunks):
            kc = jax.random.fold_in(key, 2 * c)
            kr = jax.random.fold_in(key, 2 * c + 1)
            state, steps, traj = run_chunk(state, steps, kc)
            state, steps, obs_reset, _, _, _ = env._reset_masked(
                state, steps, kr, None
            )
            traj["obs"] = jax.tree_util.tree_map(
                lambda o, r: o.at[-1].set(r), traj["obs"], obs_reset
            )
            traj["dones"] = traj["dones"].at[-1].set(True)
            parts.append(traj)
        out = {
            k: jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *[p[k] for p in parts],
            )
            for k in ("rewards", "dones", "obs")
        }
        if "policy_aux" in parts[0]:
            out["policy_aux"] = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *[p["policy_aux"] for p in parts],
            )
            out["obs0"] = parts[0]["obs0"]
        return state, steps, out

    return run


def rows_rollout_fn(env, horizon: int = 100, unroll: Optional[int] = None,
                    k_steps: int = 1, reset_every: Optional[int] = None):
    """Rows-carried compiled rollout — same contract and BITWISE the same
    trajectory as ``rollout_fn(env, horizon=...)`` with random actions
    (asserted by tests/test_rows_rollout.py), restructured so the scan body
    is ONE fused-kernel call:

    * the carry is the kernel's own [Rc, B] row buffer (packed once before
      the scan, unpacked once after) — none of the per-step state-pytree
      relayout copies the standard scan pays;
    * decoded action-force rows ride the scan xs (``_decode_u_horizon``
      precomputes the per-step decode for all steps in one op — bitwise
      the per-step form for both continuous and discrete actions);
    * observations/rewards/termination come back as raw emit rows, recorded
      as rows and unpacked by ONE vmapped ``unpack`` after the scan.

    Measured (round 4, same session as the splits above): transport@4096
    went ~57 -> ~21 us/step. Eligibility is strict (rows_rollout_supported);
    ineligible envs should use ``rollout_fn``.

    ``reset_every=N`` adds synchronized episodic resets every N steps
    (see _chunked_reset_rollout): fixed-length episodes at rows speed."""
    from vmas_tpu.core import fused as F

    if reset_every is not None:
        chunk = rows_rollout_fn(env, reset_every, unroll, k_steps)
        return _chunked_reset_rollout(env, chunk, horizon, reset_every)

    assert rows_rollout_supported(env), (
        "rows_rollout_fn: env not eligible — needs fused_physics=True, a "
        "fused-outputs scenario declaring carry_extra_idx, holonomic "
        "noise-free agents (continuous unclamped or discrete), no scripted "
        "agents, no undeclared process_action/post_rewards overrides, and "
        "grad_enabled=False; use rollout_fn (see rows_rollout_supported)"
    )
    world, fo = env.world, env._fused_outputs
    agents = env.agents
    # precomputable scripted agents (fused.rows_step_supported): their
    # per-step u rides the action rows after the policy agents'
    script_slots = tuple(getattr(fo, "script_slots", ()))
    script_agents = [
        a for s in script_slots for a in world.agents if a.index == s
    ]
    act_slots = [a.index for a in agents] + list(script_slots)
    B = env.num_envs
    bp = -(-B // 128) * 128
    K = int(k_steps)
    assert K >= 1 and horizon % K == 0, (
        "k_steps must divide horizon"
    )
    assert K == 1 or "state" not in getattr(fo, "unpack_reads", ()), (
        "k_steps>1 cannot record per-step carries (navigation's Lidar "
        "reconstruction needs them) — use k_steps=1"
    )
    step = F.make_rows_step(world, fo, act_slots, bp, k_steps=K)
    if unroll is None:
        # unroll=8 batches the per-iteration scan glue on TPU (see below);
        # on CPU (interpret-mode tests) it only multiplies compile time
        unroll = 8 if jax.default_backend() == "tpu" else 1

    def run(state, steps, key):
        k_pol, k_step, _k_obs0 = jax.random.split(key, 3)
        acts = _random_actions_for_horizon(env, k_pol, horizon)
        # decode == _decode_action for this eligibility class, hoisted over
        # the horizon: continuous is cast + stop_gradient + one exact IEEE
        # u_multiplier multiply; discrete is the same integer mixed-radix /
        # odd-n remap followed by the same affine scale. Comm vectors (MPE
        # comm worlds) decode the same way — physics ignores them, so they
        # only feed unpack and the final state.
        dec = [_decode_horizon(env, a, acts[i]) for i, a in enumerate(agents)]
        us = [d[0] for d in dec]
        ucs = [d[1] for d in dec]
        reads = set(getattr(fo, "unpack_reads", ()))
        obs_keys_t = None
        if _needs_decode_noise(env) or "obs_key" in reads:
            # hoisted decode-noise draws + per-step obs keys, bitwise the
            # step pipeline's key schedule (_noise_streams)
            agent_keys, obs_keys_t = _noise_streams(env, k_step, horizon)
            us, ucs = _apply_decode_noise(env, agents, us, ucs, agent_keys)
        tr = getattr(fo, "decode_transform", None)
        if tr is not None:
            # the scenario's process_action rewrite of the DECODED action
            # itself (football's red-team x mirror) — static elementwise,
            # applied after noise exactly where the hook pipeline flips
            us = list(tr(us))
        uc_slots = [
            (a.slot, u) for a, u in zip(agents, ucs) if u is not None
        ]
        uc_t = None
        if uc_slots and "c" in getattr(fo, "unpack_reads", ()):
            # per-step comm STATE: physics copies uc -> c for non-silent
            # agents, so c_t = decoded comm at t on those slots, the
            # initial c elsewhere (silent slots never change)
            uc_t = jnp.broadcast_to(
                state.c[None], (horizon,) + state.c.shape
            )
            for slot, v in uc_slots:
                uc_t = uc_t.at[:, :, slot].set(v)
        # scripted agents' precomputed per-step u (pure functions of the
        # initial state's step counters — same values the XLA script would
        # produce each step, hoisted like the random-action decode)
        script_us = (
            [jnp.asarray(u) for u in fo.script_us(state, horizon)]
            if script_slots else []
        )
        all_us = us + script_us
        ax = jnp.stack([u[..., 0] for u in all_us], axis=1)  # [T, A, B]
        ay = jnp.stack([u[..., 1] for u in all_us], axis=1)
        act_rows = jnp.concatenate([ax, ay], axis=1)  # [T, 2A, B]
        if K > 1:
            # group K consecutive steps' action rows into one kernel call:
            # [T, 2A, B] -> [T/K, K*2A, B] (step k of a group at rows
            # [k*2A, (k+1)*2A) — the kernel's a_ref layout)
            act_rows = act_rows.reshape(
                horizon // K, K * act_rows.shape[1], act_rows.shape[2]
            )
        a_blk = -(-act_rows.shape[1] // 8) * 8
        act_rows = jnp.pad(
            act_rows,
            ((0, 0), (0, a_blk - act_rows.shape[1]), (0, bp - B)),
        )

        carry0 = F.pack_carry(world, state, fo, bp)

        # unroll batches the per-iteration glue (xs slicing, extras
        # recording, loop bookkeeping) across several kernel calls —
        # measured 59.5/35.7/32.2/30.0 us/step at unroll 1/2/4/8
        # (transport@4096, same-process sweep); the kernel calls are
        # opaque pallas ops so the trajectory is unchanged
        if "state" in getattr(fo, "unpack_reads", ()):
            # unpack needs per-step states (navigation's Lidar): also
            # record the carry rows — the post-scan reconstruction then
            # batches the state-dependent obs work over T*B
            def step_rec(c, a):
                c2, e = step(c, a)
                return c2, (e, c2)

            carryT, (extras, carries) = jax.lax.scan(
                step_rec, carry0, act_rows, unroll=unroll
            )
        else:
            carryT, extras = jax.lax.scan(
                step, carry0, act_rows, unroll=unroll
            )
            carries = None

        state_out = F.unpack_carry(world, carryT, state)
        if K > 1:
            # ungroup: [T/K, K*n_out, bp] -> [T, n_out, bp]
            n_tot = int(fo.n_out) + int(getattr(fo, "n_ctrl_out", 0))
            extras = extras.reshape(horizon, n_tot, extras.shape[2])
        extras = extras[..., :B]  # [T, n_out, B]
        obs, rews, terminated, updates = _vmapped_unpack(
            env, fo, agents, extras, us, state, carries, uc_t, obs_keys_t
        )
        state_out = _apply_ctrl_finish(env, fo, state_out, carryT, state)
        us_last = _last_us(fo, [u[-1] for u in all_us], extras)
        ks = _kernel_script_us(env, fo, extras)
        return _finish_rows_rollout(
            env,
            list(agents) + script_agents + [a for a, _ in ks],
            state_out, us_last + [u for _, u in ks],
            [(slot, v[-1]) for slot, v in uc_slots], updates, terminated,
            steps, k_step, horizon, rews, obs,
        )

    return run


def rows_policy_rollout_fn(env, policy: Callable, horizon: int = 100,
                           unroll: Optional[int] = None,
                           policy_aux: bool = False,
                           reset_every: Optional[int] = None):
    """Rows-carried POLICY rollout — same contract and BITWISE the same
    trajectory as ``rollout_fn(env, policy, horizon=...)`` for rows-eligible
    envs (tests/test_rows_rollout.py): the scan body is the policy applied
    to the previous step's emitted observations plus ONE fused-kernel call,
    so experience collection for training runs at rows-rollout speed (the
    state pytree never round-trips between steps; only the policy's own
    obs-transpose and action rows sit between kernel calls).

    ``policy(obs_tuple, key) -> actions_tuple`` exactly as in
    ``rollout_fn``; actions are decoded per step with the same math as
    ``Environment._decode_action``. No gradients flow through the rollout
    (fused physics is forward-only) — use it to COLLECT experience, and
    fit the policy on the recorded trajectories.

    ``policy_aux=True``: as in ``rollout_fn`` — the policy returns
    ``(actions, aux)``, the per-step aux pytree is recorded in
    ``traj["policy_aux"]`` and the initial observations in
    ``traj["obs0"]`` (what PPO needs: raw samples + log-probs captured at
    sampling time; values are better recomputed post-hoc in one batched
    matmul over T*B — see parallel/ppo.py).

    ``reset_every=N``: synchronized episodic resets every N steps
    (see _chunked_reset_rollout) — episodic PPO collection at rows speed;
    boundary-step obs are post-reset, so the aux/obs alignment PPO relies
    on holds across chunks."""
    from vmas_tpu.core import fused as F

    if reset_every is not None:
        chunk = rows_policy_rollout_fn(
            env, policy, reset_every, unroll, policy_aux
        )
        return _chunked_reset_rollout(env, chunk, horizon, reset_every)

    assert rows_rollout_supported(env), (
        "rows_policy_rollout_fn: env not eligible — use rollout_fn"
    )
    assert "state" not in getattr(env._fused_outputs, "unpack_reads", ()), (
        "rows_policy_rollout_fn: the policy consumes per-step obs, and this "
        "scenario's obs need per-step state reconstruction (Lidar) — the "
        "relayout would run every step, defeating the rows structure; use "
        "rollout_fn for policy rollouts here"
    )
    assert not getattr(env._fused_outputs, "script_slots", ()), (
        "rows_policy_rollout_fn: precomputed scripted-agent actions are "
        "only wired into the random-action rows path; use rollout_fn"
    )
    world, fo = env.world, env._fused_outputs
    agents = env.agents
    A = len(agents)
    act_slots = [a.index for a in agents]
    B = env.num_envs
    bp = -(-B // 128) * 128
    step = F.make_rows_step(world, fo, act_slots, bp)
    a_blk = -(-2 * A // 8) * 8
    # unlike the random-action rows scan, unroll does NOT pay here: the
    # policy matmuls dominate the body and unrolling them regressed
    # (65.5/61.2/75.9/87.6 us/step at unroll 1/2/4/8, transport@4096 —
    # the sweep that set rows_rollout_fn's default). Default 1; exposed
    # for configs with cheaper policies.
    unroll_ = 1 if unroll is None else unroll

    import numpy as np

    noisy_u = [bool(np.any(np.asarray(a.u_noise_array) > 0)) for a in agents]
    need_noise = _needs_decode_noise(env)

    def run(state, steps, key):
        k_pol, k_step, k_obs0 = jax.random.split(key, 3)
        pol_keys = jax.random.split(k_pol, horizon)

        reads = set(getattr(fo, "unpack_reads", ()))
        if need_noise or "obs_key" in reads:
            agent_keys_t, obs_keys_t = _noise_streams(env, k_step, horizon)
        else:
            agent_keys_t = obs_keys_t = None

        def one_step(carry, xs):
            pol_key, akeys, okey = xs
            rows, obs = carry
            if policy_aux:
                raw, aux = policy(obs, pol_key)
            else:
                raw, aux = policy(obs, pol_key), None
            dec = [
                _decode_horizon(env, a, jnp.asarray(r)[None])
                for a, r in zip(agents, raw)
            ]
            us = [u[0] for u, _ in dec]
            ucs = [None if uc is None else uc[0] for _, uc in dec]
            if need_noise:
                # the decode's per-step noise draws, same keys as the step
                # pipeline (_noise_streams)
                for i, a in enumerate(agents):
                    if noisy_u[i]:
                        us[i] = us[i] + jax.random.normal(
                            akeys[i], us[i].shape
                        ) * jnp.asarray(a.u_noise_array)[None]
                    if ucs[i] is not None and a.c_noise > 0:
                        ucs[i] = ucs[i] + jax.random.normal(
                            jax.random.fold_in(akeys[i], 1), ucs[i].shape
                        ) * a.c_noise
            tr = getattr(fo, "decode_transform", None)
            if tr is not None:
                us = list(tr(us))
            act = jnp.concatenate(
                [jnp.stack([u[:, 0] for u in us], 0),
                 jnp.stack([u[:, 1] for u in us], 0)], 0)  # [2A, B]
            act = jnp.pad(act, ((0, a_blk - 2 * A), (0, bp - B)))
            rows, extra = step(rows, act)
            # the policy at t+1 acts on the obs THIS step emitted — only
            # the obs outputs of unpack are consumed here, so XLA dead-codes
            # its reward/termination math out of the in-scan instance
            st_t = state
            c_t = state.c
            for a, uc in zip(agents, ucs):
                if uc is not None:
                    c_t = c_t.at[:, a.slot].set(uc)
            if "c" in reads:
                st_t = st_t.replace(c=c_t)
            if "u" in reads:
                for a, u in zip(agents, us):
                    st_t = a.set_u(st_t, u)
            if "obs_key" in reads:
                st_t = st_t.replace(
                    scenario={**st_t.scenario, "__obs_key": okey}
                )
            obs_next = fo.unpack(extra[:, :B], st_t)[0]
            return (rows, obs_next), (extra, act, c_t, aux)

        obs0 = env._obs_fn_raw(state, k_obs0)
        carry0 = (F.pack_carry(world, state, fo, bp), obs0)
        (carryT, _), (extras, acts, c_ts, auxs) = jax.lax.scan(
            one_step, carry0, (pol_keys, agent_keys_t, obs_keys_t),
            unroll=unroll_,
        )

        state_out = F.unpack_carry(world, carryT, state)
        extras = extras[..., :B]  # [T, n_out, B]
        us_t = [
            jnp.stack([acts[:, i, :B], acts[:, A + i, :B]], -1)  # [T, B, 2]
            for i in range(A)
        ]
        obs, rews, terminated, updates = _vmapped_unpack(
            env, fo, agents, extras, us_t, state,
            uc_t=c_ts if "c" in reads else None,
            obs_keys_t=obs_keys_t,
        )
        comm_agents = [
            a for a in agents if world.dim_c > 0 and not a.silent
        ]
        uc_last = [(a.slot, c_ts[-1, :, a.slot]) for a in comm_agents]
        state_out = _apply_ctrl_finish(env, fo, state_out, carryT, state)
        us_last = _last_us(fo, [u[-1] for u in us_t], extras)
        ks = _kernel_script_us(env, fo, extras)
        state_fin, steps_fin, traj = _finish_rows_rollout(
            env, list(agents) + [a for a, _ in ks], state_out,
            us_last + [u for _, u in ks], uc_last, updates,
            terminated, steps, k_step, horizon, rews, obs,
        )
        if policy_aux:
            traj["policy_aux"] = auxs
            traj["obs0"] = obs0
        return state_fin, steps_fin, traj

    return run
