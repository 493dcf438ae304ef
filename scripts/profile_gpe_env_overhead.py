"""Decompose the GPE fleet's env-step overhead over the bare kernel.

The slope anchor (profile_gpe_stages) times the macro with a LOOP-
CONSTANT control — XLA hoists the control field's build/copy out of the
loop, so the anchor excludes what a real env step pays every step.
Variants (1024 x 64^2, 10 substeps each):

  const_ctrl    macro, ctrl hoisted              (the anchor's number)
  vary_ctrl     macro, ctrl rebuilt per step     (+ctrl build/copy)
  vary_ctrl_ep  epilogue macro, ctrl per step    (+in-kernel epilogue)
  env_rollout   the full epilogue env step       (+glue/reset/reward)

Run (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_gpe_env_overhead.py
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.grid import Domain
from pde_opt_tpu.ops.gpe_cas import make_gpe_strang_cas_macro

E, G, S = 1024, 64, 10
STEPS, RUNS = 50, 3


def main():
    L = 16.0
    domain = Domain((G, G), ((-L / 2, L / 2), (-L / 2, L / 2)),
                    "dimensionless")
    dx = float(domain.dx[0])

    @jax.jit
    def build():
        X, Y = (jnp.asarray(m, jnp.float32) for m in domain.mesh())
        psi = jnp.exp(-(X**2 + Y**2) / 4.0)
        psi = psi / jnp.sqrt(jnp.sum(psi**2) * dx * dx)
        y = jnp.stack([psi, jnp.zeros_like(psi)], axis=-1)
        V = 0.5 * (X**2 + Y**2)
        spot = jnp.exp(-(X**2 + Y**2))
        return jnp.broadcast_to(y, (E, G, G, 2)), V, spot

    y0, V, spot = build()
    macro = make_gpe_strang_cas_macro(V, 100.0, G, G, dx, 2e-3, S)
    macro_ep = make_gpe_strang_cas_macro(
        V, 100.0, G, G, dx, 2e-3, S,
        epilogue={"obs_scale": 2550.0, "weight": jax.device_get(spot)},
    )

    def timed(tag, run):
        y, s = run(y0)
        _ = float(jnp.sum(s))
        t0 = time.perf_counter()
        for _i in range(RUNS):
            y, s = run(y)
        _ = float(jnp.sum(s))
        dt = time.perf_counter() - t0
        rate = E * STEPS * RUNS / dt
        print(f"RESULT {tag:14s} {rate:12,.0f} env-steps/s "
              f"({1e6 * E / rate:6.0f} us/step)", flush=True)

    ctrl0 = jnp.zeros((E, G, G), jnp.float32)

    @jax.jit
    def run_const(y):
        def body(yy, _):
            y1 = macro(yy, ctrl0)
            return y1, y1[0, 0, 0]
        return jax.lax.scan(body, y, None, length=STEPS)

    timed("const_ctrl", run_const)

    amp0 = jnp.linspace(0.0, 1.0, E)

    @jax.jit
    def run_vary(y):
        def body(carry, i):
            yy, amp = carry
            amp = amp + 1e-6
            ctrl = amp[:, None, None] * spot
            y1 = macro(yy, ctrl)
            return (y1, amp), y1[0, 0, 0]
        (y, _), s = jax.lax.scan(body, (y, amp0), jnp.arange(STEPS))
        return y, s

    timed("vary_ctrl", run_vary)

    @jax.jit
    def run_vary_ep(y):
        def body(carry, i):
            yy, amp = carry
            amp = amp + 1e-6
            ctrl = amp[:, None, None] * spot
            y1, stats, obs = macro_ep(yy, ctrl)
            return (y1, amp), stats[:, 0]
        (y, _), s = jax.lax.scan(body, (y, amp0), jnp.arange(STEPS))
        return y, s

    timed("vary_ctrl_ep", run_vary_ep)

    # full env rollout (epilogue preset)
    from pde_opt_tpu.envs.presets import make_gpe_control_env

    env = make_gpe_control_env(num_envs=E, grid_size=G, substeps=S,
                               spectral_solve="fused", fused_epilogue=True)

    def policy(obs, key):
        return jax.random.uniform(key, (E, 1), minval=-1.0, maxval=1.0,
                                  dtype=jnp.float32)

    def timed_rollout(tag, run, state, key_base):
        state, rewards, _ = run(state, jax.random.PRNGKey(key_base))
        _ = float(jnp.sum(rewards))
        t0 = time.perf_counter()
        for i in range(RUNS):
            state, rewards, _ = run(state, jax.random.PRNGKey(
                key_base + 1 + i))
        _ = float(jnp.sum(rewards))
        dt = time.perf_counter() - t0
        rate = E * STEPS * RUNS / dt
        print(f"RESULT {tag:14s} {rate:12,.0f} env-steps/s "
              f"({1e6 * E / rate:6.0f} us/step)", flush=True)

    state, _ = env.reset(jax.random.PRNGKey(3))
    timed_rollout("env_rollout", env.make_rollout(policy, STEPS), state, 4)

    # Glue isolators (same env, custom scan bodies):
    #   env_const_act   _step_impl only — no policy RNG, no obs carry
    #   env_no_reset    auto_reset=False env (scrub where replaces the cond)
    acts = jnp.full((E, 1), 0.3, jnp.float32)

    @jax.jit
    def run_const_act(state):
        def body(st, _):
            st, _obs, reward, _t, _tr, _info = env._step_impl(st, acts)
            return st, reward[0]
        return jax.lax.scan(body, state, None, length=STEPS)

    state2, _ = env.reset(jax.random.PRNGKey(11))

    def timed_state(tag, runner, st):
        st, s = runner(st)
        _ = float(jnp.sum(s))
        t0 = time.perf_counter()
        for _i in range(RUNS):
            st, s = runner(st)
        _ = float(jnp.sum(s))
        dt = time.perf_counter() - t0
        r = E * STEPS * RUNS / dt
        print(f"RESULT {tag:14s} {r:12,.0f} env-steps/s "
              f"({1e6 * E / r:6.0f} us/step)", flush=True)

    timed_state("env_const_act", run_const_act, state2)

    env_nr = make_gpe_control_env(num_envs=E, grid_size=G, substeps=S,
                                  spectral_solve="fused",
                                  fused_epilogue=True, auto_reset=False,
                                  end_time=1e9)
    state3, _ = env_nr.reset(jax.random.PRNGKey(12))
    timed_rollout("env_no_reset", env_nr.make_rollout(policy, STEPS),
                  state3, 13)


if __name__ == "__main__":
    main()
