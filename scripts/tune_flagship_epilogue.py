"""TPU tuning probe for the epilogue flagship: where do the last ~0.34 ms go?

Stages (all same process / health window, 4096x64^2, 10 substeps):
  1. bare macro_ep (kernel+epilogue only, scan of N macro calls)
  2. env rollout auto_reset=False (no reset cond)
  3. env rollout auto_reset=True  (the bench config)
  4. block_envs sweep on the full env rollout

Run: PYTHONPATH=/root/repo python scripts/tune_flagship_epilogue.py
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env
from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro_ep

B, N, S, STEPS, RUNS = 4096, 64, 10, 100, 3


def report(tag, rate):
    print(f"RESULT {tag}: {rate:,.0f} env-steps/s "
          f"({1e6 * B / rate:.0f} us/step)", flush=True)


def bare_macro():
    from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro

    u0 = 0.5 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, N, N),
                                        jnp.float32)
    kap = jnp.full((B,), 4e-3, jnp.float32)

    def timed(tag, run):
        u, s = run(u0)
        _ = float(jnp.sum(s))
        t0 = time.perf_counter()
        for _i in range(RUNS):
            u, s = run(u)
        _ = float(jnp.sum(s))
        dt = time.perf_counter() - t0
        report(tag, B * STEPS * RUNS / dt)

    plain = make_ch_cas_fused_macro(
        lambda c: c**3 - c, N, N, 0.01, 0.01, 1.0, 1e-3, S)

    @jax.jit
    def run_plain(u):
        def body(uu, _):
            y = plain(uu, kap)
            return y, y[0, 0]
        return jax.lax.scan(body, u, None, length=STEPS)

    timed("bare_plain", run_plain)

    macro = make_ch_cas_fused_macro_ep(
        lambda c: c**3 - c, N, N, 0.01, 0.01, 1.0, 1e-3, S,
        stats_center=0.5,
    )

    @jax.jit
    def run(u):
        def body(uu, _):
            y, s, o = macro(uu, kap)
            return y, s[:, 0]
        return jax.lax.scan(body, u, None, length=STEPS)

    timed("bare_macro_ep", run)


def env_rate(tag, **kw):
    env = make_cahn_hilliard_control_env(
        num_envs=B, grid_size=N, substeps=S, derivs="pallas",
        vectorized_control=True, spectral_solve="fused", **kw,
    )

    def policy(obs, key):
        return jax.random.uniform(key, (B, 1), minval=-1.0, maxval=1.0,
                                  dtype=jnp.float32)

    run = env.make_rollout(policy, STEPS)
    state, _ = env.reset(jax.random.PRNGKey(3))
    state, rewards, _ = run(state, jax.random.PRNGKey(4))
    _ = float(jnp.sum(rewards))
    t0 = time.perf_counter()
    for i in range(RUNS):
        state, rewards, _ = run(state, jax.random.PRNGKey(5 + i))
    _ = float(jnp.sum(rewards))
    dt = time.perf_counter() - t0
    report(tag, B * STEPS * RUNS / dt)


def main():
    bare_macro()
    env_rate("env_no_autoreset", auto_reset=False)
    env_rate("env_autoreset", auto_reset=True)
    # block sweep (env rollout, auto_reset on): solver block_envs knob
    for be in (32, 64, 128):
        try:
            env = make_cahn_hilliard_control_env(
                num_envs=B, grid_size=N, substeps=S, derivs="pallas",
                vectorized_control=True, spectral_solve="fused",
            )
            env.solver_parameters = {"A": 1.0, "block_envs": be}
            env._step = jax.jit(env._step_impl, donate_argnums=(0,))

            def policy(obs, key):
                return jax.random.uniform(key, (B, 1), minval=-1.0,
                                          maxval=1.0, dtype=jnp.float32)

            run = env.make_rollout(policy, STEPS)
            state, _ = env.reset(jax.random.PRNGKey(8))
            state, rewards, _ = run(state, jax.random.PRNGKey(9))
            _ = float(jnp.sum(rewards))
            t0 = time.perf_counter()
            for i in range(RUNS):
                state, rewards, _ = run(state, jax.random.PRNGKey(10 + i))
            _ = float(jnp.sum(rewards))
            dt = time.perf_counter() - t0
            report(f"env_block{be}", B * STEPS * RUNS / dt)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT env_block{be}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
