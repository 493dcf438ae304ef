"""Isolate the GPE env's auto-reset cond cost (follow-up to
profile_gpe_env_overhead: env glue was ~20 us without the cond but
~215 us with it — is that per-step cond overhead, or the reset branch
actually FIRING every step?).

Variants (1024 x 64^2, 10 substeps, random policy, same window):

  ar_endless    auto_reset=True, end_time=1e9  (cond present, episode
                terminations never fire; divergences still can)
  ar_bench      auto_reset=True, end_time=2.0  (the bench config)

Both print the TOTAL terminated count over the timed steps — if
ar_bench terminates ~every step the cost is the reset branch, not the
cond.

Run (TPU): PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_gpe_reset_cost.py
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.envs.presets import make_gpe_control_env

E, G, S = 1024, 64, 10
STEPS, RUNS = 50, 3


def policy(obs, key):
    return jax.random.uniform(key, (E, 1), minval=-1.0, maxval=1.0,
                              dtype=jnp.float32)


def timed_env(tag, env):
    run = env.make_rollout(policy, STEPS)
    state, _ = env.reset(jax.random.PRNGKey(3))
    state, rewards, terms = run(state, jax.random.PRNGKey(4))
    _ = float(jnp.sum(rewards))
    # One trailing fetch only (CLAUDE.md bench discipline): accumulate
    # the termination census as enqueued device scalars, fetch after dt.
    tsums = []
    t0 = time.perf_counter()
    for i in range(RUNS):
        state, rewards, terms = run(state, jax.random.PRNGKey(5 + i))
        tsums.append(jnp.sum(terms))
    _ = float(jnp.sum(rewards))
    dt = time.perf_counter() - t0
    nterm = float(sum(float(t) for t in tsums))
    rate = E * STEPS * RUNS / dt
    print(f"RESULT {tag:12s} {rate:12,.0f} env-steps/s "
          f"({1e6 * E / rate:6.0f} us/step)  "
          f"terminated={nterm:.0f}/{E * STEPS * RUNS} env-steps",
          flush=True)


def main():
    timed_env("ar_endless", make_gpe_control_env(
        num_envs=E, grid_size=G, substeps=S, spectral_solve="fused",
        fused_epilogue=True, auto_reset=True, end_time=1e9))
    timed_env("ar_bench", make_gpe_control_env(
        num_envs=E, grid_size=G, substeps=S, spectral_solve="fused",
        fused_epilogue=True, auto_reset=True))


if __name__ == "__main__":
    main()
