"""Benchmark: env-steps/s on the flagship 64×64 Cahn-Hilliard control fleet.

The driver north-star metric (BASELINE.json): aggregate env-steps/s at
64×64 Cahn-Hilliard, 4096 envs.  One env step = one RL macro-step =
``SUBSTEPS`` fused semi-implicit Fourier-spectral substeps (control update,
physics, reward, observation, auto-reset) — all inside one on-device scan
with zero host round-trips.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N/1e6}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

NUM_ENVS = 4096
GRID = 64
SUBSTEPS = 10
STEPS_PER_RUN = 100
TIMED_RUNS = 3


def main():
    platform = jax.devices()[0].platform
    num_envs = NUM_ENVS
    steps_per_run = STEPS_PER_RUN
    if platform == "cpu":  # keep the CPU fallback tractable; same program
        num_envs = 512
        steps_per_run = 20

    from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env

    derivs = "pallas" if platform != "cpu" else "fd"
    spectral = "fused" if platform != "cpu" else "fft"
    env = make_cahn_hilliard_control_env(
        num_envs=num_envs, grid_size=GRID, substeps=SUBSTEPS, derivs=derivs,
        vectorized_control=True, spectral_solve=spectral,
    )

    def policy(obs, key):
        return jax.random.uniform(
            key, (num_envs, 1), minval=-1.0, maxval=1.0, dtype=jnp.float32
        )

    run = env.make_rollout(policy, steps_per_run)

    state, _ = env.reset(jax.random.PRNGKey(0))
    # Warmup: compile + first execution.
    state, rewards, terms = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(rewards)

    # NOTE: block_until_ready does not reliably block on remote-relay TPU
    # runtimes; force completion with a scalar fetch inside the timed region.
    t0 = time.perf_counter()
    for i in range(TIMED_RUNS):
        state, rewards, terms = run(state, jax.random.PRNGKey(2 + i))
    reward_sum = float(jnp.sum(rewards))
    elapsed = time.perf_counter() - t0

    if not bool(jnp.isfinite(rewards).all()):
        print(json.dumps({"metric": "BENCH INVALID: non-finite rewards",
                          "value": 0.0, "unit": "env-steps/s",
                          "vs_baseline": 0.0}))
        sys.exit(1)

    env_steps = num_envs * steps_per_run * TIMED_RUNS
    rate = env_steps / elapsed
    print(
        json.dumps(
            {
                "metric": (
                    f"env-steps/s, {GRID}x{GRID} Cahn-Hilliard control env "
                    f"({num_envs} envs, {SUBSTEPS} SIF substeps/step, "
                    f"{platform})"
                ),
                "value": round(rate, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(rate / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
