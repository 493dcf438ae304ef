"""Same-window A/B: flagship fleet with vs without the fused env epilogue.

Measures the 4096x64^2 CH control fleet rollout rate (the driver north-star
config) twice in one process — epilogue OFF (XLA reward/isfinite/obs passes)
then ON (stats+obs emitted by the Pallas macro) — so relay health variance
cancels.  Prints RESULT lines; run on the TPU relay:

    python scripts/ab_flagship_epilogue.py > /tmp/ab_epi.log 2>&1
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env

NUM_ENVS = 4096
GRID = 64
SUBSTEPS = 10
STEPS = 100
TIMED_RUNS = 3


def rate_for(env, key0):
    def policy(obs, key):
        return jax.random.uniform(key, (NUM_ENVS, 1), minval=-1.0,
                                  maxval=1.0, dtype=jnp.float32)

    run = env.make_rollout(policy, STEPS)
    state, _ = env.reset(jax.random.PRNGKey(key0))
    state, rewards, terms = run(state, jax.random.PRNGKey(key0 + 1))
    _ = float(jnp.sum(rewards))          # warm + sync
    t0 = time.perf_counter()
    for i in range(TIMED_RUNS):
        state, rewards, terms = run(state, jax.random.PRNGKey(key0 + 2 + i))
    _ = float(jnp.sum(rewards))
    dt = time.perf_counter() - t0
    ok = bool(jnp.isfinite(rewards).all())
    return NUM_ENVS * STEPS * TIMED_RUNS / dt, ok


def main():
    results = {}
    for tag, ep in (("off", False), ("on", True), ("off2", False),
                    ("on2", True)):
        env = make_cahn_hilliard_control_env(
            num_envs=NUM_ENVS, grid_size=GRID, substeps=SUBSTEPS,
            derivs="pallas", vectorized_control=True,
            spectral_solve="fused", fused_epilogue=ep,
        )
        r, ok = rate_for(env, 11 if ep else 3)
        results[tag] = r
        print(f"RESULT {tag}: {r:,.0f} env-steps/s finite={ok}", flush=True)
    on = max(results.get("on", 0), results.get("on2", 0))
    off = max(results.get("off", 0), results.get("off2", 0))
    if off:
        print(f"RESULT speedup: {on / off:.3f}x (best-of-2 each)", flush=True)


if __name__ == "__main__":
    main()
