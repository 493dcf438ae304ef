"""Rollout-length sweep for the PPO end-to-end bench config (TPU).

Measures trained env-steps/s at several rollout lengths T (same total
batch-per-update B*T scaling, same epochs/minibatches) to find whether the
T=16 bench point underamortizes the fixed per-update cost.  Prints one
RESULT line per config.
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.envs import make_cahn_hilliard_control_env
from pde_opt_tpu.rl import ActorCriticConv, PPOConfig, ppo_train

B = 4096


def run(T, epochs=2, minibatches=4):
    env = make_cahn_hilliard_control_env(
        num_envs=B, grid_size=64, substeps=10, derivs="pallas",
        vectorized_control=True, spectral_solve="fused", obs_downsample=4,
    )
    net = ActorCriticConv(action_dim=1, channels=(16, 32), features=64,
                          compute_dtype=jnp.bfloat16,
                          key=jax.random.PRNGKey(70))
    cfg = PPOConfig(rollout_steps=T, epochs=epochs, minibatches=minibatches,
                    lr=3e-4)
    times = []
    ppo_train(env, net, cfg, num_updates=8, key=jax.random.PRNGKey(71),
              log_fn=lambda u, m: times.append(time.perf_counter()))
    dt = (times[-1] - times[1]) / (len(times) - 2)
    rate = T * B / dt
    print(f"RESULT T={T} epochs={epochs} mb={minibatches} "
          f"update_ms={1e3 * dt:.1f} trained_env_steps_per_s={rate:.0f}",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for T in (16, 32, 64):
        run(T)
