"""Rollout-length / policy sweep for the PPO end-to-end bench config (TPU).

Measures trained env-steps/s at several rollout lengths T (same
epochs/minibatches) and for both policy torsos (conv = SB3 CnnPolicy
parity; mlp = the TPU-native flattened-MLP fast path).  Timing is
fetch-free: back-to-back jitted train steps with one trailing scalar
fetch (`ppo_train`'s per-update metrics device_get costs a relay
round-trip each — that is logging, not training).  Prints one RESULT
line per config.
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.envs import make_cahn_hilliard_control_env
from pde_opt_tpu.rl import (ActorCriticConv, ActorCriticMLP, PPOConfig,
                            make_ppo_train_step)

B = 4096
N_UPD = 6


def run(T, policy="mlp", epochs=2, minibatches=4):
    env = make_cahn_hilliard_control_env(
        num_envs=B, grid_size=64, substeps=10, derivs="pallas",
        vectorized_control=True, spectral_solve="fused", obs_downsample=4,
    )
    if policy == "mlp":
        net = ActorCriticMLP(action_dim=1, in_features=256, widths=(256,),
                             features=64, compute_dtype=jnp.bfloat16,
                             key=jax.random.PRNGKey(70))
    else:
        net = ActorCriticConv(action_dim=1, channels=(16, 32), features=64,
                              compute_dtype=jnp.bfloat16,
                              key=jax.random.PRNGKey(70))
    cfg = PPOConfig(rollout_steps=T, epochs=epochs, minibatches=minibatches,
                    lr=3e-4)
    train_step, optimizer = make_ppo_train_step(env, cfg)
    params, opt_state = net, optimizer.init(net)
    key = jax.random.PRNGKey(71)
    env_state, _ = env.reset(jax.random.PRNGKey(72))
    for _ in range(2):
        params, opt_state, env_state, key, metrics = train_step(
            params, opt_state, env_state, key)
    _ = float(metrics["reward_mean"])
    t0 = time.perf_counter()
    for _ in range(N_UPD):
        params, opt_state, env_state, key, metrics = train_step(
            params, opt_state, env_state, key)
    _ = float(metrics["reward_mean"])
    dt = (time.perf_counter() - t0) / N_UPD
    print(f"RESULT policy={policy} T={T} epochs={epochs} mb={minibatches} "
          f"update_ms={1e3 * dt:.1f} trained_env_steps_per_s={T * B / dt:.0f}",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for T in (32, 64, 128, 256):
        run(T, "mlp")
    run(64, "conv")
