"""Decompose the PPO update: physics vs policy-in-rollout vs learn phase.

Stages (each jitted, timed by back-to-back enqueues + one trailing fetch):
  A. random-policy rollout (physics + obs floor)            [rollout_random]
  B. PPO rollout: policy net in the scan, traj stacked      [rollout_policy]
  C. B + GAE + advantage normalization (no updates)         [rollout_gae]
  D. full train_step (B + C + minibatch epochs + Adam)      [train_step]

D−C = minibatch/optimizer phase; B−A = policy-eval overhead in the scan;
C−B = GAE.  Run on the TPU relay: python scripts/profile_ppo_stages.py
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.envs import make_cahn_hilliard_control_env
from pde_opt_tpu.rl import ActorCriticMLP, PPOConfig
from pde_opt_tpu.rl.ppo import Transition, gae, make_ppo_train_step
from pde_opt_tpu.rl.ppo import _gaussian_sample_logp

B, T, GRID, SUBSTEPS = 4096, 64, 64, 10
REPS = 6


def main():
    env = make_cahn_hilliard_control_env(
        num_envs=B, grid_size=GRID, substeps=SUBSTEPS, derivs="pallas",
        vectorized_control=True, spectral_solve="fused", obs_downsample=4,
    )
    net = ActorCriticMLP(action_dim=1, in_features=256, widths=(256,),
                         features=64, compute_dtype=jnp.bfloat16,
                         key=jax.random.PRNGKey(0))
    cfg = PPOConfig(rollout_steps=T, epochs=2, minibatches=4, lr=3e-4)

    def timed(fn, args, n=REPS, fetch=lambda o: jnp.sum(o[1])):
        out = fn(*args)
        _ = float(fetch(out))
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn(*args)
        _ = float(fetch(out))
        return 1e3 * (time.perf_counter() - t0) / n

    state0, _ = env.reset(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)

    @jax.jit
    def rollout_random(state, key):
        def body(carry, _):
            st, k = carry
            k, ak = jax.random.split(k)
            a = jax.random.uniform(ak, (B, 1), minval=-1., maxval=1.)
            st1, _, r, te, _, _ = env._step_impl(st, a)
            return (st1, k), r
        (state, _), rs = jax.lax.scan(body, (state, key), None, length=T)
        return state, rs

    def make_rollout_policy():
        # Same obs-carry discipline as the shipped rl/ppo.py rollout: the
        # step's returned obs (kernel-emitted under the fused epilogue)
        # feeds the next action — no re-observe in the scan.
        def rollout(params, state, key):
            def body(carry, _):
                st, obs, k = carry
                k, ak = jax.random.split(k)
                dist, v = params(obs)
                a, logp = _gaussian_sample_logp(ak, *dist)
                st1, obs1, r, te, _, _ = env._step_impl(st, a)
                return (st1, obs1, k), Transition(obs, a, logp, v, r, te)
            obs0 = env.state_to_observation_func(state.y)
            (state, last_obs, _), traj = jax.lax.scan(
                body, (state, obs0, key), None, length=T)
            return state, last_obs, traj
        return rollout

    rp = make_rollout_policy()

    @jax.jit
    def rollout_policy(params, state, key):
        state, _, traj = rp(params, state, key)
        return state, traj.reward

    @jax.jit
    def rollout_gae(params, state, key):
        state, last_obs, traj = rp(params, state, key)
        _, last_v = params(last_obs)
        adv, ret = gae(traj.reward, traj.value, traj.done, last_v,
                       cfg.gamma, cfg.lam)
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        return state, adv

    train_step, optimizer = make_ppo_train_step(env, cfg)
    opt_state = optimizer.init(net)

    a = timed(rollout_random, (state0, key))
    state0, _ = env.reset(jax.random.PRNGKey(1))
    b = timed(rollout_policy, (net, state0, key))
    state0, _ = env.reset(jax.random.PRNGKey(1))
    c = timed(rollout_gae, (net, state0, key))
    # train_step donates (opt_state, env_state): thread outputs through.
    state0, _ = env.reset(jax.random.PRNGKey(1))
    params, opt_state, env_state, k = net, opt_state, state0, key
    params, opt_state, env_state, k, metrics = train_step(
        params, opt_state, env_state, k)
    _ = float(metrics["reward_mean"])
    t0 = time.perf_counter()
    for _i in range(REPS):
        params, opt_state, env_state, k, metrics = train_step(
            params, opt_state, env_state, k)
    _ = float(metrics["reward_mean"])
    d = 1e3 * (time.perf_counter() - t0) / REPS

    print(f"RESULT A rollout_random_ms {a:.1f}")
    print(f"RESULT B rollout_policy_ms {b:.1f}  (policy overhead {b-a:+.1f})")
    print(f"RESULT C rollout_gae_ms    {c:.1f}  (gae {c-b:+.1f})")
    print(f"RESULT D train_step_ms     {d:.1f}  (learn phase {d-c:+.1f})")
    print(f"RESULT trained_env_steps_per_s {T*B/(d/1e3):,.0f}")


if __name__ == "__main__":
    main()
