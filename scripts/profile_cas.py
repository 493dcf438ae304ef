"""Time split of the flagship bench: CAS macro kernel vs full env step."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

NUM_ENVS, GRID, SUBSTEPS = 4096, 64, 10

def timeit(fn, *args, n=30, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n

def main():
    print("device:", jax.devices()[0])
    from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro
    from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env

    key = jax.random.PRNGKey(0)
    u = 0.5 + 0.01 * jax.random.normal(key, (NUM_ENVS, GRID, GRID), jnp.float32)
    kap = jnp.full((NUM_ENVS,), 0.004, jnp.float32)
    macro = make_ch_cas_fused_macro(lambda c: c**3 - c, GRID, GRID, 0.01, 0.01,
                                    1.0, 1e-3, SUBSTEPS)
    mj = jax.jit(macro)
    t = timeit(mj, u, kap)
    print(f"CAS macro ({SUBSTEPS} substeps): {t*1e3:8.3f} ms -> {NUM_ENVS/t:,.0f} env-steps/s if alone")

    env = make_cahn_hilliard_control_env(
        num_envs=NUM_ENVS, grid_size=GRID, substeps=SUBSTEPS, derivs="pallas",
        vectorized_control=True, spectral_solve="fused")
    state, _ = env.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((NUM_ENVS, 1), jnp.float32)
    step = jax.jit(env._step_impl)
    t = timeit(lambda s, a: step(s, a)[0].y, state, actions)
    print(f"full env step:              {t*1e3:8.3f} ms -> {NUM_ENVS/t:,.0f} env-steps/s")

    # rollout as the bench drives it (scan over steps, random policy).
    # `run` donates its state arg, so thread the returned state through the
    # warmup + timed calls instead of reusing a deleted donated buffer.
    def policy(obs, key):
        return jax.random.uniform(key, (NUM_ENVS, 1), minval=-1., maxval=1.)
    run = env.make_rollout(policy, 50)
    st, _ = env.reset(jax.random.PRNGKey(0))
    st, rew, _ = run(st, jax.random.PRNGKey(1))  # compile + warmup
    jax.block_until_ready(rew)
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        st, rew, _ = run(st, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(rew)
    t = (time.perf_counter() - t0) / n
    print(f"rollout 50 steps:           {t*1e3:8.3f} ms -> {NUM_ENVS*50/t:,.0f} env-steps/s")

if __name__ == "__main__":
    main()
