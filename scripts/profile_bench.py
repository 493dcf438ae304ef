"""Component-level timing of the flagship bench hot loop on the real chip.

Times each piece of the 64x64 CH control env step in isolation so we know
what to optimize: fused Pallas RHS, dense/separable/FFT spectral solve,
auto-reset machinery, obs/reward, full step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NUM_ENVS = 4096
GRID = 64
SUBSTEPS = 10


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # force completion (block_until_ready unreliable on relay runtimes)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print("device:", dev, dev.device_kind if hasattr(dev, "device_kind") else "")

    from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env
    from pde_opt_tpu.ops.dft import (
        make_dense_spectral_solve,
        make_separable_spectral_solve,
    )
    from pde_opt_tpu.ops.fused import make_ch_rhs_fd_fused

    key = jax.random.PRNGKey(0)
    u = 0.5 + 0.01 * jax.random.normal(key, (NUM_ENVS, GRID, GRID), jnp.float32)
    kap = jnp.full((NUM_ENVS,), 0.004, jnp.float32)

    hx = hy = 0.01
    # 1. Pallas fused RHS
    rhs = make_ch_rhs_fd_fused(lambda c: c**3 - c, lambda c: jnp.ones_like(c), hx, hy)
    f = jax.jit(lambda u, k: rhs(u, k))
    t = timeit(f, u, kap)
    print(f"pallas rhs:            {t*1e3:8.3f} ms/call  ({t*1e3/1:.3f} ms/substep-equiv)")

    # 2. dense solve (bf16_sqrt, as bench uses)
    kx = np.fft.fftfreq(GRID, hx)
    ky = np.fft.fftfreq(GRID, hy)
    KX, KY = np.meshgrid(kx, ky, indexing="ij")
    symbol = 0.01 * ((2 * np.pi * KX) ** 2 + (2 * np.pi * KY) ** 2) ** 2
    dt = 0.001
    denom = 1.0 / (1.0 + 0.5 * dt * symbol)
    solve_sqrt = make_dense_spectral_solve((GRID, GRID), denom, dtype="bf16_sqrt")
    t = timeit(jax.jit(solve_sqrt), u)
    print(f"dense solve bf16_sqrt: {t*1e3:8.3f} ms/call")
    solve_flat = make_dense_spectral_solve((GRID, GRID), denom, dtype="bf16")
    t = timeit(jax.jit(solve_flat), u)
    print(f"dense solve bf16 flat: {t*1e3:8.3f} ms/call")

    # 3. separable solve
    sep = make_separable_spectral_solve((GRID, GRID), dtype="bf16")
    denom_j = jnp.asarray(denom, jnp.float32)
    t = timeit(jax.jit(lambda x: sep(x, denom_j)), u)
    print(f"separable solve bf16:  {t*1e3:8.3f} ms/call")

    # 4. XLA FFT solve
    def fft_solve(x):
        return jnp.fft.irfft2(
            jnp.fft.rfft2(x) / (1.0 + 0.5 * dt * jnp.asarray(
                symbol[:, : GRID // 2 + 1], jnp.float32)), s=(GRID, GRID)
        )
    t = timeit(jax.jit(fft_solve), u)
    print(f"XLA rfft2 solve:       {t*1e3:8.3f} ms/call")

    # 5. full substep (rhs + dense solve + axpy)
    def substep(y, k):
        f0 = rhs(y, k)
        return y + dt * solve_sqrt(f0)
    t = timeit(jax.jit(substep), u, kap)
    print(f"one substep:           {t*1e3:8.3f} ms")

    # 6. 10 fused substeps (scan)
    def macro(y, k):
        def body(yy, _):
            return substep(yy, k), None
        y1, _ = jax.lax.scan(body, y, None, length=SUBSTEPS)
        return y1
    t = timeit(jax.jit(macro), u, kap)
    print(f"{SUBSTEPS} substeps (scan):    {t*1e3:8.3f} ms")

    # 7. env overhead pieces
    obs_fn = jax.jit(lambda y: jnp.clip(y * 255.0, 0, 255).astype(jnp.uint8))
    t = timeit(obs_fn, u)
    print(f"obs (uint8):           {t*1e3:8.3f} ms")
    rew_fn = jax.jit(lambda y: -jnp.var(y.reshape(y.shape[0], -1), axis=1))
    t = timeit(rew_fn, u)
    print(f"reward (var):          {t*1e3:8.3f} ms")
    fin_fn = jax.jit(lambda y: jnp.isfinite(y).reshape(y.shape[0], -1).all(axis=1))
    t = timeit(fin_fn, u)
    print(f"isfinite mask:         {t*1e3:8.3f} ms")
    keys = jax.random.split(key, NUM_ENVS)
    reset_fn = jax.jit(lambda ks: jax.vmap(
        lambda kk: 0.5 + 0.01 * jax.random.normal(kk, (GRID, GRID)))(ks))
    t = timeit(reset_fn, keys)
    print(f"reset RNG (4096x64^2): {t*1e3:8.3f} ms")

    # 8. full env step as shipped
    env = make_cahn_hilliard_control_env(
        num_envs=NUM_ENVS, grid_size=GRID, substeps=SUBSTEPS, derivs="pallas",
        vectorized_control=True, spectral_solve="dense",
    )
    state, _ = env.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((NUM_ENVS, 1), jnp.float32)
    step = jax.jit(env._step_impl)

    def full(s, a):
        return step(s, a)
    for _ in range(2):
        state2, obs, rr, te, tr, info = full(state, actions)
    jax.block_until_ready(rr)
    t0 = time.perf_counter()
    n = 20
    st = state
    for _ in range(n):
        st, obs, rr, te, tr, info = full(st, actions)
    _ = float(jnp.sum(rr))
    t = (time.perf_counter() - t0) / n
    print(f"full env step:         {t*1e3:8.3f} ms  -> {NUM_ENVS/t:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
