"""Sweep CAS kernel block sizes / dtypes on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

NUM_ENVS, GRID, SUBSTEPS = 4096, 64, 10

def timeit(fn, *args, n=30, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n

def main():
    from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro
    key = jax.random.PRNGKey(0)
    u = 0.5 + 0.01 * jax.random.normal(key, (NUM_ENVS, GRID, GRID), jnp.float32)
    kap = jnp.full((NUM_ENVS,), 0.004, jnp.float32)
    pack = (128 // GRID) ** 2
    for bb4 in (8, 16, 32, 64, 128):
        be = pack * bb4
        if NUM_ENVS % be:
            continue
        try:
            m = jax.jit(make_ch_cas_fused_macro(
                lambda c: c**3 - c, GRID, GRID, 0.01, 0.01, 1.0, 1e-3,
                SUBSTEPS, block_envs=be))
            t = timeit(m, u, kap)
            print(f"bb4={bb4:4d} (block_envs={be:5d}): {t*1e3:7.3f} ms  "
                  f"{NUM_ENVS/t:,.0f} env-steps/s")
        except Exception as e:
            print(f"bb4={bb4}: FAILED {type(e).__name__}: {str(e)[:120]}")

if __name__ == "__main__":
    main()
