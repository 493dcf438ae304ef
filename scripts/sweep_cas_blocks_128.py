"""Block-size sweep for the cas CH macro at 128² and 256² (VERDICT r3 §6).

At 64² the packed kernel runs MFU 0.29 kernel-isolated; at 128² the
bench showed 0.15.  This sweeps ``block_envs`` (the VMEM residency knob)
and ``mats_dtype`` at the larger grids, kernel-isolated (macro only, no
env), reporting field-substeps/s and model MFU per config.

Run on the TPU relay: PYTHONPATH=/root/repo python scripts/sweep_cas_blocks_128.py
"""

import time

import jax
import jax.numpy as jnp

from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro

PEAK = 394e12  # v5e dense bf16 FLOP/s
SUB = 10


def flops_per_substep(N):
    HP = N if N >= 128 else (128 // N) * N
    return 2 * (2 * N * N * (HP + HP))


def rate(N, B, block_envs, mats, runs=8):
    import jax as _jax

    macro = _jax.jit(make_ch_cas_fused_macro(
        lambda c: c**3 - c, N, N, 0.01, 0.01, 1.0, 1e-4, SUB,
        block_envs=block_envs, mats_dtype=mats,
    ))
    u = (0.5 + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, N, N))
         ).astype(jnp.float32)
    kap = jnp.full((B,), 4e-3, jnp.float32)
    out = macro(u, kap)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(runs):
        out = macro(out, kap)
    _ = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    if not bool(jnp.isfinite(out).all()):
        return None
    return B * SUB * runs / dt


def main():
    # 64² first: the same-window calibration anchor (its kernel-isolated
    # MFU is 0.29 by the dispatch-cancelled slope method; whatever THIS
    # naive loop measures for it calibrates the relay window).
    for N, B, blocks in ((64, 4096, (None,)),
                         (128, 1024, (None, 8, 16)),
                         (256, 256, (None, 2, 4))):
        f = flops_per_substep(N)
        for mats in (jnp.bfloat16,):
            for be in blocks:
                try:
                    r = rate(N, B, be, mats)
                except Exception as e:
                    print(f"RESULT N={N} block={be}: ERROR "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                    continue
                if r is None:
                    print(f"RESULT N={N} block={be}: DIVERGED")
                    continue
                mfu = r * f / PEAK
                print(f"RESULT N={N} B={B} block={be} "
                      f"field-substeps/s={r:,.0f} mfu={mfu:.3f}",
                      flush=True)


if __name__ == "__main__":
    main()
