"""Correctness + perf check of the cas (Hartley) fused macro kernel on chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pde_opt_tpu.ops.cas_spectral import (
    ch_cas_macro_reference,
    make_ch_cas_fused_macro,
)
from pde_opt_tpu.ops.fused_spectral import make_ch_sif_fused_macro

B, H, W = 4096, 64, 64
hx = hy = 0.01
A, dt, n = 1.0, 1e-3, 10
mu = lambda c: c**3 - c

key = jax.random.PRNGKey(0)
u = 0.5 + 0.01 * jax.random.normal(key, (B, H, W), jnp.float32)
kap = jnp.linspace(0.002, 0.01, B)

# correctness vs FFT reference (small slice, f32 mats then bf16)
for mats, tol in [(jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)]:
    fused = make_ch_cas_fused_macro(mu, H, W, hx, hy, A, dt, n, mats_dtype=mats)
    ref = ch_cas_macro_reference(mu, hx, hy, A, dt, n)
    out = jax.jit(fused)(u[:64], kap[:64])
    expect = jax.jit(ref)(u[:64], kap[:64])
    err = float(jnp.max(jnp.abs(out - expect)))
    rel = err / float(jnp.max(jnp.abs(expect - u[:64])) + 1e-30)
    print(f"mats={mats.__name__}: max abs err={err:.3e}  rel-to-increment={rel:.3e}")
    assert err < tol, (mats, err)

# long-rollout stability at the kappa cap (the regime that broke flat bf16)
fused = make_ch_cas_fused_macro(mu, H, W, hx, hy, A, dt, n)
u_s = u[:256]
kap_cap = jnp.full((256,), 0.01)
step = jax.jit(lambda x: fused(x, kap_cap))
x = u_s
for i in range(200):  # 2000 substeps
    x = step(x)
x = jax.block_until_ready(x)
fin = bool(jnp.isfinite(x).all())
print(f"stability 2000 substeps @ kappa=cap: finite={fin} "
      f"range=[{float(x.min()):.3f},{float(x.max()):.3f}]")
assert fin

# perf: full batch macro-step, cas vs packed-DFT kernel
for name, mk in [
    ("cas", make_ch_cas_fused_macro(mu, H, W, hx, hy, A, dt, n)),
    ("dft", make_ch_sif_fused_macro(mu, H, W, hx, hy, A, dt, n)),
]:
    macro = jax.jit(mk)
    xx = macro(u, kap)
    jax.block_until_ready(xx)
    N_IT = 20
    t0 = time.perf_counter()
    x = u
    for _ in range(N_IT):
        x = macro(x, kap)
    _ = float(jnp.sum(x))
    el = (time.perf_counter() - t0) / N_IT
    print(f"{name} fused macro ({n} substeps, {B}x{H}x{W}): {el*1e3:.3f} ms "
          f"-> {B/el:,.0f} env-steps/s")
