"""Fused GPE Strang cas kernel vs its FFT oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pde_opt_tpu.ops.gpe_cas import (
    gpe_strang_fast_reference,
    make_gpe_strang_cas_macro,
)


def _setup(B=4, N=32, L=16.0, seed=0):
    dx = L / N
    x = np.linspace(-L / 2 + dx / 2, L / 2 - dx / 2, N)
    X, Y = np.meshgrid(x, x, indexing="ij")
    V = 0.5 * (X**2 + Y**2)
    rng = np.random.default_rng(seed)
    psi = np.exp(-(X**2 + Y**2) / 4.0)[None] * (
        1 + 0.05 * rng.standard_normal((B, N, N))
    )
    psi = psi / np.sqrt(
        (np.abs(psi) ** 2).sum(axis=(1, 2), keepdims=True) * dx * dx
    )
    y0 = jnp.stack(
        [jnp.asarray(psi, jnp.float32), jnp.zeros((B, N, N), jnp.float32)],
        axis=-1,
    )
    ctrl = jnp.asarray(
        np.broadcast_to(2.0 * np.exp(-(X**2 + Y**2)), (B, N, N)), jnp.float32
    )
    return V, dx, y0, ctrl


def test_gpe_cas_macro_matches_oracle():
    V, dx, y0, ctrl = _setup()
    g, dt, n = 100.0, 1e-3, 5
    N = y0.shape[1]
    macro = make_gpe_strang_cas_macro(V, g, N, N, dx, dt, n,
                                      mats_dtype=jnp.float32, interpret=True)
    ref = gpe_strang_fast_reference(V, g, dx, dt, n)
    out, exp = macro(y0, ctrl), ref(y0, ctrl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp),
                               rtol=0, atol=5e-6)
    # every emitted state sits exactly on the unit-norm manifold
    norms = jnp.sum(out[..., 0] ** 2 + out[..., 1] ** 2, axis=(1, 2)) * dx**2
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-5)


def test_gpe_cas_macro_grads_match_oracle():
    V, dx, y0, ctrl = _setup(seed=1)
    g, dt, n = 100.0, 1e-3, 3
    N = y0.shape[1]
    macro = make_gpe_strang_cas_macro(V, g, N, N, dx, dt, n,
                                      mats_dtype=jnp.float32, interpret=True)
    ref = gpe_strang_fast_reference(V, g, dx, dt, n)
    gy_f, gc_f = jax.grad(
        lambda yy, cc: jnp.sum(macro(yy, cc) ** 2), argnums=(0, 1)
    )(y0, ctrl)
    gy_r, gc_r = jax.grad(
        lambda yy, cc: jnp.sum(ref(yy, cc) ** 2), argnums=(0, 1)
    )(y0, ctrl)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r),
                               rtol=1e-4, atol=1e-8)


def test_gpe_cas_macro_ragged_batch():
    V, dx, y0, ctrl = _setup(B=5, seed=2)  # 5 envs vs pack=16 at 32x32
    g, dt, n = 100.0, 1e-3, 2
    N = y0.shape[1]
    macro = make_gpe_strang_cas_macro(V, g, N, N, dx, dt, n,
                                      mats_dtype=jnp.float32, interpret=True)
    ref = gpe_strang_fast_reference(V, g, dx, dt, n)
    np.testing.assert_allclose(np.asarray(macro(y0, ctrl)),
                               np.asarray(ref(y0, ctrl)),
                               rtol=0, atol=5e-6)


def test_gpe_cas_phase_poly_matches_exact_over_domain():
    """The degree-7 phase polynomials match hardware sin/cos to f32 over the
    whole |theta| <= 0.7 domain the Strang scheme is meaningful on (here
    theta = dt*w reaches ~0.5 via a large control potential)."""
    V, dx, y0, ctrl = _setup(seed=3)
    g, dt, n = 100.0, 5e-3, 3          # 5x the usual dt -> theta up to ~0.5
    N = y0.shape[1]
    poly = make_gpe_strang_cas_macro(V, g, N, N, dx, dt, n,
                                     mats_dtype=jnp.float32, interpret=True,
                                     phase_poly=True)
    exact = make_gpe_strang_cas_macro(V, g, N, N, dx, dt, n,
                                      mats_dtype=jnp.float32, interpret=True,
                                      phase_poly=False)
    np.testing.assert_allclose(np.asarray(poly(y0, ctrl)),
                               np.asarray(exact(y0, ctrl)),
                               rtol=0, atol=2e-6)
