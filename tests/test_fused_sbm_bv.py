"""Fused SBM Butler-Volmer Pallas macro vs its roll-stencil RK4 oracle.

Oracle-gates ``make_sbm_bv_fused_macro`` (the default stepper behind the
``make_sbm_butler_volmer_control_env`` preset) the same way
``tests/test_bv_cas.py`` gates the periodic BV kernel: forward parity,
galvanostatic ψ-weighted charging rate, and gradients w.r.t. state and
C-rate, batched.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pde_opt_tpu.ops.sbm_bv import make_sbm_bv_fused_macro, sbm_bv_reference

CLIP = lambda c: jnp.clip(c, 1e-4, 1 - 1e-4)
MU = lambda c: jnp.log(CLIP(c) / (1 - CLIP(c))) + 3.0 * (1.0 - 2.0 * c)
J0 = lambda c: jnp.sqrt(jnp.clip(c * (1 - c), 1e-6, None))


def _psi(N):
    x = (np.arange(N) + 0.5) / N - 0.5
    X, Y = np.meshgrid(x, x, indexing="ij")
    r = np.sqrt(X**2 + Y**2)
    psi = 0.5 * (1.0 + np.tanh((0.35 - r) / 0.06))
    psi = np.where(psi < 0.001, 0.001, psi)
    return np.where(psi > 0.99, 1.0, psi).astype(np.float32)


def _setup(B=5, N=16, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(np.clip(0.1 + 0.01 * rng.standard_normal((B, N, N)),
                            0.01, 0.99), jnp.float32)
    crate = jnp.linspace(0.5, 2.0, B)
    return u, crate, _psi(N)


def test_fused_sbm_bv_matches_oracle():
    u, crate, psi = _setup()
    N = u.shape[1]
    h = 1.0 / N
    kappa, dt, n = 5e-4, 5e-4, 4
    macro = make_sbm_bv_fused_macro(MU, J0, kappa, psi, h, h, dt, n,
                                    interpret=True)
    ref = sbm_bv_reference(MU, J0, kappa, psi, h, h, dt, n)
    np.testing.assert_allclose(np.asarray(macro(u, crate)),
                               np.asarray(ref(u, crate)),
                               rtol=0, atol=2e-5)


def test_fused_sbm_bv_charging_rate_is_galvanostatic():
    """The ψ-weighted mean concentration must charge at Crate/∫ψ per env."""
    u, crate, psi = _setup(B=3, seed=1)
    N = u.shape[1]
    h = 1.0 / N
    dt, n = 5e-4, 10
    macro = make_sbm_bv_fused_macro(MU, J0, 5e-4, psi, h, h, dt, n,
                                    interpret=True)
    u1 = macro(u, crate)
    w = psi / psi.sum()
    pmean = lambda y: np.asarray((np.asarray(y) * w).sum(axis=(-2, -1)))
    rate = (pmean(u1) - pmean(u)) / (dt * n)
    area = float(psi.sum() * h * h)
    np.testing.assert_allclose(rate, np.asarray(crate) / area, rtol=0.02)


@pytest.mark.slow
def test_fused_sbm_bv_grads_match_oracle():
    u, crate, psi = _setup(B=2, seed=2)
    N = u.shape[1]
    h = 1.0 / N
    macro = make_sbm_bv_fused_macro(MU, J0, 5e-4, psi, h, h, 5e-4, 2,
                                    interpret=True)
    ref = sbm_bv_reference(MU, J0, 5e-4, psi, h, h, 5e-4, 2)
    gu_f, gc_f = jax.grad(lambda a, b: jnp.sum(macro(a, b) ** 2),
                          argnums=(0, 1))(u, crate)
    gu_r, gc_r = jax.grad(lambda a, b: jnp.sum(ref(a, b) ** 2),
                          argnums=(0, 1))(u, crate)
    np.testing.assert_allclose(np.asarray(gu_f), np.asarray(gu_r),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r),
                               rtol=1e-5, atol=1e-6)


def test_fused_sbm_bv_small_fleet_not_overpadded():
    """The env block is capped near the fleet size (no 32x padded compute),
    and the padded path still matches the oracle."""
    from pde_opt_tpu.ops.cas_spectral import _pick_block

    u, crate, psi = _setup(B=3, N=32, seed=3)
    h = 1.0 / 32
    macro = make_sbm_bv_fused_macro(MU, J0, 5e-4, psi, h, h, 5e-4, 2,
                                    interpret=True)
    ref = sbm_bv_reference(MU, J0, 5e-4, psi, h, h, 5e-4, 2)
    np.testing.assert_allclose(np.asarray(macro(u, crate)),
                               np.asarray(ref(u, crate)),
                               rtol=0, atol=2e-5)
    # The uncapped packed block would be large; a 3-env fleet pads only to
    # one packed row (16 envs at 32²), not the full VMEM-derived block.
    assert _pick_block(128, 128, live_buffers=12) >= 8


def test_fused_sbm_bv_long_macro_uses_loop_and_matches():
    """n_steps > 16 takes the in-kernel fori_loop path; parity holds."""
    u, crate, psi = _setup(B=2, N=16, seed=4)
    h = 1.0 / 16
    macro = make_sbm_bv_fused_macro(MU, J0, 5e-4, psi, h, h, 2e-4, 20,
                                    interpret=True)
    ref = sbm_bv_reference(MU, J0, 5e-4, psi, h, h, 2e-4, 20)
    np.testing.assert_allclose(np.asarray(macro(u, crate)),
                               np.asarray(ref(u, crate)),
                               rtol=0, atol=5e-5)
