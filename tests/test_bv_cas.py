"""Fused Butler-Volmer cas kernel vs its roll-stencil RK4 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_opt_tpu.ops.bv_cas import bv_cc_reference, make_bv_cc_fused_macro

CLIP = lambda c: jnp.clip(c, 1e-4, 1 - 1e-4)
MU = lambda c: jnp.log(CLIP(c) / (1 - CLIP(c))) + 3.0 * (1.0 - 2.0 * c)
J0 = lambda c: jnp.sqrt(jnp.clip(c * (1 - c), 1e-6, None))


def _setup(B=5, N=16, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(np.clip(0.1 + 0.01 * rng.standard_normal((B, N, N)),
                            0.01, 0.99), jnp.float32)
    crate = jnp.linspace(0.5, 2.0, B)
    return u, crate


def test_bv_cas_macro_matches_oracle():
    u, crate = _setup()
    N = u.shape[1]
    h = 1.0 / N
    kappa, dt, n = 5e-4, 5e-4, 4
    macro = make_bv_cc_fused_macro(MU, J0, kappa, N, N, h, h, dt, n,
                                   mats_dtype=jnp.float32, interpret=True)
    ref = bv_cc_reference(MU, J0, kappa, h, h, dt, n)
    np.testing.assert_allclose(np.asarray(macro(u, crate)),
                               np.asarray(ref(u, crate)),
                               rtol=0, atol=2e-5)


def test_bv_cas_macro_charging_rate_is_galvanostatic():
    """d<c>/dt must equal Crate/area per env (area = 1 here)."""
    u, crate = _setup(B=3, seed=1)
    N = u.shape[1]
    h = 1.0 / N
    dt, n = 5e-4, 10
    macro = make_bv_cc_fused_macro(MU, J0, 5e-4, N, N, h, h, dt, n,
                                   mats_dtype=jnp.float32, interpret=True)
    u1 = macro(u, crate)
    rate = np.asarray((u1.mean(axis=(-2, -1)) - u.mean(axis=(-2, -1)))
                      / (dt * n))
    np.testing.assert_allclose(rate, np.asarray(crate), rtol=0.02)


@pytest.mark.slow
def test_bv_cas_macro_grads_match_oracle():
    u, crate = _setup(B=2, seed=2)
    N = u.shape[1]
    h = 1.0 / N
    macro = make_bv_cc_fused_macro(MU, J0, 5e-4, N, N, h, h, 5e-4, 2,
                                   mats_dtype=jnp.float32, interpret=True)
    ref = bv_cc_reference(MU, J0, 5e-4, h, h, 5e-4, 2)
    gu_f, gc_f = jax.grad(lambda a, b: jnp.sum(macro(a, b) ** 2),
                          argnums=(0, 1))(u, crate)
    gu_r, gc_r = jax.grad(lambda a, b: jnp.sum(ref(a, b) ** 2),
                          argnums=(0, 1))(u, crate)
    np.testing.assert_allclose(np.asarray(gu_f), np.asarray(gu_r),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc_f), np.asarray(gc_r),
                               rtol=1e-4, atol=1e-8)


def test_fused_bv_stepper_rejects_non_half_alpha():
    """The closed-form closure only exists at alpha = 1/2."""
    import pytest

    from pde_opt_tpu.grid import Domain
    from pde_opt_tpu.ops.steppers import FusedButlerVolmer

    domain = Domain((16, 16), ((-0.5, 0.5), (-0.5, 0.5)))
    with pytest.raises(ValueError, match="alpha"):
        FusedButlerVolmer(kappa=5e-4, mu=MU, j0=J0, alpha=0.3,
                          Crate=1.0, domain=domain)


def test_bv_cas_macro_non_divisor_grid_packs():
    """48² (the reference BV notebooks' grid): 48 does not divide 128, so
    it packs 2x2 envs at 96-deep contractions — previously a hard error.
    Must still match the roll-stencil oracle exactly."""
    B, N = 5, 48
    rng = np.random.default_rng(3)
    u = jnp.asarray(np.clip(0.1 + 0.01 * rng.standard_normal((B, N, N)),
                            0.01, 0.99), jnp.float32)
    crate = jnp.linspace(0.5, 2.0, B)
    h = 1.0 / N
    kappa, dt, n = 5e-4, 5e-4, 2
    macro = make_bv_cc_fused_macro(MU, J0, kappa, N, N, h, h, dt, n,
                                   mats_dtype=jnp.float32, interpret=True)
    ref = bv_cc_reference(MU, J0, kappa, h, h, dt, n)
    np.testing.assert_allclose(np.asarray(macro(u, crate)),
                               np.asarray(ref(u, crate)),
                               rtol=0, atol=2e-5)


def test_ch_cas_macro_non_divisor_grid_packs():
    """Same relaxation for the CH cas kernel (24 packs 5x5 -> 120-deep)."""
    from pde_opt_tpu.ops.cas_spectral import make_ch_cas_fused_macro
    from pde_opt_tpu.ops.fused_spectral import ch_sif_macro_reference

    B, N = 7, 24
    mu = lambda c: c**3 - c
    u = 0.5 + 0.05 * jax.random.normal(jax.random.PRNGKey(4), (B, N, N),
                                       jnp.float32)
    kappa = jnp.linspace(0.002, 0.01, B)
    h = 0.01
    macro = make_ch_cas_fused_macro(mu, N, N, h, h, 1.0, 1e-4, 3,
                                    mats_dtype=jnp.float32, interpret=True)
    ref = ch_sif_macro_reference(mu, h, h, 1.0, 1e-4, 3)
    np.testing.assert_allclose(np.asarray(macro(u, kappa)),
                               np.asarray(ref(u, kappa)),
                               rtol=0, atol=5e-5)
