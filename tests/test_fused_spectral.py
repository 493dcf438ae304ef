"""Fused SIF macro-step kernel vs its FFT reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pde_opt_tpu.ops.fused_spectral import (
    ch_sif_macro_reference,
    make_ch_sif_fused_macro,
)


def mu(c):
    return c**3 - c


def test_fused_macro_matches_fft_reference():
    B, H, W = 8, 16, 16
    hx, hy = 0.01, 0.02
    A, dt, n = 1.0, 1e-3, 3
    key = jax.random.PRNGKey(0)
    u = 0.5 + 0.05 * jax.random.normal(key, (B, H, W), jnp.float32)
    kappa = jnp.linspace(0.002, 0.01, B)

    fused = make_ch_sif_fused_macro(
        mu, H, W, hx, hy, A, dt, n, mats_dtype=jnp.float32, interpret=True
    )
    ref = ch_sif_macro_reference(mu, hx, hy, A, dt, n)
    out = fused(u, kappa)
    expect = ref(u, kappa)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0, atol=5e-5)
    # the step must actually move the field
    assert float(jnp.max(jnp.abs(out - u))) > 1e-6


def test_fused_macro_per_env_kappa_differs():
    B, H, W = 4, 16, 16
    u = 0.5 + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, H, W))
    u = u.astype(jnp.float32)
    fused = make_ch_sif_fused_macro(
        mu, H, W, 0.01, 0.01, 1.0, 1e-3, 2,
        mats_dtype=jnp.float32, interpret=True,
    )
    out_lo = fused(u, jnp.full((B,), 0.002))
    out_hi = fused(u, jnp.full((B,), 0.01))
    assert float(jnp.max(jnp.abs(out_lo - out_hi))) > 1e-7


def test_fused_macro_scalar_kappa_and_leading_batch_shapes():
    H, W = 16, 16
    u = 0.5 + 0.05 * jax.random.normal(jax.random.PRNGKey(2), (2, 3, H, W))
    u = u.astype(jnp.float32)
    fused = make_ch_sif_fused_macro(
        mu, H, W, 0.01, 0.01, 1.0, 1e-3, 2,
        mats_dtype=jnp.float32, interpret=True,
    )
    out = fused(u, 0.005)
    assert out.shape == u.shape
    ref = ch_sif_macro_reference(mu, 0.01, 0.01, 1.0, 1e-3, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(u, 0.005)),
                               rtol=0, atol=5e-5)


def test_fused_stepper_through_env():
    from pde_opt_tpu.envs.presets import make_cahn_hilliard_control_env

    env = make_cahn_hilliard_control_env(
        num_envs=4, grid_size=16, substeps=2, spectral_solve="fused",
        vectorized_control=True,
    )
    # force interpret mode on CPU via the stepper default (auto-detected)
    state, obs = env.reset(jax.random.PRNGKey(0))
    actions = jnp.zeros((4, 1), jnp.float32)
    state2, obs2, reward, term, trunc, info = env._step_impl(state, actions)
    assert bool(jnp.isfinite(state2.y).all())
    assert reward.shape == (4,)
    assert float(jnp.max(jnp.abs(state2.y - state.y))) > 0.0


def test_fused_stepper_rejects_nonunit_mobility():
    from pde_opt_tpu.grid import Domain
    from pde_opt_tpu.ops.steppers import FusedSemiImplicitSpectral

    domain = Domain((16, 16), ((0.0, 0.16), (0.0, 0.16)), "dimensionless")
    with pytest.raises(ValueError, match="unit mobility"):
        FusedSemiImplicitSpectral(
            kappa=0.01, mu=mu, D=lambda c: c * (1 - c), domain=domain
        )


def test_fused_ac_macro_matches_fft_reference():
    from pde_opt_tpu.ops.fused_spectral import (
        ac_sif_macro_reference,
        make_ac_sif_fused_macro,
    )

    B, H, W = 6, 16, 16
    hx, hy = 0.01, 0.02
    A, dt, n = 1.0, 1e-4, 3
    R = lambda c: 1.0 + 0.5 * c**2
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (B, H, W))
    u = u.astype(jnp.float32)
    kappa = jnp.linspace(1e-4, 1e-3, B)
    fused = make_ac_sif_fused_macro(
        mu, R, H, W, hx, hy, A, dt, n, mats_dtype=jnp.float32, interpret=True
    )
    ref = ac_sif_macro_reference(mu, R, hx, hy, A, dt, n)
    out = fused(u, kappa)
    expect = ref(u, kappa)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0, atol=5e-5)
    assert float(jnp.max(jnp.abs(out - u))) > 1e-7


def test_fused_ac_stepper_via_evolve():
    from pde_opt_tpu.grid import Domain
    from pde_opt_tpu.models.allen_cahn import AllenCahn2DPeriodic
    from pde_opt_tpu.ops.integrate import evolve
    from pde_opt_tpu.ops.steppers import FusedAllenCahnSpectral
    from pde_opt_tpu.utils.compat import (
        check_equation_solver_compatibility,
        prepare_solver_params,
    )

    domain = Domain((16, 16), ((0.0, 0.16), (0.0, 0.16)), "dimensionless")
    check_equation_solver_compatibility(FusedAllenCahnSpectral,
                                        AllenCahn2DPeriodic)
    eq = AllenCahn2DPeriodic(domain, kappa=jnp.full((4, 1, 1), 1e-4),
                             mu=mu, R=lambda c: jnp.ones_like(c))
    solver = FusedAllenCahnSpectral(
        **prepare_solver_params(FusedAllenCahnSpectral, {"A": 1.0,
                                                         "interpret": True,
                                                         "mats_dtype": jnp.float32},
                                eq)
    )
    u0 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (4, 16, 16))
    u0 = u0.astype(jnp.float32)
    u1 = evolve(solver, eq.rhs, u0, 0.0, 1e-4, 3)
    assert u1.shape == u0.shape
    assert bool(jnp.isfinite(u1).all())
    assert float(jnp.max(jnp.abs(u1 - u0))) > 1e-8


def test_ac_cas_macro_matches_fft_reference():
    """Env-packed cas AC kernel == the AC FFT oracle (spectral lap ==
    roll-stencil lap for periodic fields)."""
    from pde_opt_tpu.ops.cas_spectral import make_ac_cas_fused_macro
    from pde_opt_tpu.ops.fused_spectral import ac_sif_macro_reference

    B, H, W = 6, 16, 16
    hx, hy = 0.01, 0.02
    A, dt, n = 1.0, 1e-4, 3
    R = lambda c: 1.0 + 0.5 * c**2
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (B, H, W))
    u = u.astype(jnp.float32)
    kappa = jnp.linspace(1e-4, 1e-3, B)
    fused = make_ac_cas_fused_macro(
        mu, R, H, W, hx, hy, A, dt, n, mats_dtype=jnp.float32, interpret=True
    )
    ref = ac_sif_macro_reference(mu, R, hx, hy, A, dt, n)
    np.testing.assert_allclose(np.asarray(fused(u, kappa)),
                               np.asarray(ref(u, kappa)), rtol=0, atol=5e-5)


def test_ac_cas_macro_grad_and_ragged_batch():
    from pde_opt_tpu.ops.cas_spectral import make_ac_cas_fused_macro
    from pde_opt_tpu.ops.fused_spectral import ac_sif_macro_reference

    B, H, W = 5, 16, 16  # ragged vs pack=64 at 16x16
    R = lambda c: jnp.ones_like(c)
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (B, H, W))
    u = u.astype(jnp.float32)
    kappa = jnp.full((B,), 5e-4, jnp.float32)
    fused = make_ac_cas_fused_macro(
        mu, R, H, W, 0.01, 0.01, 1.0, 1e-4, 2,
        mats_dtype=jnp.float32, interpret=True,
    )
    ref = ac_sif_macro_reference(mu, R, 0.01, 0.01, 1.0, 1e-4, 2)
    np.testing.assert_allclose(np.asarray(fused(u, kappa)),
                               np.asarray(ref(u, kappa)), rtol=0, atol=5e-5)
    gk_f = jax.grad(lambda kk: jnp.sum(fused(u, kk) ** 2))(kappa)
    gk_r = jax.grad(lambda kk: jnp.sum(ref(u, kk) ** 2))(kappa)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r),
                               rtol=1e-3, atol=1e-7)


def test_ac_cas_macro_r_none_identity_path():
    """R_fn=None selects the 6-matmul identity-R kernel; must equal both
    the oracle and the probed-identity path (R passed as ones)."""
    from pde_opt_tpu.ops.cas_spectral import make_ac_cas_fused_macro
    from pde_opt_tpu.ops.fused_spectral import ac_sif_macro_reference

    B, H, W = 4, 16, 16
    u = 0.1 * jax.random.normal(jax.random.PRNGKey(9), (B, H, W))
    u = u.astype(jnp.float32)
    kappa = jnp.linspace(2e-4, 8e-4, B)
    args = (H, W, 0.01, 0.01, 1.0, 1e-4, 3)
    f_none = make_ac_cas_fused_macro(mu, None, *args,
                                     mats_dtype=jnp.float32, interpret=True)
    f_ones = make_ac_cas_fused_macro(mu, lambda c: jnp.ones_like(c), *args,
                                     mats_dtype=jnp.float32, interpret=True)
    ref = ac_sif_macro_reference(mu, lambda c: jnp.ones_like(c),
                                 0.01, 0.01, 1.0, 1e-4, 3)
    out = f_none(u, kappa)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f_ones(u, kappa)),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(u, kappa)),
                               rtol=0, atol=5e-5)
