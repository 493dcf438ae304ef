"""Preset environment configurations.

The flagship benchmark config — the driver north star's "64×64 Cahn-Hilliard
control env, 4096 envs" (BASELINE.json) — lives here so bench.py, the graft
entry point, and tests all build exactly the same environment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import grid as gridmod
from ..models.cahn_hilliard import CahnHilliard2DPeriodic
from ..ops.steppers import SemiImplicitFourierSpectral
from .vector_env import VectorPDEEnv

__all__ = ["make_cahn_hilliard_control_env"]


def make_cahn_hilliard_control_env(
    num_envs: int = 4096,
    grid_size: int = 64,
    substeps: int = 10,
    end_time: float = 1.0,
    step_dt: float = 0.01,
    dtype=jnp.float32,
    auto_reset: bool = True,
    derivs: str = "fd",
    vectorized_control: bool = True,
    spectral_solve: str = "fft",
) -> VectorPDEEnv:
    """64×64 Cahn-Hilliard control fleet: the agent drives κ (interface width).

    One RL step = ``substeps`` fused semi-implicit spectral substeps.  The
    observation is the uint8-scaled concentration field; reward is negative
    variance (drive toward uniformity — fighting the spinodal decomposition
    the PDE wants).
    """
    L = 0.01 * grid_size
    domain = gridmod.Domain(
        (grid_size, grid_size), ((-L / 2, L / 2), (-L / 2, L / 2)),
        "dimensionless", dtype=dtype,
    )
    kappa_max = 0.01
    if spectral_solve == "fused":
        # Whole-macro-step Pallas kernel: all substeps VMEM-resident, DFTs
        # as MXU matmuls, per-env kappa in the implicit denominator.  A=1
        # gives deadbeat high-k damping of bf16 rounding noise (see
        # ops/fused_spectral.py).  Fastest path: ~4x the dense-matmul
        # solve at 4096x64^2 on v5e.
        from ..ops.steppers import FusedSemiImplicitSpectral

        solver_type = FusedSemiImplicitSpectral
        solver_parameters = {"A": 1.0}
    elif spectral_solve in ("dense", "dense_bf16"):
        # Fixed-symbol semi-implicit step: the implicit damping uses
        # kappa_max (an upper bound of the control range), so the spectral
        # solve is one shared dense MXU matmul for the whole fleet.
        import numpy as np

        from ..ops.steppers import SemiImplicitDenseSolve

        kx, ky = domain.fft_mesh()
        symbol = kappa_max * (
            (2 * np.pi * kx) ** 2 + (2 * np.pi * ky) ** 2
        ) ** 2
        solver_type = SemiImplicitDenseSolve
        solver_parameters = {
            "A": 0.5,
            "dense_symbol": symbol,
            "points": domain.points,
            "dtype": "bf16_sqrt" if spectral_solve == "dense" else "bf16",
        }
    elif spectral_solve == "fft":
        solver_type = SemiImplicitFourierSpectral
        solver_parameters = {"A": 0.5}
    else:
        raise ValueError(f"unknown spectral_solve: {spectral_solve!r}")
    return VectorPDEEnv(
        equation_type=CahnHilliard2DPeriodic,
        domain=domain,
        solver_type=solver_type,
        end_time=end_time,
        step_dt=step_dt,
        numeric_dt=step_dt / substeps,
        state_to_observation_func=lambda y: jnp.clip(y * 255.0, 0, 255).astype(
            jnp.uint8
        )[..., None, :, :],
        reward_function=lambda y: -jnp.var(y),
        reset_func=lambda domain, key: jnp.clip(
            0.5 + 0.01 * jax.random.normal(key, domain.points, dtype=dtype), 0.0, 1.0
        ),
        # Control range chosen inside the numerically stable region of the
        # SIF stepper at numeric_dt = step_dt/substeps: κ below ~2e-3 at
        # dt=1e-3 on a dx=0.01 grid under-damps the explicit spinodal term
        # and blows up (verified empirically; see tests/test_env.py).
        reset_control_value=jnp.asarray(0.004, dtype),
        update_control_value=lambda off, old: jnp.clip(
            old + 0.0005 * off[..., 0], 0.002, 0.01
        ),
        # Shape the per-env κ so it broadcasts against (B, H, W) fields in
        # the vectorized (no-vmap) fast path; a scalar κ under vmap gains the
        # same trailing axes harmlessly.
        update_control_parameter=lambda old, new: new[..., None, None],
        action_space_config={"type": "continuous", "shape": (1,)},
        static_equation_parameters={
            "mu": lambda c: c**3 - c,
            "D": lambda c: jnp.ones_like(c),
            "derivs": derivs,
        },
        control_equation_parameter_name="kappa",
        solver_parameters=solver_parameters,
        num_envs=num_envs,
        auto_reset=auto_reset,
        vectorized_control=vectorized_control,
    )
