"""GPE / RL analysis utilities.

Capability parity with ``/root/reference/pde_opt/rl_utils.py`` (``density``
:10-11, ``detect_vortices`` :19-84).  ``detect_vortices`` is split into a
jit-friendly core (``vortex_winding`` — fixed shapes, usable inside jitted
reward functions over env batches) and the host-side dict wrapper matching
the reference's return surface.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["density", "vortex_winding", "detect_vortices"]

_TWO_PI = 2.0 * jnp.pi


def density(psi):
    return jnp.abs(psi) ** 2


def _wrap_to_pi(x):
    return (x + jnp.pi) % (2 * jnp.pi) - jnp.pi


def vortex_winding(psi, amp_thresh: float = 0.0, tol: float = 0.5):
    """Integer phase-winding per plaquette (jit/vmap-safe, fixed shapes).

    Batch axes lead; the two trailing axes are the periodic grid.
    """
    theta = jnp.angle(psi)
    dth_x = _wrap_to_pi(jnp.roll(theta, -1, axis=-1) - theta)
    dth_y = _wrap_to_pi(jnp.roll(theta, -1, axis=-2) - theta)
    circulation = (
        dth_x + jnp.roll(dth_y, -1, axis=-1) - jnp.roll(dth_x, -1, axis=-2) - dth_y
    )
    n_float = circulation / _TWO_PI
    n_int = jnp.rint(n_float).astype(jnp.int32)
    n_int = jnp.where(jnp.abs(n_float) >= tol, n_int, 0)
    if amp_thresh > 0.0:
        rho = jnp.abs(psi) ** 2
        rho_cell = 0.25 * (
            rho
            + jnp.roll(rho, -1, axis=-2)
            + jnp.roll(rho, -1, axis=-1)
            + jnp.roll(rho, (-1, -1), axis=(-2, -1))
        )
        n_int = jnp.where(rho_cell >= amp_thresh, n_int, 0)
    return n_int


def detect_vortices(psi, amp_thresh: float = 0.0, tol: float = 0.5):
    """Host-side vortex census with the reference's return dict surface."""
    n_int = np.asarray(vortex_winding(psi, amp_thresh=amp_thresh, tol=tol))
    idx = np.argwhere(n_int != 0)
    charges = n_int[n_int != 0]
    positions = idx.astype(np.float32) + 0.5
    return {
        "winding": n_int,
        "positions": positions,
        "charges": charges,
        "num_vortices": idx.shape[0],
        "total_topological_charge": int(charges.sum()),
        "abs_charge_count": int(np.abs(charges).sum()),
    }
