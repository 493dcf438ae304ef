"""Initial-condition builders.

Capability parity with
``/root/reference/pde_opt/numerics/utils/initialization_utils.py``
(``initialize_Psi`` :11-34, ``add_vortex_to_wavefunction`` :37-69) —
vectorized (the reference builds the Gaussian blob with a double Python
loop over pixels) plus batched/seeded variants for env fleets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "initialize_Psi",
    "add_vortex_to_wavefunction",
    "random_uniform_field",
    "step_interface",
]


def initialize_Psi(N: int, width: float = 100, vortexnumber: int = 0):
    """Gaussian blob wavefunction, optionally with a central phase winding."""
    i, j = jnp.meshgrid(jnp.arange(N), jnp.arange(N), indexing="ij")
    di = (i - N // 2).astype(jnp.float32)
    dj = (j - N // 2).astype(jnp.float32)
    psi = jnp.exp(-((di / width) ** 2) - (dj / width) ** 2).astype(jnp.complex64)
    if vortexnumber:
        phi = vortexnumber * jnp.arctan2(di, dj)
        psi = psi * jnp.exp(1j * jnp.mod(phi, 2 * jnp.pi))
    return psi


def add_vortex_to_wavefunction(psi, vortex_pos, vortex_strength: int = 1,
                               vortex_width: float = 1):
    """Imprint a vortex (phase winding + smooth core) at ``vortex_pos``."""
    N = psi.shape[0]
    x, y = jnp.meshgrid(jnp.arange(N), jnp.arange(N), indexing="ij")
    r = jnp.sqrt((x - vortex_pos[0]) ** 2 + (y - vortex_pos[1]) ** 2)
    phi = vortex_strength * jnp.arctan2(y - vortex_pos[1], x - vortex_pos[0])
    vortex_phase = jnp.exp(1j * phi)
    core = jnp.tanh(r / vortex_width)
    return psi * (1 - core) + psi * vortex_phase * core


def random_uniform_field(key, shape, mean=0.5, amplitude=0.01, clip=(0.0, 1.0)):
    """Small random perturbation around a mean — the standard CH/AC start."""
    field = mean + amplitude * jax.random.normal(key, shape)
    if clip is not None:
        field = jnp.clip(field, clip[0], clip[1])
    return field


def step_interface(shape, axis: int = 0, low=-1.0, high=1.0):
    """Half-domain step initial condition (the 1D interface test fixture)."""
    n = shape[axis]
    idx = jnp.arange(n)
    mask = (idx < n // 2)
    bshape = [1] * len(shape)
    bshape[axis] = n
    mask = mask.reshape(bshape)
    return jnp.where(mask, low, high) * jnp.ones(shape)
