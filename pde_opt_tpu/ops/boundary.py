"""Configurable boundary conditions: periodic / Dirichlet / Neumann per axis.

Restores the reference's ghost API: ``laplacian(dx, boundary_conditions)``
and ``get_neighbor_indices`` are imported by
``/root/reference/notebooks/test_boundary_conditions.ipynb`` (cells 0-7) from
``pde_opt.numerics.utils.{derivatives,boundary_conditions}`` but are absent
from the reference package — the shipped package is periodic-only.  Here the
BC abstraction is first-class: ghost-cell padding on the trailing spatial
axes, batch-transparent, fully jit/vmap/grad-compatible.

Conventions (cell-centered grid):
* ``('periodic', None)`` — wrap-around.
* ``('dirichlet', g)`` — boundary value ``g`` held at the domain *face*;
  ghost cell ``= 2g − u_edge`` (2nd-order).  ``g`` may be a scalar or an
  array broadcastable to the boundary slice.
* ``('neumann', g)`` — outward normal derivative ``g`` at the face; ghost
  ``= u_edge ∓ g·h`` (zero-flux for ``g = 0``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = ["pad_ghost", "laplacian", "get_neighbor_indices"]

BCSpec = Tuple[str, Union[None, float, jnp.ndarray]]


def _ghost_slices(u, axis):
    lo = jnp.take(u, jnp.array([0]), axis=axis)
    hi = jnp.take(u, jnp.array([u.shape[axis] - 1]), axis=axis)
    return lo, hi


def pad_ghost(u, axis: int, h: float, bc: BCSpec):
    """Pad one ghost cell on each side of ``axis`` according to ``bc``."""
    kind, value = bc
    if kind == "periodic":
        lo = jnp.take(u, jnp.array([u.shape[axis] - 1]), axis=axis)
        hi = jnp.take(u, jnp.array([0]), axis=axis)
        return jnp.concatenate([lo, u, hi], axis=axis)
    edge_lo, edge_hi = _ghost_slices(u, axis)
    if kind == "dirichlet":
        g = 0.0 if value is None else value
        ghost_lo = 2.0 * g - edge_lo
        ghost_hi = 2.0 * g - edge_hi
    elif kind == "neumann":
        g = 0.0 if value is None else value
        # outward normal: -x side derivative -g, +x side +g
        ghost_lo = edge_lo - g * h
        ghost_hi = edge_hi + g * h
    else:
        raise ValueError(f"unknown boundary condition kind: {kind!r}")
    ghost_lo = jnp.broadcast_to(ghost_lo, edge_lo.shape)
    ghost_hi = jnp.broadcast_to(ghost_hi, edge_hi.shape)
    return jnp.concatenate([ghost_lo, u, ghost_hi], axis=axis)


def laplacian(dx, boundary_conditions: Dict[int, BCSpec]):
    """Build a Laplacian operator with per-axis boundary conditions.

    Args:
        dx: scalar (1D) or per-axis spacings.
        boundary_conditions: ``{axis_index: (kind, value)}`` with axis indices
            counted over the *spatial* dimensions (0 = first spatial axis).
            Every spatial axis must be present.

    Returns:
        ``lap(u[, t])`` operating on the trailing ``ndim`` axes of ``u``
        (leading axes are batch).
    """
    if np.isscalar(dx):
        dx = (float(dx),)
    dx = tuple(float(h) for h in dx)
    ndim = len(dx)
    if set(boundary_conditions.keys()) != set(range(ndim)):
        raise ValueError(
            f"boundary_conditions must specify every axis 0..{ndim-1}, "
            f"got {sorted(boundary_conditions)}"
        )

    def lap(u, t: Optional[float] = None):
        del t
        out = 0.0
        for d in range(ndim):
            axis = d - ndim
            h = dx[d]
            up = pad_ghost(u, axis, h, boundary_conditions[d])
            n = u.shape[axis]
            center = jnp.take(up, jnp.arange(1, n + 1), axis=axis)
            left = jnp.take(up, jnp.arange(0, n), axis=axis)
            right = jnp.take(up, jnp.arange(2, n + 2), axis=axis)
            out = out + (left - 2.0 * center + right) / h**2
        return out

    return lap


def get_neighbor_indices(shape, index, boundary_conditions=None):
    """Neighbor indices of a grid point under the given BCs.

    For each spatial axis, returns the (−, +) neighbor multi-indices;
    ``None`` marks a neighbor outside a non-periodic boundary.

    Args:
        shape: grid shape.
        index: multi-index tuple (length ``len(shape)``).
        boundary_conditions: ``{axis: (kind, value)}``; axes absent from the
            dict are treated as periodic.
    """
    boundary_conditions = boundary_conditions or {}
    index = tuple(int(i) for i in index)
    neighbors = []
    for d, n in enumerate(shape):
        kind = boundary_conditions.get(d, ("periodic", None))[0]
        for delta in (-1, +1):
            j = index[d] + delta
            if 0 <= j < n:
                neighbors.append(index[:d] + (j,) + index[d + 1 :])
            elif kind == "periodic":
                neighbors.append(index[:d] + (j % n,) + index[d + 1 :])
            else:
                neighbors.append(None)
    return neighbors
