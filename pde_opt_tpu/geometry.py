"""Smoothed-boundary geometry.

Capability parity with ``/root/reference/pde_opt/numerics/shapes.py``: a
binary mask becomes a smooth level-set ψ by integrating a curvature-
regularized Allen-Cahn flow (:39-79), clamped away from zero (:34-37); the
mask's 4-neighbour graph Laplacian and its low eigenmodes provide a shape
basis (:81-203).

TPU-native notes: the smoothing flow runs through this framework's own
adaptive Tsit5 driver (:mod:`pde_opt_tpu.ops.integrate`) instead of diffrax —
one compiled ``while_loop`` on device.  The eigenmode computation is a
one-time host-side preprocessing step (scipy shift-invert Lanczos), exactly
as in the reference; its output ships to device as a constant basis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import stencils as st
from .ops.integrate import integrate_adaptive
from .ops.steppers import Tsit5

Array = jax.Array

__all__ = ["Shape"]


@dataclasses.dataclass
class Shape:
    """Geometry for the smoothed-boundary method.

    Args:
        binary: 0/1 mask of the domain interior.
        dx: grid spacings.
        smooth_epsilon: interface width of the smoothing flow.
        smooth_curvature: blend between full Laplacian (1.0) and
            curvature-free normal diffusion (0.0).
        smooth_dt: initial step of the adaptive smoothing integration.
        smooth_tf: final time of the smoothing flow.
    """

    binary: Array
    dx: Optional[Tuple[float, float]] = (1.0, 1.0)
    smooth_epsilon: float = 1.0
    smooth_curvature: float = 0.0
    smooth_dt: float = 0.1
    smooth_tf: float = 1.0

    def __post_init__(self):
        self.binary = jnp.asarray(self.binary)
        smooth = self.smooth_shape()
        smooth = jnp.where(smooth < 0.001, 0.001, smooth)
        smooth = jnp.where(smooth > 0.99, 1.0, smooth)
        self.smooth = smooth

    def smooth_shape(self) -> Array:
        """Run the curvature-regularized Allen-Cahn smoothing flow.

        Same flow as reference ``shapes.py:39-77`` (double-well potential
        18/ε·u(1−u)(1−2u), grad-norm floor 1e-7), integrated by this
        framework's adaptive Tsit5 + PID driver at rtol=1e-4/atol=1e-6.
        """
        eps = self.smooth_epsilon
        curv = self.smooth_curvature
        hx, hy = self.dx

        def potential(u):
            return 18.0 / eps * u * (1.0 - u) * (1.0 - 2.0 * u)

        def rhs(u, t):
            gradx = st.grad_c(u, hx, -2)
            grady = st.grad_c(u, hy, -1)
            grad2x = st.grad2_c(u, hx, -2)
            grad2y = st.grad2_c(u, hy, -1)
            grad2xy = st.grad2_cross_c(u, hx, hy, -2, -1)
            grad_norm_sq = gradx**2 + grady**2
            grad_norm_sq = jnp.where(grad_norm_sq < 1e-7, 1.0, grad_norm_sq)
            norm_laplace = (
                grad2x * gradx**2 + 2.0 * grad2xy * gradx * grady + grad2y * grady**2
            ) / grad_norm_sq
            laplace = grad2x + grad2y
            return (
                2.0 * (curv * laplace + (1.0 - curv) * norm_laplace)
                - potential(u) / eps
            )

        y0 = self.binary.astype(jnp.result_type(float))
        ys = integrate_adaptive(
            Tsit5(), rhs, y0,
            ts=jnp.array([0.0, self.smooth_tf]),
            dt0=self.smooth_dt, rtol=1e-4, atol=1e-6,
        )
        return ys[-1]

    # ---- graph-Laplacian shape modes (host-side preprocessing) ---------

    def laplacian_from_mask(self, periodic: bool = False):
        """4-neighbour unnormalized graph Laplacian of the 0/1 mask.

        Host-side (scipy sparse), one-time.  Returns ``(L, ids)`` where ``L``
        is CSR of shape (n_nodes, n_nodes) and ``ids`` maps pixels to node
        index (−1 outside the mask).  Reference ``shapes.py:81-143``.
        """
        from scipy.sparse import coo_matrix, csr_matrix

        mask = np.asarray(self.binary) > 0
        H, W = mask.shape
        ids = -np.ones((H, W), dtype=np.int64)
        ids[mask] = np.arange(mask.sum(), dtype=np.int64)
        n = int(mask.sum())
        if n == 0:
            return csr_matrix((0, 0)), ids

        def undirected_edges(dy, dxx):
            if periodic:
                m_both = mask & np.roll(mask, (dy, dxx), axis=(0, 1))
                if not m_both.any():
                    return np.empty(0, np.int64), np.empty(0, np.int64)
                u = ids[m_both]
                v = np.roll(ids, (dy, dxx), axis=(0, 1))[m_both]
                return u, v
            y0, y1 = max(0, dy), H + min(0, dy)
            x0, x1 = max(0, dxx), W + min(0, dxx)
            m1 = mask[y0:y1, x0:x1]
            m2 = mask[y0 - dy : y1 - dy, x0 - dxx : x1 - dxx]
            both = m1 & m2
            if not both.any():
                return np.empty(0, np.int64), np.empty(0, np.int64)
            u = ids[y0:y1, x0:x1][both]
            v = ids[y0 - dy : y1 - dy, x0 - dxx : x1 - dxx][both]
            return u, v

        ur, vr = undirected_edges(0, +1)
        ud, vd = undirected_edges(+1, 0)
        u_one = np.concatenate([ur, ud])
        v_one = np.concatenate([vr, vd])
        deg = np.bincount(np.concatenate([u_one, v_one]), minlength=n).astype(np.float64)
        rows_off = np.concatenate([u_one, v_one])
        cols_off = np.concatenate([v_one, u_one])
        data_off = -np.ones(rows_off.shape[0], dtype=np.float64)
        rows = np.concatenate([rows_off, np.arange(n)])
        cols = np.concatenate([cols_off, np.arange(n)])
        data = np.concatenate([data_off, deg])
        L = coo_matrix((data, (rows, cols)), shape=(n, n)).tocsr()
        return L, ids

    def get_shape_modes(self, N: Optional[int] = None):
        """First ``N`` graph-Laplacian eigenmodes of the mask.

        Shift-invert Lanczos near zero (scipy ``eigsh``), reference
        ``shapes.py:145-203``.  Results stored as ``self.shape_basis``
        ((H, W, N) device array) and ``self.shape_basis_evals``.
        """
        import scipy.sparse.linalg

        laplacian, node_ids = self.laplacian_from_mask()
        n = laplacian.shape[0]
        if (laplacian != laplacian.T).nnz != 0:
            raise ValueError("Laplacian matrix is not symmetric")
        diag_mean = float(laplacian.diagonal().mean()) if n > 0 else 1.0
        sigma = max(diag_mean, 1.0) * 1e-8
        eigenvals, eigenvecs = scipy.sparse.linalg.eigsh(
            laplacian, k=N, which="LM", sigma=sigma, tol=1e-8, maxiter=None
        )
        H, W = self.binary.shape
        output = np.zeros((H, W, N))
        valid_mask = node_ids >= 0
        valid_node_ids = node_ids[valid_mask]
        for i in range(N):
            output[valid_mask, i] = eigenvecs[:, i][valid_node_ids]
        self.shape_basis = jnp.array(output)
        self.shape_basis_evals = eigenvals
        return self.shape_basis, self.shape_basis_evals
