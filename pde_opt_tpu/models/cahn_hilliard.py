"""Cahn-Hilliard equation family.

Capability parity with ``/root/reference/pde_opt/numerics/equations/cahn_hilliard.py``
(``CahnHilliard2DPeriodic`` :30-109, ``CahnHilliard3DPeriodic`` :112-200,
``CahnHilliard2DSmoothedBoundary`` :203-289), rebuilt batch-transparent:
stencils and FFTs act on trailing spatial axes so one ``rhs`` evaluation
serves an arbitrary env fleet in a single fused XLA kernel.

    ∂u/∂t = ∇·(D(u) ∇μ),   μ = μ_h(u) − κ∇²u

Coefficient functions ``mu`` and ``D`` are injected callables (plain lambdas
or learnable pytree modules from :mod:`pde_opt_tpu.models.functions`) — the
hook that makes parameters trainable by differentiating through the rollout.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..grid import Domain
from ..ops import stencils as st
from ..ops.spectral import make_fft_pair, make_rfft_pair
from .base import BaseEquation

__all__ = [
    "CahnHilliard2DPeriodic",
    "CahnHilliard3DPeriodic",
    "CahnHilliard2DSmoothedBoundary",
    "CahnHilliardSIFFT",
]


class CahnHilliard2DPeriodic(BaseEquation):
    """2D periodic Cahn-Hilliard with variable mobility.

    ``derivs="fd"`` uses the conservative face-flux form (2nd order);
    ``derivs="fourier"`` the pseudo-spectral form.  Exposes
    ``fourier_symbol = κ(2πik)⁴`` for the semi-implicit spectral stepper
    (reference ``cahn_hilliard.py:74``).
    """

    fft = None
    ifft = None
    fourier_symbol = None
    # Class-level placeholders so solver-compat checks (which inspect the
    # class) see the attrs the fused stepper pulls off instances.
    kappa = None
    mu = None
    D = None
    domain = None

    def __init__(self, domain: Domain, kappa, mu: Callable, D: Callable,
                 derivs: str = "fd", use_rfft: bool = True):
        self.domain = domain
        self.kappa = kappa
        self.mu = mu
        self.D = D
        self.derivs = derivs
        self.use_rfft = use_rfft

        # Real fields only need the half-spectrum: rfft halves the FFT HBM
        # traffic of every semi-implicit step (pass use_rfft=False for the
        # reference's full-fftn semantics).
        kx, ky = domain.rfft_mesh() if use_rfft else domain.fft_mesh()
        self.two_pi_i_kx = 2j * np.pi * kx
        self.two_pi_i_ky = 2j * np.pi * ky
        self.two_pi_i_k_2 = self.two_pi_i_kx**2 + self.two_pi_i_ky**2
        self.two_pi_i_k_4 = self.two_pi_i_k_2**2
        if use_rfft:
            self.fft, self.ifft = make_rfft_pair(2, domain.points)
        else:
            self.fft, self.ifft = make_fft_pair(2)
        self.fourier_symbol = kappa * self.two_pi_i_k_4

        if derivs == "fourier":
            self.rhs = self.rhs_fourier
        elif derivs == "fd":
            self.rhs = self.rhs_fd
        elif derivs == "pallas":
            # Fused single-kernel FD RHS: one HBM read + one write instead of
            # ~20 roll passes (see ops/fused.py). mu/D must be elementwise.
            from ..ops.fused import make_ch_rhs_fd_fused

            self._fused_rhs = make_ch_rhs_fd_fused(
                self.mu, self.D, domain.dx[0], domain.dx[1]
            )
            self.rhs = self.rhs_pallas
        else:
            raise ValueError(f"Invalid derivative type: {derivs}")

    def rhs_pallas(self, state, t):
        return self._fused_rhs(state, self.kappa)

    def rhs_fourier(self, state, t):
        state_hat = self.fft(state)
        mu_hat = self.fft(self.mu(state)) - self.kappa * self.two_pi_i_k_2 * state_hat
        Du = self.D(state)
        fx = self.fft(Du * self.ifft(self.two_pi_i_kx * mu_hat))
        fy = self.fft(Du * self.ifft(self.two_pi_i_ky * mu_hat))
        return self.ifft(self.two_pi_i_kx * fx + self.two_pi_i_ky * fy).real

    def rhs_fd(self, state, t):
        hx, hy = self.domain.dx
        mu = self.mu(state) - self.kappa * st.lap_2nd_2d(state, hx, hy)
        mux_f = st.grad_c2f(mu, hx, -2)
        muy_f = st.grad_c2f(mu, hy, -1)
        Du = self.D(state)
        Fx = st.avg_c2f(Du, -2) * mux_f
        Fy = st.avg_c2f(Du, -1) * muy_f
        return st.div_f2c(Fx, hx, -2) + st.div_f2c(Fy, hy, -1)


class CahnHilliard3DPeriodic(BaseEquation):
    """3D periodic Cahn-Hilliard (reference ``cahn_hilliard.py:112-200``)."""

    fft = None
    ifft = None
    fourier_symbol = None
    # Class-level placeholders so solver-compat checks (which inspect the
    # class) see the attrs the fused 3D stepper pulls off instances.
    kappa = None
    mu = None
    D = None
    domain = None

    def __init__(self, domain: Domain, kappa, mu: Callable, D: Callable,
                 derivs: str = "fd", use_rfft: bool = True):
        self.domain = domain
        self.kappa = kappa
        self.mu = mu
        self.D = D
        self.derivs = derivs
        self.use_rfft = use_rfft

        kx, ky, kz = domain.rfft_mesh() if use_rfft else domain.fft_mesh()
        self.two_pi_i_kx = 2j * np.pi * kx
        self.two_pi_i_ky = 2j * np.pi * ky
        self.two_pi_i_kz = 2j * np.pi * kz
        self.two_pi_i_k_2 = (
            self.two_pi_i_kx**2 + self.two_pi_i_ky**2 + self.two_pi_i_kz**2
        )
        self.two_pi_i_k_4 = self.two_pi_i_k_2**2
        if use_rfft:
            self.fft, self.ifft = make_rfft_pair(3, domain.points)
        else:
            self.fft, self.ifft = make_fft_pair(3)
        self.fourier_symbol = kappa * self.two_pi_i_k_4

        if derivs == "fourier":
            self.rhs = self.rhs_fourier
        elif derivs == "fd":
            self.rhs = self.rhs_fd
        else:
            raise ValueError(f"Invalid derivative type: {derivs}")

    def rhs_fourier(self, state, t):
        state_hat = self.fft(state)
        mu_hat = self.fft(self.mu(state)) - self.kappa * self.two_pi_i_k_2 * state_hat
        Du = self.D(state)
        fx = self.fft(Du * self.ifft(self.two_pi_i_kx * mu_hat))
        fy = self.fft(Du * self.ifft(self.two_pi_i_ky * mu_hat))
        fz = self.fft(Du * self.ifft(self.two_pi_i_kz * mu_hat))
        return self.ifft(
            self.two_pi_i_kx * fx + self.two_pi_i_ky * fy + self.two_pi_i_kz * fz
        ).real

    def rhs_fd(self, state, t):
        hx, hy, hz = self.domain.dx
        mu = self.mu(state) - self.kappa * st.lap_2nd_3d(state, hx, hy, hz)
        Du = self.D(state)
        out = 0.0
        for axis, h in zip((-3, -2, -1), (hx, hy, hz)):
            F = st.avg_c2f(Du, axis) * st.grad_c2f(mu, h, axis)
            out = out + st.div_f2c(F, h, axis)
        return out


class CahnHilliard2DSmoothedBoundary(BaseEquation):
    """Cahn-Hilliard with the smoothed-boundary method (SBM) on irregular domains.

    ∂u/∂t = (1/ψ) ∇·(ψ D(u) ∇μ) + (|∇ψ|/ψ) J_n, with contact-angle
    chemical potential (reference ``cahn_hilliard.py:203-289``).  ψ is the
    smooth level-set from ``domain.geometry`` (:class:`pde_opt_tpu.geometry.Shape`).

    ``contact_rows``: the reference hardcodes the contact-angle term to the
    first 50 rows of the domain (``cahn_hilliard.py:253-254``); kept as a
    parameter defaulting to that behavior.
    """

    def __init__(self, domain: Domain, kappa, f: Callable, mu: Callable,
                 D: Callable, theta: Callable, flux: Callable,
                 derivs: str = "fd", contact_rows: int = 50,
                 contact_mask: Optional[jnp.ndarray] = None):
        if derivs != "fd":
            raise ValueError(f"Invalid derivative type: {derivs}")
        self.domain = domain
        self.kappa = kappa
        self.f = f
        self.mu = mu
        self.D = D
        self.theta = theta
        self.flux = flux
        self.derivs = derivs

        self.psi = domain.geometry.smooth
        self.sqrt_kappa = np.sqrt(kappa)
        self.hx, self.hy = domain.dx
        self.norm_grad_psi = (
            jnp.sqrt(
                st.grad_c(self.psi, self.hx, -2) ** 2
                + st.grad_c(self.psi, self.hy, -1) ** 2
            )
            / self.psi
        )
        if contact_mask is None:
            contact_mask = jnp.zeros_like(self.psi).at[:contact_rows, :].set(1.0)
        self.left_half = contact_mask
        # Precompute face-averaged psi (static geometry).
        self.psi_avgx = st.avg_c2f(self.psi, -2)
        self.psi_avgy = st.avg_c2f(self.psi, -1)
        self.rhs = self.rhs_fd

    def rhs_fd(self, state, t):
        f = self.f(state)
        mu = self.mu(state)
        cos_theta = jnp.cos(self.theta(t))
        inner = (
            mu
            - (self.kappa / self.psi)
            * (
                st.div_f2c(self.psi_avgx * st.grad_c2f(state, self.hx, -2), self.hx, -2)
                + st.div_f2c(self.psi_avgy * st.grad_c2f(state, self.hy, -1), self.hy, -1)
            )
            - self.sqrt_kappa
            * self.norm_grad_psi
            * jnp.sqrt(2.0 * f)
            * (cos_theta * self.left_half - cos_theta * (1.0 - self.left_half))
        )
        Du = self.D(state)
        Fx = self.psi_avgx * st.avg_c2f(Du, -2) * st.grad_c2f(inner, self.hx, -2)
        Fy = self.psi_avgy * st.avg_c2f(Du, -1) * st.grad_c2f(inner, self.hy, -1)
        return (
            st.div_f2c(Fx, self.hx, -2) + st.div_f2c(Fy, self.hy, -1)
        ) / self.psi + self.norm_grad_psi * self.flux(t)


# Ghost/legacy alias: the pre-rename class name reference notebooks import
# (`notebooks/tmp.py:6-8`, `test_optimization_model.ipynb` cell 0).
CahnHilliardSIFFT = CahnHilliard2DPeriodic
