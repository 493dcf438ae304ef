"""Advection-diffusion equation.

Restores the reference's ghost API: ``AdvectionDiffusion2D`` is imported by
``/root/reference/notebooks/run_advection_diffusion.ipynb`` (cell 0) and the
``AdvectionDiffusion-v0`` env notebooks, with signature
``AdvectionDiffusion2D(domain, velocity(t,x,y) -> (vx,vy), diffusion_coeff,
smooth=False)`` and rhs = −∇·(u·v) + D∇²u (notebook cells 2-4), but is absent
from the reference package (BASELINE config 1 names it).  First-class here.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..grid import Domain
from ..ops import stencils as st
from ..ops.spectral import make_fft_pair, make_rfft_pair
from .base import BaseEquation

__all__ = ["AdvectionDiffusion2D"]


class AdvectionDiffusion2D(BaseEquation):
    """2D periodic advection-diffusion: ∂u/∂t = −∇·(u·v) + D∇²u.

    Args:
        domain: spatial grid.
        velocity: ``velocity(t, X, Y) -> (vx, vy)`` velocity field callable
            (may be a learnable module; may depend on the traced env control).
        diffusion_coeff: scalar diffusivity D.
        smooth: if True, apply the smoothed-boundary weighting with
            ψ = ``domain.geometry.smooth`` (flux form ∇·(ψ u v), ∇·(ψ∇u)/ψ).
        derivs: "fd" (conservative face fluxes, 2nd order) or "fourier".
    """

    fft = None
    ifft = None
    fourier_symbol = None

    def __init__(self, domain: Domain, velocity: Callable, diffusion_coeff,
                 smooth: bool = False, derivs: str = "fd", use_rfft: bool = True):
        self.domain = domain
        self.velocity = velocity
        self.diffusion_coeff = diffusion_coeff
        self.smooth = smooth
        self.derivs = derivs
        self.use_rfft = use_rfft

        kx, ky = domain.rfft_mesh() if use_rfft else domain.fft_mesh()
        self.two_pi_i_kx = 2j * np.pi * kx
        self.two_pi_i_ky = 2j * np.pi * ky
        self.two_pi_i_k_2 = self.two_pi_i_kx**2 + self.two_pi_i_ky**2
        if use_rfft:
            self.fft, self.ifft = make_rfft_pair(2, domain.points)
        else:
            self.fft, self.ifft = make_fft_pair(2)
        # Diffusion is the stiff part: symbol −D(2πik)² for semi-implicit use.
        self.fourier_symbol = -diffusion_coeff * self.two_pi_i_k_2
        self.xmesh, self.ymesh = domain.mesh()
        self.hx, self.hy = domain.dx

        if smooth:
            psi = domain.geometry.smooth
            self.psi = psi
            self.psi_avgx = st.avg_c2f(psi, -2)
            self.psi_avgy = st.avg_c2f(psi, -1)

        if derivs == "fd":
            self.rhs = self.rhs_fd
        elif derivs == "fourier":
            if smooth:
                raise ValueError("smoothed-boundary requires derivs='fd'")
            self.rhs = self.rhs_fourier
        else:
            raise ValueError(f"Invalid derivative type: {derivs}")

    def _velocity_at(self, t):
        return self.velocity(t, self.xmesh, self.ymesh)

    def rhs_fd(self, state, t):
        vx, vy = self._velocity_at(t)
        vx = jnp.broadcast_to(vx, state.shape[-2:])
        vy = jnp.broadcast_to(vy, state.shape[-2:])
        # Advective flux at faces: upwind-free centered (2nd order) form
        # F = avg(u) * avg(v) on each face.
        ux_f = st.avg_c2f(state, -2)
        uy_f = st.avg_c2f(state, -1)
        vx_f = st.avg_c2f(vx, -2)
        vy_f = st.avg_c2f(vy, -1)
        if self.smooth:
            Fx = self.psi_avgx * vx_f * ux_f
            Fy = self.psi_avgy * vy_f * uy_f
            adv = -(st.div_f2c(Fx, self.hx, -2) + st.div_f2c(Fy, self.hy, -1)) / self.psi
            dif = self.diffusion_coeff * (
                st.div_f2c(self.psi_avgx * st.grad_c2f(state, self.hx, -2), self.hx, -2)
                + st.div_f2c(self.psi_avgy * st.grad_c2f(state, self.hy, -1), self.hy, -1)
            ) / self.psi
            return adv + dif
        Fx = vx_f * ux_f
        Fy = vy_f * uy_f
        adv = -(st.div_f2c(Fx, self.hx, -2) + st.div_f2c(Fy, self.hy, -1))
        return adv + self.diffusion_coeff * st.lap_2nd_2d(state, self.hx, self.hy)

    def rhs_fourier(self, state, t):
        vx, vy = self._velocity_at(t)
        flux_x_hat = self.fft(state * vx)
        flux_y_hat = self.fft(state * vy)
        state_hat = self.fft(state)
        out_hat = (
            -(self.two_pi_i_kx * flux_x_hat + self.two_pi_i_ky * flux_y_hat)
            + self.diffusion_coeff * self.two_pi_i_k_2 * state_hat
        )
        return self.ifft(out_hat).real
