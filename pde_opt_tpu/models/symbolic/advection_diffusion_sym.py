"""Symbolic advection-diffusion twin (method of manufactured solutions).

No reference counterpart (the reference never had the equation in-package);
same MMS pattern as its AC/CH twins, for the restored
:class:`pde_opt_tpu.models.advection_diffusion.AdvectionDiffusion2D`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax.numpy as jnp
import sympy as sp
from sympy.utilities.lambdify import lambdify

from .base_sym_eq import BaseSymbolicEquation


@dataclass
class SymbolicAdvectionDiffusion2D(BaseSymbolicEquation):
    """Exact RHS for −∇·(u·v) + D∆u at a manufactured u*."""

    domain: object
    diffusion_coeff: float
    v_sym: Callable[[sp.Symbol, sp.Symbol, sp.Symbol], Tuple[sp.Expr, sp.Expr]]
    u_star: sp.Expr

    def __post_init__(self):
        x, y, t = sp.symbols("x y t", real=True)
        u = self.u_star
        vx, vy = self.v_sym(t, x, y)
        rhs_expr = (
            -(sp.diff(u * vx, x) + sp.diff(u * vy, y))
            + self.diffusion_coeff * (sp.diff(u, x, 2) + sp.diff(u, y, 2))
        )
        self._u_fn = lambdify((x, y, t), sp.simplify(u), "numpy")
        self._rhs_fn = lambdify((x, y, t), sp.simplify(rhs_expr), "numpy")

    def u_exact(self, t: float):
        X, Y = self.domain.mesh()
        return jnp.asarray(self._u_fn(X, Y, float(t)))

    def rhs_exact(self, t: float):
        X, Y = self.domain.mesh()
        return jnp.asarray(self._rhs_fn(X, Y, float(t)))
