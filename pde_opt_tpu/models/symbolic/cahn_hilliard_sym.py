"""Symbolic Cahn-Hilliard twin (method of manufactured solutions).

Capability parity with
``/root/reference/pde_opt/numerics/symbolic/cahn_hilliard_sym.py:14-48``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
import sympy as sp
from sympy.utilities.lambdify import lambdify

from .base_sym_eq import BaseSymbolicEquation


@dataclass
class SymbolicCahnHilliard2DPeriodic(BaseSymbolicEquation):
    """Exact RHS for ∇·(D(u)∇(μ(u) − κ∆u)) at a manufactured u*."""

    domain: object
    kappa: float
    mu_sym: Callable[[sp.Expr], sp.Expr]
    D_sym: Callable[[sp.Expr], sp.Expr]
    u_star: sp.Expr

    def __post_init__(self):
        x, y, t = sp.symbols("x y t", real=True)
        u = self.u_star
        u_xx = sp.diff(u, x, 2)
        u_yy = sp.diff(u, y, 2)
        mu_expr = self.mu_sym(u) - self.kappa * (u_xx + u_yy)
        mu_x, mu_y = sp.diff(mu_expr, x), sp.diff(mu_expr, y)
        rhs_expr = sp.diff(self.D_sym(u) * mu_x, x) + sp.diff(self.D_sym(u) * mu_y, y)
        self._u_fn = lambdify((x, y, t), sp.simplify(u), "numpy")
        self._rhs_fn = lambdify((x, y, t), sp.simplify(rhs_expr), "numpy")

    def u_exact(self, t: float):
        X, Y = self.domain.mesh()
        return jnp.asarray(self._u_fn(X, Y, float(t)))

    def rhs_exact(self, t: float):
        X, Y = self.domain.mesh()
        return jnp.asarray(self._rhs_fn(X, Y, float(t)))
