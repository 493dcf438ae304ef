"""Symbolic Allen-Cahn twin (method of manufactured solutions).

Capability parity with
``/root/reference/pde_opt/numerics/symbolic/allen_cahn_sym.py:12-45``: given a
symbolic test solution u*(x,y,t) and symbolic μ/R, derive the exact RHS with
sympy and lambdify it for grid evaluation.  Used by the order-of-accuracy
tests (SURVEY.md §4.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp
import sympy as sp
from sympy.utilities.lambdify import lambdify

from .base_sym_eq import BaseSymbolicEquation


@dataclass
class SymbolicAllenCahn2DPeriodic(BaseSymbolicEquation):
    """Exact RHS for −R(u)(μ(u) − κ∆u) at a manufactured u*."""

    domain: object
    kappa: float
    mu_sym: Callable[[sp.Expr], sp.Expr]
    R_sym: Callable[[sp.Expr], sp.Expr]
    u_star: sp.Expr

    def __post_init__(self):
        x, y, t = sp.symbols("x y t", real=True)
        u = self.u_star
        u_xx = sp.diff(u, x, 2)
        u_yy = sp.diff(u, y, 2)
        mu_expr = self.mu_sym(u) - self.kappa * (u_xx + u_yy)
        rhs_expr = -self.R_sym(u) * mu_expr
        self._u_fn = lambdify((x, y, t), sp.simplify(u), "numpy")
        self._rhs_fn = lambdify((x, y, t), sp.simplify(rhs_expr), "numpy")

    def u_exact(self, t: float):
        X, Y = self.domain.mesh()
        return jnp.asarray(self._u_fn(X, Y, float(t)))

    def rhs_exact(self, t: float):
        X, Y = self.domain.mesh()
        return jnp.asarray(self._rhs_fn(X, Y, float(t)))
