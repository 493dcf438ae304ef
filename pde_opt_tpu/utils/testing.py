"""Convergence-test harness.

Capability parity with ``/root/reference/pde_opt/numerics/utils/testing.py``
(``l2_rel_err`` :13-17, ``check_convergence`` :20-60, ``plot_convergence``
:63-96): evaluate a numeric equation's RHS on the exact manufactured solution
over a ladder of grids and measure the spatial order of accuracy.
"""

from __future__ import annotations

from typing import Sequence, Type

import numpy as np

from ..grid import Domain

__all__ = ["l2_rel_err", "check_convergence", "fit_order", "plot_convergence"]


def l2_rel_err(numeric, symbolic) -> float:
    """Relative L2 error between a numeric and an exact field."""
    numeric = np.asarray(numeric)
    symbolic = np.asarray(symbolic)
    return float(
        np.sqrt(np.sum((numeric - symbolic) ** 2)) / np.sqrt(np.sum(symbolic**2))
    )


def check_convergence(numeric, symbolic, numeric_args, symbolic_args,
                      Ns: Sequence[int], L: float, dtype=None):
    """RHS error vs grid spacing over the ladder ``Ns`` on a [−L/2, L/2]² box.

    Returns ``(dxs, errors)`` for slope fitting (reference ``testing.py:20-60``).
    """
    errors = []
    dxs = []
    for N in Ns:
        kwargs = {}
        if dtype is not None:
            kwargs["dtype"] = dtype
        domain = Domain(
            (N, N), ((-L / 2, L / 2), (-L / 2, L / 2)), "dimensionless", **kwargs
        )
        numeric_args = {**numeric_args, "domain": domain}
        symbolic_args = {**symbolic_args, "domain": domain}
        numeric_eq = numeric(**numeric_args)
        symbolic_eq = symbolic(**symbolic_args)
        u_exact = symbolic_eq.u_exact(0)
        F_numeric = numeric_eq.rhs(u_exact, 0)
        F_symbolic = symbolic_eq.rhs_exact(0)
        errors.append(l2_rel_err(F_numeric, F_symbolic))
        dxs.append(domain.dx[0])
    return dxs, errors


def fit_order(dxs, errors) -> float:
    """Fitted log-log slope of error vs spacing (the convergence order)."""
    slope, _ = np.polyfit(np.log(np.asarray(dxs)), np.log(np.asarray(errors)), 1)
    return float(slope)


def plot_convergence(dx, err, orders=(0.5, 1.0, 1.5, 2.0), anchor="min"):
    """Log-log convergence plot with dotted reference slopes (host-side)."""
    import matplotlib.pyplot as plt

    dx = np.asarray(dx, float)
    err = np.asarray(err, float)
    i = np.argsort(dx)
    dx, err = dx[i], err[i]

    plt.figure()
    plt.loglog(dx, err, "o-", label="measured")
    x0, y0 = (dx[0], err[0]) if anchor == "min" else (dx[-1], err[-1])
    xref = np.array([dx[0], dx[-1]])
    for q in orders:
        plt.loglog(xref, y0 * (xref / x0) ** q, linestyle=":", label=f"order {q:g}")
    slope = np.polyfit(np.log(dx), np.log(err), 1)[0]
    plt.xlabel(r"$\Delta x$")
    plt.ylabel("error")
    plt.title(f"Convergence (global slope ≈ {abs(slope):.3f})")
    plt.legend()
    plt.grid(True, which="both", linestyle="--", alpha=0.3)
    plt.tight_layout()
