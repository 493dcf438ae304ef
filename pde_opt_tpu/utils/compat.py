"""Solver↔equation wiring contract.

Direct capability parity with the reference's auto-wiring utilities
(``/root/reference/pde_opt/utils.py:6-53``): steppers declare
``required_equation_attrs`` and these helpers validate compatibility and pull
the attributes (``fourier_symbol``, ``fft``, ``ifft``, ``A_term``, ``dx``)
off a constructed equation into the stepper constructor kwargs.
"""

from __future__ import annotations

from typing import Any, Dict

__all__ = ["check_equation_solver_compatibility", "prepare_solver_params"]


def check_equation_solver_compatibility(solver_type, equation_type) -> None:
    """Raise ``ValueError`` if ``equation_type`` lacks attrs ``solver_type`` needs.

    Attribute presence is checked on the class (class-level defaults or
    methods); instance attributes set in ``__init__``/``__post_init__`` count
    as long as the class declares them (all equations here declare class-level
    ``None`` placeholders, same pattern as the reference).
    """
    required = getattr(solver_type, "required_equation_attrs", None)
    if not required:
        return
    missing = [a for a in required if not hasattr(equation_type, a)]
    if missing:
        raise ValueError(
            f"Equation type {equation_type.__name__} is missing required "
            f"attributes for solver {solver_type.__name__}: {missing}"
        )


def prepare_solver_params(
    solver_type, solver_parameters: Dict[str, Any], equation
) -> Dict[str, Any]:
    """Merge user solver parameters with equation-derived required attrs."""
    full = dict(solver_parameters)
    for attr in getattr(solver_type, "required_equation_attrs", ()) or ():
        full[attr] = getattr(equation, attr)
    return full
