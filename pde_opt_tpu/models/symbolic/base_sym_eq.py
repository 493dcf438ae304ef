"""Base class for symbolic (sympy) manufactured-solution twins.

Test-only, host-side.  Capability parity with
``/root/reference/pde_opt/numerics/symbolic/base_sym_eq.py:11-22``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import TypeVar

State = TypeVar("State")


class BaseSymbolicEquation(ABC):
    """Exact solution + exact RHS of a PDE, derived symbolically."""

    @abstractmethod
    def u_exact(self, t: float) -> State:
        raise NotImplementedError

    @abstractmethod
    def rhs_exact(self, t: float) -> State:
        raise NotImplementedError
