"""Symbolic (sympy) manufactured-solution twins — test-only, host-side."""

from .base_sym_eq import BaseSymbolicEquation
from .allen_cahn_sym import SymbolicAllenCahn2DPeriodic
from .cahn_hilliard_sym import SymbolicCahnHilliard2DPeriodic
from .advection_diffusion_sym import SymbolicAdvectionDiffusion2D

__all__ = [
    "BaseSymbolicEquation",
    "SymbolicAllenCahn2DPeriodic",
    "SymbolicCahnHilliard2DPeriodic",
    "SymbolicAdvectionDiffusion2D",
]
