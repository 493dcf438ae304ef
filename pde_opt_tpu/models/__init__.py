"""Equation families and learnable function modules."""

from .base import BaseEquation, TimeSplittingEquation
from .advection_diffusion import AdvectionDiffusion2D
from .allen_cahn import (
    AllenCahn2DPeriodic,
    AllenCahn2DSmoothedBoundary,
    AllenCahn2DPeriodicButlerVolmer,
    AllenCahn2DPeriodicButlerVolmerConstantCurrent,
    AllenCahn2DSmoothedBoundaryButlerVolmerConstantCurrent,
)
from .cahn_hilliard import (
    CahnHilliard2DPeriodic,
    CahnHilliard3DPeriodic,
    CahnHilliard2DSmoothedBoundary,
)
from .gross_pitaevskii import GPE2DTSControl, GPE2DTSRot
from . import functions

__all__ = [
    "BaseEquation",
    "TimeSplittingEquation",
    "AdvectionDiffusion2D",
    "AllenCahn2DPeriodic",
    "AllenCahn2DSmoothedBoundary",
    "AllenCahn2DPeriodicButlerVolmer",
    "AllenCahn2DPeriodicButlerVolmerConstantCurrent",
    "AllenCahn2DSmoothedBoundaryButlerVolmerConstantCurrent",
    "CahnHilliard2DPeriodic",
    "CahnHilliard3DPeriodic",
    "CahnHilliard2DSmoothedBoundary",
    "GPE2DTSControl",
    "GPE2DTSRot",
    "functions",
]
