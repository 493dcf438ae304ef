"""Learnable coefficient-function library (pytree modules)."""

from .legendre import (
    LegendrePolynomialExpansion,
    LegendrePolynomialExpansion2D,
    DiffusionLegendrePolynomials,
    ChemicalPotentialLegendrePolynomials,
    LegendrePolynomials,
    legval,
)
from .cnn import PeriodicCNN, conv2d_circular
from .mixer import Mixer2d, MixerBlock

__all__ = [
    "LegendrePolynomialExpansion",
    "LegendrePolynomialExpansion2D",
    "DiffusionLegendrePolynomials",
    "ChemicalPotentialLegendrePolynomials",
    "LegendrePolynomials",
    "legval",
    "PeriodicCNN",
    "conv2d_circular",
    "Mixer2d",
    "MixerBlock",
]
