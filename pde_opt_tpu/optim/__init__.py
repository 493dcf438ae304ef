"""Optimizers: Levenberg-Marquardt (small params) and L-BFGS/Adam (NN params)."""

from .lm import least_squares_lm, least_squares_lm_jitted, LMResult
from .minimize import minimize_lbfgs, minimize_adam, MinimizeResult

__all__ = [
    "least_squares_lm",
    "least_squares_lm_jitted",
    "LMResult",
    "minimize_lbfgs",
    "minimize_adam",
    "MinimizeResult",
]
