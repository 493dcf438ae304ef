"""RL environments: batched pure-JAX core + Gymnasium adapters."""

from .vector_env import EnvState, VectorPDEEnv
from .gym_adapter import PDEEnv, AdvectionDiffusionEnv

__all__ = ["EnvState", "VectorPDEEnv", "PDEEnv", "AdvectionDiffusionEnv"]
