"""RL environments: batched pure-JAX core + Gymnasium adapters."""

from .vector_env import EnvState, VectorPDEEnv
from .gym_adapter import PDEEnv, AdvectionDiffusionEnv
from .presets import (
    make_allen_cahn_control_env,
    make_butler_volmer_control_env,
    make_cahn_hilliard_control_env,
    make_gpe_control_env,
    make_gpe_rot_control_env,
    make_sbm_butler_volmer_control_env,
)

__all__ = [
    "EnvState",
    "VectorPDEEnv",
    "PDEEnv",
    "AdvectionDiffusionEnv",
    "make_allen_cahn_control_env",
    "make_butler_volmer_control_env",
    "make_cahn_hilliard_control_env",
    "make_gpe_control_env",
    "make_gpe_rot_control_env",
    "make_sbm_butler_volmer_control_env",
]
