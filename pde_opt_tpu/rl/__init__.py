"""On-device RL learners co-located with the batched PDE envs.

The reference trains stable-baselines3 agents (PPO/DQN/DDPG CnnPolicy) on
the host against one serial gym env
(``/root/reference/notebooks/test_pde_RL.ipynb``); here the learners are
native jitted train steps over the vectorized env fleets — rollout, physics,
advantage estimation, and updates in one device program.  The pathwise
(differentiable-rollout) alternative lives in ``examples/rl_train_reinforce.py``.
"""

from .nets import (
    ActorCriticConv,
    ActorCriticMLP,
    ConvTorso,
    FlatMLPTorso,
    DeterministicActorConv,
    Linear,
    MLP,
    QCriticConv,
    QNetConv,
)
from .ppo import PPOConfig, gae, make_ppo_train_step, ppo_train
from .dqn import DQNConfig, ReplayState, init_replay, make_dqn_train_step, dqn_train
from .ddpg import DDPGConfig, DDPGState, make_ddpg_train_step, ddpg_train

__all__ = [
    "ActorCriticConv", "ActorCriticMLP", "ConvTorso", "FlatMLPTorso",
    "DeterministicActorConv", "Linear",
    "MLP", "QCriticConv", "QNetConv",
    "PPOConfig", "gae", "make_ppo_train_step", "ppo_train",
    "DQNConfig", "ReplayState", "init_replay", "make_dqn_train_step",
    "dqn_train",
    "DDPGConfig", "DDPGState", "make_ddpg_train_step", "ddpg_train",
]
