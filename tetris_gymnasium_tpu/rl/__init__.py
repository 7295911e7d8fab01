"""On-device RL training loops (anakin-style actor/learner co-location).

Counterparts to the reference's CleanRL examples (ref: examples/train_cnn.py,
train_ppo.py, train_lin_grouped.py) with env, buffers, policy and optimizer
all resident on device.
"""
from tetris_gymnasium_tpu.rl import buffers, dqn, evaluate, grouped_dqn, ppo

__all__ = ["buffers", "dqn", "evaluate", "grouped_dqn", "ppo"]
