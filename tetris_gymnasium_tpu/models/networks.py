"""Flax network families for the RL examples.

TPU-native re-design of the reference's PyTorch models
(ref: examples/train_cnn.py:151-168 QNetwork, examples/train_ppo.py:91-124
Agent, examples/train_lin_grouped.py:157-175 linear Q-net).  Differences are
deliberate, not accidental:

  * the reference rescales the env image to 84x84 grayscale frames to reuse
    Atari nets (ref: train_cnn.py:127-147); here the CNN consumes the engine's
    native ``[H, W]`` board observation directly — no host-side cv2 resizing,
    no wasted pixels, one less HBM round-trip;
  * compute runs in bfloat16 (MXU-native) with float32 parameters and
    float32 heads, the standard TPU mixed-precision recipe;
  * channel sizes are multiples of 8/128 where it matters so XLA tiles the
    matmuls onto the MXU without padding waste.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class BoardEncoder(nn.Module):
    """Conv trunk over a ``[B, H, W]`` board observation (values -1/0/1).

    Channel plan (32 -> 64 -> 128) mirrors the reference Atari trunk's
    capacity (ref: train_cnn.py:153-160) at the native 20x10 resolution.
    A stacked input ``[B, K, H, W]`` (:mod:`ops.framestack`, oldest-first)
    feeds the K frames as conv input channels — the reference workload's
    FrameStack(4)-as-channels recipe (ref: train_cnn.py:127-168).
    """

    features: Sequence[int] = (32, 64, 128)
    # One (sy, sx) per conv layer; None = the default plan (2,1) then (2,2)s.
    # Stride-1 plans keep the full 20x10 resolution through the trunk — at
    # this board size the convs stay tiny on the MXU, and placement precision
    # benefits from not downsampling.
    strides: object = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, boards: jnp.ndarray) -> jnp.ndarray:
        if boards.ndim == 4:  # [B, K, H, W] frame stack -> channels-last
            x = jnp.moveaxis(boards.astype(self.dtype), 1, -1)
        else:
            x = boards.astype(self.dtype)[..., None]  # [B, H, W, 1]
        for i, feat in enumerate(self.features):
            if self.strides is None:
                stride = (2, 1) if i == 0 else (2, 2)
            else:
                stride = tuple(self.strides[i])
            x = nn.Conv(feat, kernel_size=(3, 3), strides=stride, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(512, dtype=self.dtype)(x)
        return nn.relu(x)


class QNetworkCNN(nn.Module):
    """DQN value network: board -> Q(s, a) for the 8 engine actions.

    Role parity: examples/train_cnn.py:151-168.
    """

    n_actions: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, boards: jnp.ndarray) -> jnp.ndarray:
        h = BoardEncoder(dtype=self.dtype)(boards)
        return nn.Dense(self.n_actions, dtype=jnp.float32)(h)


class AtariQNetwork(nn.Module):
    """The reference CNN workload's exact Q-net for 84x84 grayscale frames.

    Architecture parity with the reference's Atari network
    (ref: examples/train_cnn.py:151-168): conv 32@8x8/4 -> 64@4x4/2 ->
    64@3x3/1 -> dense 512 -> Q head, inputs normalized by /255
    (ref: train_cnn.py:168).  Compute in bfloat16 with a float32 head, the
    TPU mixed-precision recipe.  Input ``[B, K, 84, 84]`` (FrameStack K as
    channels) or ``[B, 84, 84]`` uint8.
    """

    n_actions: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        if frames.ndim == 4:  # [B, K, H, W] -> channels-last
            x = jnp.moveaxis(frames.astype(self.dtype), 1, -1)
        else:
            x = frames.astype(self.dtype)[..., None]
        x = x / jnp.asarray(255.0, self.dtype)
        for feat, k, s in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.Conv(
                feat, kernel_size=(k, k), strides=(s, s), padding="VALID",
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        return nn.Dense(self.n_actions, dtype=jnp.float32)(x)


class AtariActorCritic(nn.Module):
    """The reference PPO workload's exact agent for 84x84 grayscale stacks.

    Architecture parity with the reference's CleanRL Agent
    (ref: examples/train_ppo.py:91-124): the Atari conv trunk (32@8x8/4 ->
    64@4x4/2 -> 64@3x3/1 -> dense 512, inputs /255) shared by an
    orthogonal-init policy head (gain 0.01) and value head (gain 1).
    Input ``[B, K, 84, 84]`` or ``[B, 84, 84]`` uint8.
    """

    n_actions: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jnp.ndarray):
        if frames.ndim == 4:
            x = jnp.moveaxis(frames.astype(self.dtype), 1, -1)
        else:
            x = frames.astype(self.dtype)[..., None]
        x = x / jnp.asarray(255.0, self.dtype)
        for feat, k, s in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.Conv(
                feat, kernel_size=(k, k), strides=(s, s), padding="VALID",
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        h = nn.relu(nn.Dense(512, dtype=self.dtype)(x))
        logits = nn.Dense(
            self.n_actions, dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(h)
        value = nn.Dense(
            1, dtype=jnp.float32, kernel_init=nn.initializers.orthogonal(1.0)
        )(h)
        return logits, value.squeeze(-1)


class ActorCriticCNN(nn.Module):
    """PPO actor-critic with a shared conv trunk.

    Role parity: examples/train_ppo.py:91-124 (shared trunk, orthogonal-init
    heads with small policy gain).
    """

    n_actions: int = 8
    features: Sequence[int] = (32, 64, 128)
    strides: object = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, boards: jnp.ndarray):
        h = BoardEncoder(
            features=self.features, strides=self.strides, dtype=self.dtype
        )(boards)
        logits = nn.Dense(
            self.n_actions,
            dtype=jnp.float32,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(h)
        value = nn.Dense(
            1, dtype=jnp.float32, kernel_init=nn.initializers.orthogonal(1.0)
        )(h)
        return logits, value.squeeze(-1)


class QMLP(nn.Module):
    """Feature-vector Q-net for the grouped placement env.

    Scores one placement's feature vector -> scalar value; applied vmapped
    over all ``width*4`` candidates.  Role parity:
    examples/train_lin_grouped.py:157-175.
    """

    hidden: Sequence[int] = (64, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = features.astype(self.dtype)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=jnp.float32)(x).squeeze(-1)


class QGroupedBoardsCNN(nn.Module):
    """Per-candidate board-image Q-net for the grouped placement env.

    Scores every candidate's post-placement binary board (turbo grouped
    ``mode="boards"``, the reference grouped env's default observation,
    ref: wrappers/grouped.py:67-72): ``[B, A, H, W] -> [B, A]``.  The
    candidate axis folds into the conv batch, so all ``B*A`` boards run as
    one MXU-friendly convolution batch.
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, boards: jnp.ndarray) -> jnp.ndarray:
        lead = boards.shape[:-2]
        x = boards.reshape((-1,) + boards.shape[-2:])  # [B*A, H, W]
        h = BoardEncoder(dtype=self.dtype)(x)
        q = nn.Dense(1, dtype=jnp.float32)(h)
        return q.reshape(lead)
