"""Flax network families for the RL examples."""
from tetris_gymnasium_tpu.models.networks import (
    ActorCriticCNN,
    BoardEncoder,
    QMLP,
    QNetworkCNN,
)

__all__ = ["ActorCriticCNN", "BoardEncoder", "QMLP", "QNetworkCNN"]
