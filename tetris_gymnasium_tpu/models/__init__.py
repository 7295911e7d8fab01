"""Flax network families for the RL examples."""
from tetris_gymnasium_tpu.models.networks import (
    ActorCriticCNN,
    AtariQNetwork,
    BoardEncoder,
    QGroupedBoardsCNN,
    QMLP,
    QNetworkCNN,
)

__all__ = ["ActorCriticCNN", "AtariQNetwork", "BoardEncoder", "QGroupedBoardsCNN", "QMLP", "QNetworkCNN"]
