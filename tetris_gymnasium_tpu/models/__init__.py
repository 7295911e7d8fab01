"""Flax network families for the RL examples."""
from tetris_gymnasium_tpu.models.networks import (
    ActorCriticCNN,
    AtariActorCritic,
    AtariQNetwork,
    BoardEncoder,
    QGroupedBoardsCNN,
    QMLP,
    QNetworkCNN,
)

__all__ = ["ActorCriticCNN", "AtariActorCritic", "AtariQNetwork", "BoardEncoder", "QGroupedBoardsCNN", "QMLP", "QNetworkCNN"]
