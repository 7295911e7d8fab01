"""Gymnasium wrappers over the TPU engine (thin numpy boundaries)."""
from tetris_gymnasium_tpu.wrappers.grouped import GroupedActionsObservations
from tetris_gymnasium_tpu.wrappers.observation import (
    FeatureVectorObservation,
    RgbObservation,
)

__all__ = [
    "FeatureVectorObservation",
    "GroupedActionsObservations",
    "RgbObservation",
]
