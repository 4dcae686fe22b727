"""Top-level ``internal_samplers`` module for reference namespace parity
(``dynesty/internal_samplers.py:33-866``): the proposal-kernel framework
— the :class:`InternalSampler` ABC, the four built-in kernels, and the
registry list — re-exported from their TPU-native home in
``dynesty_tpu.internal.samplers``."""

from .internal.samplers import (
    INTERNAL_SAMPLER_LIST,
    InternalSampler,
    UnitCubeSampler,
    UniformBoundSampler,
    RWalkSampler,
    SliceSampler,
    RSliceSampler,
)

__all__ = [
    "INTERNAL_SAMPLER_LIST",
    "InternalSampler",
    "UnitCubeSampler",
    "UniformBoundSampler",
    "RWalkSampler",
    "SliceSampler",
    "RSliceSampler",
]
