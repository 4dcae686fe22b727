"""Device-side internals: the batched likelihood wrapper, bound sampling,
and the vmapped constrained-proposal kernels that form one jitted
"proposal round" per queue refill."""

from .likelihood import LogLikelihood, LoglOutput
from .samplers import (
    InternalSampler,
    UnitCubeSampler,
    UniformBoundSampler,
    RWalkSampler,
    SliceSampler,
    RSliceSampler,
    INTERNAL_SAMPLER_LIST,
    get_internal_sampler,
)

__all__ = [
    "LogLikelihood",
    "LoglOutput",
    "InternalSampler",
    "UnitCubeSampler",
    "UniformBoundSampler",
    "RWalkSampler",
    "SliceSampler",
    "RSliceSampler",
    "INTERNAL_SAMPLER_LIST",
    "get_internal_sampler",
]
