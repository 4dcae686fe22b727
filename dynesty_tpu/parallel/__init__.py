"""Multi-chip scaling: shard the proposal batch over a device mesh.

The reference's only parallelism axis is its proposal queue mapped over a
process pool (``pool.py``, SURVEY §2.2); here the same axis is the ``Q``
dimension of each jitted proposal round, sharded across chips with
``jax.sharding`` so the batched user likelihood runs data-parallel over
ICI.  Host orchestration stays single-process.
"""

from .mesh import make_mesh, shard_batch, batch_sharding
from .telemetry import scaling_report

__all__ = ["make_mesh", "shard_batch", "batch_sharding", "scaling_report"]
