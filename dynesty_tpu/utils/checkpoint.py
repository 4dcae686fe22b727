"""Whole-sampler checkpointing: pickle with a format version, written
atomically (tmp + rename), with pool/mapper re-attachment on restore.

Mirrors the reference protocol (``utils.py:2242-2355``).  The sampler
state is plain host data (numpy arrays + Python scalars + the RunRecord),
so pickling is exact and resume is bit-identical; JAX PRNG keys are stored
as their (algorithm-tagged) uint32 key data.
"""

import os
import pickle
import shutil
import sys

import numpy as np

from .._version import __version__

__all__ = ["save_sampler", "restore_sampler"]

# 2: per-point birth thresholds added to live state and records
FORMAT_VERSION = 2


def save_sampler(sampler, fname):
    """Atomically pickle ``sampler`` (and metadata) to ``fname``."""
    payload = {
        "sampler": sampler,
        "version": __version__,
        "format_version": FORMAT_VERSION,
    }
    tmp_fname = fname + ".tmp"
    try:
        with open(tmp_fname, "wb") as fp:
            pickle.dump(payload, fp)
        try:
            os.rename(tmp_fname, fname)
        except FileExistsError:
            # Windows semantics: rename onto an existing file fails.
            shutil.move(tmp_fname, fname)
    except:  # noqa: E722 -- clean up the partial file on any failure
        try:
            os.unlink(tmp_fname)
        except OSError:
            pass
        raise


def restore_sampler(fname, pool=None, mesh=None):
    """Unpickle a sampler saved by :func:`save_sampler`, re-attaching the
    given pool (and its map/queue_size) and device ``mesh`` to the
    sampler and any nested batch samplers.  Meshes are process-local so
    they are never pickled; pass ``mesh=`` here to continue a sharded
    run.  The saved queue widths must divide by the new mesh size —
    resumes are bit-exact only when the proposal widths are unchanged,
    so a non-divisible mesh is rejected instead of re-clamped."""
    with open(fname, "rb") as fp:
        payload = pickle.load(fp)
    format_version = payload.get("format_version")
    if format_version != FORMAT_VERSION:
        raise ValueError(
            f"Incorrect checkpoint format version {format_version} "
            f"(expected {FORMAT_VERSION})")
    save_ver = payload.get("version")
    if save_ver != __version__:
        print(f"Warning: checkpoint written by dynesty_tpu {save_ver}, "
              f"restoring with {__version__}", file=sys.stderr)
    sampler = payload["sampler"]

    if pool is not None:
        mapper = pool.map
        queue_size = getattr(pool, "size", None) or \
            getattr(pool, "_processes", None)
    else:
        mapper = map
        queue_size = None

    for obj in _samplers_to_rebind(sampler):
        obj.pool = pool
        obj.mapper = mapper
        if queue_size is not None and getattr(obj, "queue_size", None) is None:
            obj.queue_size = queue_size
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            # every dispatch width the sampler may use must shard evenly:
            # queue_size plus the adaptive endgame widths (_q_full /
            # _q_narrow, sampler.py), which a bracketed batch dispatches
            # directly — a width that passes queue_size but not the
            # narrow one would crash mid-endgame in shard_batch
            widths = {"queue_size": getattr(obj, "queue_size", None),
                      "_q_full": getattr(obj, "_q_full", None),
                      "_q_narrow": getattr(obj, "_q_narrow", None)}
            for name, q in widths.items():
                if q and q % mesh.size:
                    raise ValueError(
                        f"Saved {name} {q} does not divide by the mesh "
                        f"size {mesh.size}; restore with a compatible "
                        "mesh (or none) to keep the resume bit-exact.")
        if hasattr(obj, "mesh"):
            obj.mesh = mesh
        ll = getattr(obj, "loglikelihood", None)
        if ll is not None and hasattr(ll, "pool"):
            ll.pool = pool
    return sampler


def _samplers_to_rebind(sampler):
    """The sampler plus any nested inner/batch samplers that hold pool
    references."""
    out = [sampler]
    for attr in ("sampler", "batch_sampler"):
        inner = getattr(sampler, attr, None)
        if inner is not None:
            out.append(inner)
    return out


def as_key_data(key):
    """Serialize a JAX PRNG key to uint32 data (for state dicts)."""
    import jax

    return np.asarray(jax.random.key_data(key))


def from_key_data(data, impl=None):
    """Rebuild a JAX PRNG key from uint32 data."""
    import jax

    return jax.random.wrap_key_data(np.asarray(data), impl=impl)
