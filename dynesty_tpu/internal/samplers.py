"""Host-side proposal-kernel drivers ("internal samplers").

Each class owns the tuning state (proposal ``scale``, accept/expand
histories) and a cache of jitted round functions from
:mod:`dynesty_tpu.internal.kernels`.  One ``propose_round`` call replaces
the reference's ``queue_size`` pool-mapped ``sample()`` calls
(``sampler.py:676-717``, ``internal_samplers.py``): it runs a single
compiled device round producing ``Q`` proposals, which the nested sampler
consumes FIFO.

Tuning parity: the reference accumulates per-proposal tuning info and
applies the scale update when its queue drains
(``sampler.py:757-764``); a round IS a full queue here, so ``tune`` is
called once per round with the aggregated statistics.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from .fused import make_fused_round, select_starts, unpack_flat
from .kernels import (make_ellipsoid_refit, make_rwalk_round,
                      make_slice_round, make_unif_round, pad_ellipsoids)

__all__ = [
    "InternalSampler", "UnitCubeSampler", "UniformBoundSampler",
    "RWalkSampler", "SliceSampler", "RSliceSampler",
    "INTERNAL_SAMPLER_LIST", "get_internal_sampler",
]

INTERNAL_SAMPLER_LIST = ["rwalk", "unif", "rslice", "slice"]

# Process-wide cache of built fused/replay round functions.  A jit trace
# + lowering costs seconds of host Python even when the persistent
# compile cache hits, and every NestedSampler (including each dynamic
# batch sampler) gets a fresh InternalSampler whose per-instance cache
# starts empty — so repeated runs over the same user functions and
# static configuration share traces here instead of re-tracing.
_GLOBAL_ROUND_CACHE = {}


def _hashable_mask(x):
    """Hashable form of an index/mask array kwarg (pass-through for
    already-hashable values).  Raises TypeError when impossible, which
    disables global caching for that configuration."""
    try:
        hash(x)
        return x
    except TypeError:
        arr = np.asarray(x)
        if arr.dtype == object:
            raise TypeError("unhashable sampler kwarg")
        return (arr.shape, arr.dtype.str, tuple(arr.ravel().tolist()))


class InternalSampler:
    """Base class: holds kwargs (periodic/reflective/nonbounded masks,
    ndim/ncdim), the proposal scale, and the jitted-round cache."""

    # Cap on fused rounds chained per device dispatch.  Bound refits
    # only happen at dispatch boundaries, so kernels whose efficiency
    # decays as the volume shrinks between refits must keep dispatches
    # short (None = use the sampler's rounds_per_dispatch unchanged).
    max_rounds_per_dispatch = None

    # Skip chained rounds past an in-flight stopping cause entirely
    # (fused.py gate_on_done).  On for the rejection kernels, whose
    # stranded rounds bill a full fill of evaluations; off for the MCMC
    # kernels, where the carry-dependent cond costs XLA scan pipelining
    # and the host's est-based rounds_active already bounds overshoot.
    gate_rounds_on_done = False

    def __init__(self, **kwargs):
        self.scale = 1.0
        self.input_kwargs = kwargs
        self.sampler_kwargs = {}
        self.ndim = kwargs.get("ndim")
        self.ncdim = kwargs.get("ncdim") or self.ndim
        for k in ("nonbounded", "periodic", "reflective", "nonperiodic"):
            self.sampler_kwargs[k] = kwargs.get(k)
        self._round_cache = {}

    @property
    def update_bound_interval_ratio(self):
        """Bound-update cadence in units of ncall per live point."""
        return 1

    def _max_rounds(self, ns, bound_kind):
        """Per-configuration cap on chained rounds (None = no cap)."""
        return self.max_rounds_per_dispatch

    def _new_from_template(self, template_kwargs):
        """Clone with extra defaults (used when the factory passes
        boundary masks to a user-constructed instance)."""
        merged = dict(self.input_kwargs)
        for k, v in template_kwargs.items():
            if k not in merged:
                merged[k] = v
        return self.__class__(**merged)

    def _cached_round(self, key, builder):
        fn = self._round_cache.get(key)
        if fn is None:
            fn = builder()
            self._round_cache[key] = fn
        return fn

    def _gather_starts(self, nested_sampler, loglstar, q):
        """Pick Q start points (live points above loglstar) and per-lane
        random axes from the current bound."""
        live_logl = nested_sampler.live_logl
        valid = np.nonzero(live_logl > loglstar)[0]
        if len(valid) == 0:
            raise RuntimeError(
                "No live points are above loglstar. Do you have a "
                "likelihood plateau, or are you sampling excessively "
                "around the peak of the posterior?")
        rstate = nested_sampler.rstate
        idxs = valid[rstate.integers(0, len(valid), size=q)]
        # A start point outside the bound forces a refit (reference
        # sampler.py:483-491).
        nested_sampler.ensure_startpoints_bounded(idxs)
        starts_u = np.array(nested_sampler.live_u[idxs])
        starts_v = np.array(nested_sampler.live_v[idxs])
        starts_logl = np.array(live_logl[idxs])
        if nested_sampler.blob:
            starts_blob = np.array(
                [nested_sampler.live_blobs[i] for i in idxs])
        else:
            starts_blob = None
        axes = np.array([
            nested_sampler.bound.get_random_axes(rstate)
            for _ in range(q)
        ])
        # one packed host->device upload per round (fixed per-buffer cost)
        packed = np.concatenate([
            starts_u, starts_v, starts_logl[:, None],
            axes.reshape(q, -1)
        ], axis=1)
        mesh = getattr(nested_sampler, "mesh", None)
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            packed = shard_batch(mesh, packed.astype(
                np.dtype(nested_sampler.dtype)))
            if starts_blob is not None:
                starts_blob = shard_batch(mesh, starts_blob)
        return packed, starts_blob

    def propose_round(self, nested_sampler, loglstar, q, key):
        """Run one device round; return (list of per-proposal dicts,
        aggregated tuning_info or None)."""
        raise NotImplementedError

    # -- fused propose+consume path ------------------------------------

    def _build_propose_fn(self, nested_sampler, bound_kind):
        """Traceable propose_fn(k_sel, k_prop, live, live_blob,
        axes_args, scale, loglstar) for :func:`make_fused_round`."""
        raise NotImplementedError

    def get_fused(self, nested_sampler, bound_kind):
        """(fused_fn, layout) for the current configuration, cached
        per-instance and (when safe) process-wide, so fresh sampler
        objects over the same user functions reuse the existing trace."""
        ns = nested_sampler
        rounds = getattr(ns, "rounds_per_dispatch", 1)
        cap = self._max_rounds(ns, bound_kind)
        if cap is not None:
            rounds = min(rounds, cap)
        mode = getattr(ns, "proposal_mode", "batch")
        mesh = getattr(ns, "mesh", None)
        cfg = ("fused", bound_kind, ns.queue_size, ns.nlive, rounds,
               mode, mesh, self._fused_cfg_key())
        entry = self._round_cache.get(cfg)
        if entry is not None:
            return entry
        gkey = None
        if bound_kind != "custom":
            lkey = ns.loglikelihood.trace_cache_key()
            if lkey is not None:
                try:
                    # jax.sharding.Mesh hashes by device set + axis names,
                    # so same-mesh samplers share the trace
                    gkey = (type(self).__name__, cfg, self.ndim,
                            self.ncdim, ns.dtype, bool(ns.blob), lkey,
                            tuple(sorted(
                                (k, _hashable_mask(v))
                                for k, v in self.sampler_kwargs.items())))
                except TypeError:
                    gkey = None
        if gkey is not None:
            entry = _GLOBAL_ROUND_CACHE.get(gkey)
            if entry is not None:
                self._round_cache[cfg] = entry
                return entry
        propose_fn = self._build_propose_fn(ns, bound_kind)
        entry = make_fused_round(
            propose_fn, kind=getattr(self, "name", "?"),
            nlive=ns.nlive, ndim=self.ndim,
            npdim=ns.loglikelihood.npdim, q=ns.queue_size,
            dtype=ns.dtype, blob=ns.blob, rounds=rounds,
            tune_fn=self.device_tune_fn(), mode=mode, mesh=mesh,
            chain_stop_fn=self.device_chain_stop_fn(),
            gate_on_done=self.gate_rounds_on_done)
        self._round_cache[cfg] = entry
        if gkey is not None:
            _GLOBAL_ROUND_CACHE[gkey] = entry
        return entry

    def _fused_cfg_key(self):
        return ()

    def launch_fused(self, nested_sampler, key, live_packed, live_blob,
                     axes_args, integ, limits, rounds_active=None,
                     rounds_skip=0):
        """Launch one fused round asynchronously (JAX async dispatch);
        returns a handle dict of device arrays for :meth:`finish_fused`.
        ``rounds_active`` caps the chained rounds that actually
        consume/bill work this dispatch (same compiled program; see
        make_fused_round); ``rounds_skip`` skips the leading rounds
        (continuation of a budget-interrupted dispatch with its
        original key)."""
        bound_kind = nested_sampler.device_bound_kind()
        fused_fn, layout = self.get_fused(nested_sampler, bound_kind)
        if rounds_active is None:
            rounds_active = layout["rounds"]
        rounds_active = min(max(int(rounds_active), 1), layout["rounds"])
        ns = nested_sampler
        ctrl = jnp.asarray(
            np.concatenate([integ, limits,
                            [self.scale, 0.0, float(rounds_active),
                             -1e30, float(rounds_skip),
                             # [18:21] chain-stop gate inputs (unit-cube
                             # first-update check; dead inputs for
                             # ungated programs): cumulative ncall at
                             # launch, min_ncall, min_eff
                             float(ns.ncall),
                             float(getattr(ns, "first_bound_update_ncall",
                                           0.0)),
                             float(getattr(ns, "first_bound_update_eff",
                                           0.0)),
                             # [21] absolute ncall at which the next host
                             # decomposition refit is due (the reference's
                             # bound_update_interval cadence,
                             # sampler.py:625-674); 2^30 disarms the gate
                             self._refit_due_ncall(ns)]]),
            nested_sampler.dtype)
        return self._launch(fused_fn, layout, key, live_packed, live_blob,
                            axes_args, ctrl, rounds_active)

    def _launch(self, fused_fn, layout, key, live_packed, live_blob,
                axes_args, ctrl, rounds_active):
        flat, proposals, live_out, live_blob_out, old_blobs, qblob = \
            fused_fn(key, live_packed, live_blob, axes_args, ctrl)
        # enqueue the device->host copies of everything the host will
        # consume, smallest first: the relay's D2H queue is FIFO and
        # dispatches complete in order, so pre-registering (live, blobs,
        # flat) per dispatch means every later host fetch finds its
        # bytes cached instead of paying a ~25 ms cold-RPC sync — and a
        # refit-triggered live-mirror fetch never queues behind a big
        # compute-dependent flat transfer.
        try:
            live_out.copy_to_host_async()
            if old_blobs is not None:
                jax.tree.map(lambda b: b.copy_to_host_async(), old_blobs)
            flat.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        return {"flat": flat, "proposals": proposals, "live": live_out,
                "live_blob": live_blob_out, "old_blobs": old_blobs,
                "qblob": qblob, "layout": layout, "ctrl": ctrl,
                "rounds_active": rounds_active}

    def finish_fused(self, handle):
        """Block on a launched fused round; returns the unpacked host
        dict plus the (live, live_blob, old_blobs) device trees."""
        out = unpack_flat(jax.device_get(handle["flat"]),
                          handle["layout"])
        out["qblob"] = handle["qblob"]
        out["proposals_dev"] = handle["proposals"]  # fetched only for
        # leftover replay
        return (out, handle["live"], handle["live_blob"],
                handle["old_blobs"])

    def run_fused(self, nested_sampler, key, live_packed, live_blob,
                  axes_args, integ, limits, rounds_active=None,
                  rounds_skip=0):
        """Execute one fused round synchronously (launch + finish);
        returns the unpacked host dict plus the (live, live_blob,
        old_blobs) device trees."""
        handle = self.launch_fused(nested_sampler, key, live_packed,
                                   live_blob, axes_args, integ, limits,
                                   rounds_active=rounds_active,
                                   rounds_skip=rounds_skip)
        return self.finish_fused(handle)

    def get_replay(self, nested_sampler):
        """Consume-only fused round: replays externally supplied
        proposal entries (leftovers from an interrupted round)."""
        ns = nested_sampler
        mode = getattr(ns, "proposal_mode", "batch")
        cfg = ("replay", ns.queue_size, ns.nlive, mode)
        entry = self._round_cache.get(cfg)
        if entry is None:
            ndim = self.ndim
            npdim = ns.loglikelihood.npdim
            # the replay round never calls the likelihood (entries carry
            # their logl), so the global key is purely structural
            gkey = ("replay", ns.queue_size, ns.nlive, ndim, npdim,
                    ns.dtype, bool(ns.blob), mode)
            entry = _GLOBAL_ROUND_CACHE.get(gkey)
            if entry is not None:
                self._round_cache[cfg] = entry
                return entry
            il = ndim + npdim

            def propose(k_sel, k_prop, live, live_blob, axes_args, scale,
                        loglstar):
                ent = axes_args
                qblob = ent.get("qblob")
                stats = (jnp.zeros((), ns.dtype),)
                return (ent["prop"][:, :ndim], ent["prop"][:, ndim:il],
                        ent["prop"][:, il],
                        qblob,
                        ent["prop"][:, il + 1].astype(jnp.int32), stats,
                        ent["prop"][:, il + 2:il + 4])

            entry = make_fused_round(
                propose, kind="replay", nlive=ns.nlive, ndim=ndim,
                npdim=npdim, q=ns.queue_size, dtype=ns.dtype,
                blob=ns.blob, mode=mode)
            self._round_cache[cfg] = entry
            _GLOBAL_ROUND_CACHE[gkey] = entry
        return entry

    def run_replay(self, nested_sampler, key, live_packed, live_blob,
                   prop, prop_blob, integ, limits, kills0=0,
                   birth0=-1e30):
        fused_fn, layout = self.get_replay(nested_sampler)
        args = {"prop": prop}
        if nested_sampler.blob:
            args["qblob"] = prop_blob
        ctrl = np.concatenate([integ, limits,
                               [self.scale, float(kills0), 1.0,
                                max(float(birth0), -1e30), 0.0,
                                0.0, 0.0, 0.0]])
        flat, proposals, live_out, live_blob_out, old_blobs, qblob = \
            fused_fn(key, live_packed, live_blob, args,
                     jnp.asarray(ctrl, nested_sampler.dtype))
        out = unpack_flat(jax.device_get(flat), layout)
        out["stats"] = None
        out["qblob"] = qblob
        out["proposals_dev"] = proposals
        return out, live_out, live_blob_out, old_blobs

    def device_tune_fn(self):
        """Traceable ``(scale, stats_vec) -> scale`` update applied on
        device between the fused call's inner rounds (the reference's
        queue-drain tuning cadence); None if the kernel has no scale
        tuning."""
        return None

    def device_chain_stop_fn(self):
        """Traceable ``(integ, counters, ctrl) -> bool`` evaluated at
        every chained round's start; True stops the chain (later rounds
        run nothing and bill nothing).  None = no gate."""
        return None

    # Stop the round chain once the host's ncall-cadence bound refit is
    # due (reference ``sampler.py:625-674`` checks at every queue
    # drain).  Opt-in per kernel: meaningful where the bound's SPLIT
    # STRUCTURE ages between host refits (uniform sampling from
    # multi-ellipsoid stacks — the device per-round refit re-shapes the
    # existing ellipsoids but cannot re-decompose, so a thinning
    # multimodal/annular region needs host resplits at the reference
    # cadence; measured +15% shells ncall without it).
    chain_stop_on_refit_due = False

    def _refit_due_ncall(self, ns):
        """ctrl[21]: absolute ncall at which the next host refit is due,
        or 2^30 (gate disarmed).  Armed only when the kernel opted in
        and the current decomposition is non-trivial — single-ellipsoid
        stacks are fully refreshed by the device per-round refit, so
        deep chains stay deep (heavy-likelihood dispatch amortization).
        Pure function of pickled state (ncall / ncall_at_last_update /
        bound), so resumed dispatches rebuild the identical gate."""
        if (not self.chain_stop_on_refit_due
                or ns.unit_cube_sampling
                or getattr(ns.bound, "nells", 1) <= 1):
            return 2.0 ** 30
        return float(min(ns.ncall_at_last_update +
                         ns.bound_update_interval, 2.0 ** 30))

    def apply_fused_tuning(self, out):
        """Adopt the tuning outcome of one fused dispatch on the host."""
        if self.device_tune_fn() is not None:
            self.scale = float(out["scale_final"])
            self._post_fused_stats(out.get("stats"))
        elif out.get("stats") is not None:
            tinfo = self.consume_tuning(out["stats"])
            if tinfo is not None:
                self.tune(tinfo, update=True)

    def _post_fused_stats(self, stats):
        """Kernel-specific non-scale bookkeeping from the dispatch's
        aggregated stats (e.g. the slice expansion warning)."""

    def consume_tuning(self, stats):
        """Convert the fused round's stats vector into a tuning_info
        dict (kernel specific); None if the kernel has no tuning."""
        return None

    def row_stats(self, a, b):
        """Per-record proposal_stats dict from the two per-lane stat
        columns (kernel specific)."""
        return {"n_proposals": max(int(a), 1)}

    def tune(self, tuning_info, update=False):
        """Accumulate round statistics; apply the scale update if
        ``update``."""

    @property
    def citations(self):
        return []

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_round_cache"] = {}
        return state


def _unpack_rows(packed, blob, ndim, npdim, extra_names, stats_fn,
                 nc_from=None):
    """Split the packed (q, W) round output into a FIFO list of proposal
    dicts.  Column layout: u | v | logl | extras."""
    q = packed.shape[0]
    u = np.asarray(packed[:, :ndim], dtype=np.float64)
    v = np.asarray(packed[:, ndim:ndim + npdim], dtype=np.float64)
    logl = np.asarray(packed[:, ndim + npdim], dtype=np.float64)
    extras = {}
    for j, name in enumerate(extra_names):
        extras[name] = packed[:, ndim + npdim + 1 + j]
    blob = np.asarray(blob) if blob is not None else None
    rows = []
    for i in range(q):
        rows.append({
            "u": u[i],
            "v": v[i],
            "logl": logl[i],
            "nc": int(nc_from(i, extras)) if nc_from else None,
            "blob": blob[i] if blob is not None else None,
            "proposal_stats": stats_fn(i, extras),
        })
    return rows, extras


def _warn_unif_inefficiency(n_prop, q):
    """Host-side analogue of the reference's 10000-fruitless-tries
    warning (``internal_samplers.py:309-319``): one wave is one candidate
    per lane, so n_prop/q waves ~ tries per point."""
    if n_prop >= 10000 * q:
        import warnings
        warnings.warn(
            "Uniform bound sampling is extremely inefficient "
            f"({n_prop} candidates for {q} accepted points)",
            category=RuntimeWarning)


def _unif_propose_fn(sampler, ns, bound_kind):
    """Shared propose_fn builder for uniform-style kernels."""
    from ..parallel.mesh import lane_constrainer
    like = ns.loglikelihood
    ndim, ncdim, q = sampler.ndim, sampler.ncdim, ns.queue_size
    npdim = like.npdim
    il = ndim + npdim
    constrain = lane_constrainer(getattr(ns, "mesh", None))
    refit = None
    if isinstance(sampler, UnitCubeSampler):
        inner = make_unif_round(like, ndim=ndim, ncdim=ndim, q=q,
                                bound_kind="cube", dtype=ns.dtype,
                                constrain=constrain)
    else:
        def host_sampler():
            pts = np.asarray(ns.bound.samples(q, rstate=ns.rstate))
            return pts[:, :ncdim].astype(np.dtype(ns.dtype))

        inner = make_unif_round(
            like, ndim=ndim, ncdim=ncdim, q=q, bound_kind=bound_kind,
            nonbounded=sampler.sampler_kwargs.get("nonbounded"),
            dtype=ns.dtype, host_sampler=host_sampler,
            constrain=constrain)
        if bound_kind == "ellipsoids":
            # per-round device refit: rejection efficiency tracks bound
            # freshness, so chained rounds re-fit the ellipsoid stack
            # from the current live points before every round (the host
            # BIC resplit + bootstrap still runs at dispatch boundaries)
            refit = make_ellipsoid_refit(ncdim, dtype=ns.dtype)

    def propose(k_sel, k_prop, live, live_blob, axes_args, scale,
                loglstar):
        if refit is not None:
            arrays = dict(axes_args)
            arrays.update(refit(live[:, :ncdim], axes_args))
            axes_args = arrays
        packed, blob_out = inner(k_prop, loglstar, axes_args)
        qu = packed[:, :ndim]
        qv = packed[:, ndim:il]
        qlogl = packed[:, il]
        # exact per-slot evaluation counts attributed by the wave loop
        # (sum equals the round total)
        qnc = packed[:, il + 1].astype(jnp.int32)
        stats = (packed[0, il + 2], packed[0, il + 3], packed[0, il + 4])
        lane_stats = jnp.stack([qnc.astype(packed.dtype),
                                jnp.zeros((q,), packed.dtype)], axis=1)
        return qu, qv, qlogl, blob_out, qnc, stats, lane_stats

    return propose


class UnitCubeSampler(InternalSampler):
    """Rejection sampling from the whole unit cube (active before the
    first bound update)."""

    name = "unitcube"
    # Unit-cube rounds CAN chain: the device-side chain-stop gate
    # (device_chain_stop_fn) replicates the host's first-bound-update
    # trigger at every round boundary — the reference's queue-drain
    # cadence — so a chain stops exactly where the synchronous host
    # check would have fired, and the gated tail rounds run nothing and
    # bill nothing.  Capped at 8: each extra round only pays off while
    # prior rejection is still efficient, and the flat record buffer
    # (and its relay transfer) grows with the chain depth.
    max_rounds_per_dispatch = 8

    def _build_propose_fn(self, ns, bound_kind):
        return _unif_propose_fn(self, ns, "cube")

    def device_chain_stop_fn(self):
        """First-bound-update trigger (reference ``sampler.py:625-674``):
        stop chaining once sampling efficiency drops below min_eff with
        at least min_ncall calls spent.  Inputs from ctrl[18:21] =
        (cumulative ncall at launch, min_ncall, min_eff); eff matches
        the host's ``100*(it-1)/ncall`` at the same round boundary."""
        def gate(integ, counters, ctrl):
            dt = ctrl.dtype
            ncall_now = ctrl[18] + counters["nc_used"].astype(dt)
            eff = 100.0 * (integ["it"].astype(dt) - 1.0) / \
                jnp.maximum(ncall_now, 1.0)
            return (eff < ctrl[20]) & (ncall_now >= ctrl[19])
        return gate

    def consume_tuning(self, stats):
        # stats = (nc_total, n_proposals, n_filled): no scale tuning, but
        # surface the rejection-inefficiency warning on the host
        if stats is not None and len(stats) >= 2:
            _warn_unif_inefficiency(int(stats[1]), max(int(stats[2]), 1))
        return None

    def propose_round(self, nested_sampler, loglstar, q, key):
        like = nested_sampler.loglikelihood
        fn = self._cached_round(
            ("cube", q),
            lambda: make_unif_round(like, ndim=self.ndim, ncdim=self.ndim,
                                    q=q, bound_kind="cube",
                                    dtype=nested_sampler.dtype))
        packed, blob = jax.device_get(fn(key, loglstar, {}))
        return self._unif_rows(packed, blob, like, q)

    def _unif_rows(self, packed, blob, like, q):
        ndim, npdim = self.ndim, like.npdim
        n_filled = int(packed[0, ndim + npdim + 4])
        if n_filled < q:
            raise RuntimeError("Uniform sampling failed to find enough "
                               f"points above loglstar ({n_filled}/{q}).")
        n_prop = int(packed[0, ndim + npdim + 3])
        _warn_unif_inefficiency(n_prop, q)
        # exact per-slot evaluation counts attributed by the wave loop
        nc = np.asarray(packed[:, ndim + npdim + 1], dtype=np.int64)
        rows, _ = _unpack_rows(
            packed, blob, ndim, npdim, (),
            lambda i, e: {"n_proposals": max(n_prop // q, 1)},
            nc_from=lambda i, e: nc[i])
        return rows, None


class UniformBoundSampler(InternalSampler):
    """Uniform sampling within the current bounding distribution
    ('unif')."""

    name = "unif"
    gate_rounds_on_done = True
    # Rejection efficiency tracks how tightly the bound hugs the
    # constrained region, so stale bounds are expensive: without a
    # per-round refit, chaining rounds was measured to cost far more in
    # extra rejections (+37% ncall on the eggbox) than the saved
    # dispatch latency.  Ellipsoid-stack bounds now get a DEVICE-side
    # refit before every chained round (make_ellipsoid_refit), which
    # keeps the fit fresh between host refits — those still run the
    # full BIC resplit + bootstrap at dispatch boundaries, so the split
    # STRUCTURE ages at most `unif_max_chain` rounds.  Friends bounds
    # (ball/cube kernels re-centered on the live points) and custom
    # host-sampled bounds still run one round per dispatch.
    max_rounds_per_dispatch = 1
    unif_max_chain = 8

    def _max_rounds(self, ns, bound_kind):
        if bound_kind == "ellipsoids":
            # device refits keep the fit fresh between host refits, so
            # when the user explicitly sets rounds_per_dispatch
            # (expensive-likelihood regime: dispatch amortization beats
            # bound-structure staleness) honor it unclamped
            if getattr(ns, "rounds_explicit", False):
                return None
            # dynamic-batch samplers run narrow bracketed queues where a
            # deeper chain amortizes many short dispatches; the batch
            # configurator raises this per-sampler override
            cap = getattr(ns, "unif_chain_cap", None)
            if cap is not None:
                return cap
            return self.unif_max_chain
        # friends/custom bounds take fresh host-side centers every
        # dispatch — chaining would sample from stale geometry
        return 1

    def propose_round(self, nested_sampler, loglstar, q, key):
        like = nested_sampler.loglikelihood
        bound = nested_sampler.bound
        spec = bound.device_spec()
        if spec is None:
            raise RuntimeError(
                f"Bound {type(bound).__name__} has no device sampling "
                "spec; use rwalk/rslice/slice with custom bounds.")
        kind, arrays = spec
        # bound arrays change only at refits: cache the device upload
        version = getattr(nested_sampler, "bound_version", 0)
        cached = self._round_cache.get("_bound_arrays")
        if cached is not None and cached[0] == version and \
                cached[1] == kind:
            dev_arrays = cached[2]
        else:
            if kind == "ellipsoids":
                arrays = pad_ellipsoids(arrays["ctrs"], arrays["axes"],
                                        arrays["ams"], arrays["logvols"])
            else:
                arrays = dict(arrays)
            dev_arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
            self._round_cache["_bound_arrays"] = (version, kind, dev_arrays)
        if kind in ("balls", "cubes"):
            # centers follow the live points every round
            dev_arrays = dict(dev_arrays)
            dev_arrays["ctrs"] = jnp.asarray(np.asarray(bound.ctrs))
        fn = self._cached_round(
            (kind, q),
            lambda: make_unif_round(
                like, ndim=self.ndim, ncdim=self.ncdim, q=q,
                bound_kind=kind,
                nonbounded=self.sampler_kwargs.get("nonbounded"),
                dtype=nested_sampler.dtype))
        packed, blob = jax.device_get(fn(key, loglstar, dev_arrays))
        return self._unif_rows(packed, blob, like, q)

    _unif_rows = UnitCubeSampler._unif_rows
    consume_tuning = UnitCubeSampler.consume_tuning

    chain_stop_on_refit_due = True

    def device_chain_stop_fn(self):
        """Host-refit-due trigger: stop the chain at the first round
        boundary where cumulative ncall crosses the bound-refit cadence
        (ctrl[21], see _refit_due_ncall) so the host BIC resplit runs at
        the reference's queue-drain cadence instead of once per deep
        dispatch.  The unif wave loop is already carry-dependent
        (gate_rounds_on_done), so the extra gate costs no scan
        pipelining."""
        def gate(integ, counters, ctrl):
            dt = ctrl.dtype
            ncall_now = ctrl[18] + counters["nc_used"].astype(dt)
            return ncall_now >= ctrl[21]
        return gate

    def _build_propose_fn(self, ns, bound_kind):
        return _unif_propose_fn(self, ns, bound_kind)


class RWalkSampler(InternalSampler):
    """Random walks within the scaled bounding ellipsoid ('rwalk')."""

    name = "rwalk"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        walks = max(2, kwargs.get("walks") or 25)
        facc = kwargs.get("facc") or 0.5
        self.walks = walks
        self.facc = min(1.0, max(1.0 / walks, facc))
        self.rwalk_history = {"n_accept": 0, "n_reject": 0}

    @property
    def update_bound_interval_ratio(self):
        return self.walks

    def propose_round(self, nested_sampler, loglstar, q, key):
        like = nested_sampler.loglikelihood
        packed_in, sb = self._gather_starts(nested_sampler, loglstar, q)
        fn = self._cached_round(
            ("rwalk", q, self.walks),
            lambda: make_rwalk_round(
                like, ndim=self.ndim, ncdim=self.ncdim, q=q,
                walks=self.walks,
                nonbounded=self.sampler_kwargs.get("nonbounded"),
                periodic=self.sampler_kwargs.get("periodic"),
                reflective=self.sampler_kwargs.get("reflective"),
                dtype=nested_sampler.dtype))
        packed, blob = jax.device_get(
            fn(key, jnp.asarray(packed_in, nested_sampler.dtype), sb,
               self.scale, loglstar))
        walks = self.walks
        rows, extras = _unpack_rows(
            packed, blob, self.ndim, like.npdim,
            ("n_accept", "n_reject"),
            lambda i, e: {"n_accept": int(e["n_accept"][i]),
                          "n_reject": int(e["n_reject"][i])},
            nc_from=lambda i, e: walks)
        tuning_info = {
            "accept": int(extras["n_accept"].sum()),
            "reject": int(extras["n_reject"].sum()),
            "scale": self.scale,
        }
        return rows, tuning_info

    def _fused_cfg_key(self):
        return (self.walks, self.facc, self.ncdim)

    def device_tune_fn(self):
        facc0, ncdim = self.facc, self.ncdim

        def tune_fn(scale, stats):  # stats = (n_accept, n_reject, ...)
            facc = stats[0] / jnp.maximum(stats[0] + stats[1], 1.0)
            return scale * jnp.exp((facc - facc0) / ncdim / facc0)

        return tune_fn

    def _build_propose_fn(self, ns, bound_kind):
        from ..parallel.mesh import lane_constrainer
        like = ns.loglikelihood
        ndim, ncdim, q = self.ndim, self.ncdim, ns.queue_size
        npdim = like.npdim
        il = ndim + npdim
        inner = make_rwalk_round(
            like, ndim=ndim, ncdim=ncdim, q=q, walks=self.walks,
            nonbounded=self.sampler_kwargs.get("nonbounded"),
            periodic=self.sampler_kwargs.get("periodic"),
            reflective=self.sampler_kwargs.get("reflective"),
            dtype=ns.dtype,
            constrain=lane_constrainer(getattr(ns, "mesh", None)))
        walks = self.walks

        def propose(k_sel, k_prop, live, live_blob, axes_args, scale,
                    loglstar):
            idxs, starts, axes = select_starts(
                k_sel, live, il, q, bound_kind, axes_args, ns.dtype,
                eye_dim=ncdim, loglstar=loglstar)
            packed_in = jnp.concatenate(
                [starts[:, :il + 1], axes.reshape(q, -1)], axis=1)
            sblob = (jax.tree.map(lambda b: b[idxs], live_blob)
                     if live_blob is not None else None)
            packed, blob_out = inner(k_prop, packed_in, sblob, scale,
                                     loglstar)
            qu = packed[:, :ndim]
            qv = packed[:, ndim:il]
            qlogl = packed[:, il]
            qnc = jnp.full((q,), walks, dtype=jnp.int32)
            stats = (packed[:, il + 1].sum(), packed[:, il + 2].sum())
            lane_stats = packed[:, il + 1:il + 3]
            return qu, qv, qlogl, blob_out, qnc, stats, lane_stats

        return propose

    def consume_tuning(self, stats):
        return {"accept": int(stats[0]), "reject": int(stats[1]),
                "scale": self.scale}

    def row_stats(self, a, b):
        return {"n_accept": int(a), "n_reject": int(b)}

    def tune(self, tuning_info, update=True):
        """Newton-like scale update toward the target acceptance rate
        (reference ``internal_samplers.py:460-493``)."""
        self.scale = tuning_info["scale"]
        hist = self.rwalk_history
        hist["n_accept"] += tuning_info["accept"]
        hist["n_reject"] += tuning_info["reject"]
        if not update:
            return
        accept, reject = hist["n_accept"], hist["n_reject"]
        facc = accept / max(accept + reject, 1)
        self.scale *= math.exp((facc - self.facc) / self.ncdim / self.facc)
        hist["n_accept"] = 0
        hist["n_reject"] = 0

    @property
    def citations(self):
        return [("Skilling (2006)", "projecteuclid.org/euclid.ba/1340370944")]


class _SliceBase(InternalSampler):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.slices = kwargs.get("slices") or 5
        self.slice_history = {"n_expand": 0, "n_contract": 0}
        self.sampler_kwargs.setdefault("slice_doubling",
                                       kwargs.get("slice_doubling", False))

    def _fused_cfg_key(self):
        return (self.slices,
                bool(self.sampler_kwargs.get("slice_doubling", False)))

    def device_tune_fn(self):
        def tune_fn(scale, stats):  # stats = (n_expand, n_contract, ...)
            nexp = jnp.maximum(stats[0], 1.0)
            mult = jnp.clip(2.0 * nexp / (nexp + stats[1]), 0.5, 2.0)
            return scale * mult

        return tune_fn

    def _post_fused_stats(self, stats):
        if stats is not None and bool(stats[2] > 0) and \
                not self.sampler_kwargs.get("slice_doubling", False):
            import warnings
            self.sampler_kwargs["slice_doubling"] = True
            warnings.warn("Slice interval expanded > 1000 times; enabling "
                          "Neal (2003) doubling strategy.")

    def _build_propose_fn(self, ns, bound_kind):
        like = ns.loglikelihood
        ndim, q = self.ndim, ns.queue_size
        npdim = like.npdim
        il = ndim + npdim
        kind = "slice" if isinstance(self, SliceSampler) else "rslice"
        doubling = bool(self.sampler_kwargs.get("slice_doubling", False))
        from ..parallel.mesh import lane_constrainer
        inner = make_slice_round(
            like, ndim=ndim, q=q, slices=self.slices, kind=kind,
            nonperiodic=self.sampler_kwargs.get("nonperiodic"),
            doubling=doubling, dtype=ns.dtype,
            constrain=lane_constrainer(getattr(ns, "mesh", None)))

        def propose(k_sel, k_prop, live, live_blob, axes_args, scale,
                    loglstar):
            idxs, starts, axes = select_starts(
                k_sel, live, il, q, bound_kind, axes_args, ns.dtype,
                eye_dim=ndim, loglstar=loglstar)
            packed_in = jnp.concatenate(
                [starts[:, :il + 1], axes.reshape(q, -1)], axis=1)
            sblob = (jax.tree.map(lambda b: b[idxs], live_blob)
                     if live_blob is not None else None)
            packed, blob_out = inner(k_prop, packed_in, sblob, scale,
                                     loglstar)
            qu = packed[:, :ndim]
            qv = packed[:, ndim:il]
            qlogl = packed[:, il]
            qnc = packed[:, il + 1].astype(jnp.int32)
            stats = (packed[:, il + 2].sum(), packed[:, il + 3].sum(),
                     packed[:, il + 4].max())
            lane_stats = packed[:, il + 2:il + 4]
            return qu, qv, qlogl, blob_out, qnc, stats, lane_stats

        return propose

    def consume_tuning(self, stats):
        return {"n_expand": int(stats[0]), "n_contract": int(stats[1]),
                "expansion_warning_set": bool(stats[2] > 0)}

    def row_stats(self, a, b):
        return {"n_expand": int(a), "n_contract": int(b)}

    def tune(self, tuning_info, update=True):
        """Multiplicative scale update from the expansion/contraction
        balance (reference ``internal_samplers.py:1209-1239``)."""
        hist = self.slice_history
        hist["n_expand"] += tuning_info["n_expand"]
        hist["n_contract"] += tuning_info["n_contract"]
        if tuning_info.get("expansion_warning_set"):
            self.sampler_kwargs["slice_doubling"] = True
        if not update:
            return
        n_expand = max(hist["n_expand"], 1)
        n_contract = hist["n_contract"]
        mult = n_expand * 2.0 / (n_expand + n_contract)
        mult = min(max(mult, 0.5), 2.0)
        self.scale = self.scale * mult
        hist["n_expand"] = 0
        hist["n_contract"] = 0

    def _run(self, nested_sampler, loglstar, q, key, kind):
        like = nested_sampler.loglikelihood
        packed_in, sb = self._gather_starts(nested_sampler, loglstar, q)
        doubling = bool(self.sampler_kwargs.get("slice_doubling", False))
        fn = self._cached_round(
            (kind, q, self.slices, doubling),
            lambda: make_slice_round(
                like, ndim=self.ndim, q=q, slices=self.slices, kind=kind,
                nonperiodic=self.sampler_kwargs.get("nonperiodic"),
                doubling=doubling, dtype=nested_sampler.dtype))
        packed, blob = jax.device_get(
            fn(key, jnp.asarray(packed_in, nested_sampler.dtype), sb,
               self.scale, loglstar))
        rows, extras = _unpack_rows(
            packed, blob, self.ndim, like.npdim,
            ("nc", "n_expand", "n_contract", "warn"),
            lambda i, e: {"n_expand": int(e["n_expand"][i]),
                          "n_contract": int(e["n_contract"][i])},
            nc_from=lambda i, e: int(e["nc"][i]))
        tuning_info = {
            "n_expand": int(extras["n_expand"].sum()),
            "n_contract": int(extras["n_contract"].sum()),
            "expansion_warning_set": bool(extras["warn"][0] > 0),
        }
        if tuning_info["expansion_warning_set"]:
            import warnings
            warnings.warn("Slice interval expanded > 1000 times; enabling "
                          "Neal (2003) doubling strategy.")
        return rows, tuning_info

    @property
    def citations(self):
        return [("Neal (2003)", "projecteuclid.org/euclid.aos/1056562461"),
                ("Handley, Hobson & Lasenby (2015)",
                 "ui.adsabs.harvard.edu/abs/2015MNRAS.453.4384H")]


class SliceSampler(_SliceBase):
    """Gibbs-style multivariate slice sampling along shuffled principal
    axes ('slice')."""

    name = "slice"

    @property
    def update_bound_interval_ratio(self):
        return self.slices * self.ndim

    def propose_round(self, nested_sampler, loglstar, q, key):
        return self._run(nested_sampler, loglstar, q, key, "slice")


class RSliceSampler(_SliceBase):
    """Slice sampling along random axes-transformed directions
    ('rslice')."""

    name = "rslice"

    @property
    def update_bound_interval_ratio(self):
        return self.slices

    def propose_round(self, nested_sampler, loglstar, q, key):
        return self._run(nested_sampler, loglstar, q, key, "rslice")


def get_internal_sampler(sample, ndim, **kwargs):
    """Resolve a sampler spec ('auto'/name/instance) to an instance,
    mirroring the reference auto rules (``dynesty.py:126-166``): unif for
    ndim < 10, rwalk for 10 <= ndim <= 20, rslice above."""
    if isinstance(sample, InternalSampler):
        return sample._new_from_template(dict(kwargs, ndim=ndim))
    if sample == "auto":
        if ndim < 10:
            sample = "unif"
        elif ndim <= 20:
            sample = "rwalk"
        else:
            sample = "rslice"
    kwargs = dict(kwargs, ndim=ndim)
    if sample == "unif":
        return UniformBoundSampler(**kwargs)
    if sample == "rwalk":
        if kwargs.get("walks") is None:
            kwargs["walks"] = ndim + 20
        return RWalkSampler(**kwargs)
    if sample == "slice":
        if kwargs.get("slices") is None:
            kwargs["slices"] = 3
        return SliceSampler(**kwargs)
    if sample == "rslice":
        if kwargs.get("slices") is None:
            kwargs["slices"] = 3 + ndim
        return RSliceSampler(**kwargs)
    raise ValueError(f"Unknown sample option '{sample}' "
                     f"(choose from {INTERNAL_SAMPLER_LIST} or pass an "
                     "InternalSampler instance)")
