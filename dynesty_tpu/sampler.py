"""The static nested sampler: the sequential shell over batched device
proposal rounds.

Control flow mirrors the reference ``sampler.py`` (one dead point per
iteration, plateau-aware shrinkage, queue of speculative proposals valid
for later iterations because L* only increases), but the "queue" is one
jitted device round of width ``queue_size`` — a single host<->device round
trip replaces ``queue_size`` pool-mapped per-point proposal calls
(reference ``sampler.py:676-717``).  Bound refits happen exactly at round
boundaries (the queue-drain trigger of ``sampler.py:771-772``), so all
host-side geometry stays off the device hot path.
"""

import copy
import itertools
import math
import sys
import time
import warnings

import numpy as np
import jax

from .bounding import UnitCube, get_bound
from .internal.samplers import UnitCubeSampler
from .ops.integrals import LOWL_VAL, compute_integrals, progress_integration
from .utils.checkpoint import restore_sampler, save_sampler
from .utils.misc import (DelayTimer, IteratorBlock, IteratorResult,
                         Timings, get_jax_key,
                         get_print_func, get_random_generator)
from .utils.results import Results, RunRecord

# global bound-refit counter (see Sampler.bound_version)
_BOUND_VERSION = itertools.count(1)

__all__ = ["Sampler", "initialize_live_points"]


def _REPLAY_KEY():
    import jax.random
    return jax.random.key(0)


def initialize_live_points(live_points, loglikelihood, nlive, ndim,
                           rstate, blob=False):
    """Draw the initial live points by (batched) rejection sampling from
    the unit cube, retrying whole batches until enough points have finite
    log-likelihood (reference ``sampler.py:56-234``).

    Returns ``(live_u, live_v, live_logl, live_blobs), logvol_init,
    ncalls``; ``logvol_init = -log(n_attempts)`` accounts for the volume
    consumed when parts of the prior have logl = -inf.
    """
    logvol_init = 0.0
    ncalls = 0
    if live_points is None:
        n_attempts = 1000
        min_npoints = min(nlive, max(ndim + 1, min(nlive - 20, 100)))
        live_u = np.zeros((nlive, ndim))
        live_logl = np.zeros(nlive)
        live_v = None
        live_blobs = [None] * nlive
        ngoods = 0
        for iattempt in range(1, n_attempts + 1):
            cur_u = rstate.random(size=(nlive, ndim))
            cur_v, cur_logl, cur_blob = loglikelihood.eval_host(cur_u)
            if live_v is None:
                live_v = np.zeros((nlive, cur_v.shape[1]))
            ncalls += nlive
            finite = np.isfinite(cur_logl)
            bad = ~finite & ~np.isneginf(cur_logl)
            if bad.any():
                raise ValueError(
                    "The log-likelihood of a live point is invalid.")
            ngood_cur = int(finite.sum())
            if ngood_cur > 0:
                nextra = min(nlive - ngoods, ngood_cur)
                sel = np.nonzero(finite)[0][:nextra]
                sl = slice(ngoods, ngoods + nextra)
                live_u[sl] = cur_u[sel]
                live_v[sl] = cur_v[sel]
                live_logl[sl] = cur_logl[sel]
                if blob:
                    for j, s in enumerate(sel):
                        live_blobs[ngoods + j] = cur_blob[s]
                ngoods += nextra
            if ngoods >= min_npoints:
                # fill the remainder with -inf points at the sentinel value
                nextra = nlive - ngoods
                if nextra > 0:
                    sel = np.nonzero(~finite)[0][:nextra]
                    sl = slice(ngoods, ngoods + nextra)
                    live_u[sl] = cur_u[sel]
                    live_v[sl] = cur_v[sel]
                    live_logl[sl] = LOWL_VAL
                    if blob:
                        for j, s in enumerate(sel):
                            live_blobs[ngoods + j] = cur_blob[s]
                # With k finite points out of N*n draws, the volume above
                # the -inf region is 1/N (see reference sampler.py:209-218)
                logvol_init = -np.log(iattempt)
                break
            if iattempt == n_attempts:
                if ngoods == 0:
                    raise RuntimeError(
                        f"After {n_attempts} attempts, not a single point "
                        "with a valid log-likelihood was found. Check your "
                        "prior transform and/or log-likelihood.")
                warnings.warn(
                    f"After {n_attempts} attempts, fewer than "
                    f"{min_npoints} points with valid log-likelihood were "
                    "found; initial sampling is very inefficient!")
    else:
        live_u, live_v, live_logl = (np.array(live_points[0]),
                                     np.array(live_points[1]),
                                     np.array(live_points[2],
                                              dtype=np.float64))
        live_blobs = list(live_points[3]) if blob else [None] * len(live_u)
        # probe shapes for the device path
        loglikelihood.eval_host(live_u[:1])
        for i, ll in enumerate(live_logl):
            if not np.isfinite(ll):
                if np.sign(ll) < 0:
                    live_logl[i] = LOWL_VAL
                else:
                    raise ValueError(
                        f"The log-likelihood ({ll}) of live point {i} at "
                        f"u={live_u[i]} is invalid.")
        if np.all(live_logl == LOWL_VAL):
            raise ValueError("Not a single provided live point has a "
                             "valid log-likelihood!")
    if np.ptp(live_logl) == 0:
        warnings.warn(
            "All initial likelihood values are identical: likely a "
            "likelihood plateau; nested sampling may be inefficient.",
            RuntimeWarning)
    if not blob:
        live_blobs = None
    return (live_u, live_v, live_logl, live_blobs), logvol_init, ncalls


class Sampler:
    """Static nested sampler over batched device proposal rounds."""

    def __init__(self,
                 loglikelihood,
                 ndim,
                 live_points,
                 sampling,
                 bounding,
                 ncdim=None,
                 rstate=None,
                 queue_size=None,
                 bound_update_interval=None,
                 first_bound_update=None,
                 bound_bootstrap=0,
                 bound_enlarge=1.0,
                 blob=False,
                 cite=None,
                 logvol_init=0.0,
                 dtype=None,
                 mesh=None,
                 rounds_per_dispatch=1,
                 rounds_explicit=False,
                 proposal_mode="batch"):
        import jax.numpy as jnp
        import jax

        self.loglikelihood = loglikelihood
        self.ndim = ndim
        self.ncdim = ncdim or ndim
        self.blob = blob
        self.dtype = dtype or (jnp.float64 if jax.config.x64_enabled
                               else jnp.float32)

        self.live_u, self.live_v, self.live_logl = live_points[:3]
        self.live_blobs = live_points[3] if blob else None
        self.nlive = len(self.live_u)
        self.live_bound = np.zeros(self.nlive, dtype=int)
        self.live_it = np.zeros(self.nlive, dtype=int)
        # logl threshold each live point was drawn above (-inf = prior)
        self.live_birth = np.full(self.nlive, -np.inf)

        self.rstate = rstate or get_random_generator()
        self.sampling = sampling
        self.internal_sampler_next = sampling
        self.internal_sampler = UnitCubeSampler(ndim=ndim)

        # 'batch': batched death/refill rounds with varying-live-count
        # accounting (exact + waste-free; see internal/fused.py).
        # 'queue': the reference's speculative proposal queue semantics.
        if proposal_mode not in ("batch", "queue"):
            raise ValueError(f"Unknown proposal_mode '{proposal_mode}'")
        self.proposal_mode = proposal_mode
        # optional jax.sharding.Mesh: shards the proposal (lane) axis
        self.mesh = mesh
        self.queue_size_req = max(int(queue_size or 64), 1)
        self._apply_queue_clamp()
        self.queue = []
        self.nqueue = 0
        self._pending_tuning = None

        self.it = 1
        self.ncall = self.nlive
        self.dlv = math.log((self.nlive + 1.0) / self.nlive)
        self.added_live = False
        self.eff = 0.0
        self.save_bounds = True

        self.bound_update_interval = bound_update_interval
        first_bound_update = first_bound_update or {}
        self.first_bound_update_ncall = first_bound_update.get(
            "min_ncall", 2 * self.nlive)
        self.first_bound_update_eff = first_bound_update.get("min_eff", 10.0)
        self.logl_first_update = None
        self.ncall_at_last_update = 0

        self.unit_cube_sampling = True
        self.bound_version = next(_BOUND_VERSION)  # globally unique per
        # refit: device-array caches key on it, and internal-sampler
        # instances (and their caches) are shared across the dynamic
        # layer's batch samplers — per-instance counters would collide
        # and serve a previous batch's bound arrays
        self.bound = UnitCube(self.ncdim)
        self.bound_list = [self.bound]
        self.nbound = 1

        self.logvol_init = logvol_init

        self.plateau_mode = False
        self.plateau_counter = None
        self.plateau_logdvol = None

        self.saved_run = RunRecord()
        self.bound_bootstrap = bound_bootstrap
        self.bound_enlarge = bound_enlarge
        self.bounding = bounding
        self.bound_next = get_bound(bounding, self.ncdim)
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            # the io_callback escape hatches (host-mode likelihoods,
            # host-sampled custom bounds under 'unif') have no defined
            # semantics when the lane axis is sharded across a mesh:
            # reject explicitly rather than produce undefined behavior
            # (the reference pool works for every combination,
            # tests/test_pool.py; the mesh supports the traced matrix)
            if getattr(loglikelihood, "mode", None) == "host":
                raise ValueError(
                    "likelihood_mode='host' cannot run under a device "
                    "mesh: host callbacks are unsupported with a sharded "
                    "lane axis. Use a traceable likelihood "
                    "('jax'/'vectorized') or drop the mesh.")
            from .bounding import Bound
            custom_bound = (type(self.bound_next).device_spec
                            is Bound.device_spec)
            if custom_bound and getattr(sampling, "name", "") == "unif":
                raise ValueError(
                    "sample='unif' with a custom host-sampled Bound "
                    "cannot run under a device mesh: the bound's sample "
                    "method is reached via a host callback, unsupported "
                    "with a sharded lane axis. Use rwalk/rslice/slice, "
                    "a built-in bound, or drop the mesh.")
        self.cite = cite or ""
        self.pool = None
        self.mapper = map
        self.use_pool = {}
        # per-run wall-clock attribution (see utils.misc.Timings)
        self.timings = Timings()
        # chain this many propose+consume rounds per device call
        # (amortizes fixed dispatch costs; bound refits and tuning then
        # happen every rounds_per_dispatch queue refills)
        self.rounds_per_dispatch = max(int(rounds_per_dispatch), 1)
        # the user explicitly chose the chain depth: per-kernel caps
        # (e.g. the uniform kernel's bound-staleness cap) defer to it
        self.rounds_explicit = bool(rounds_explicit)

    def _apply_queue_clamp(self):
        """Effective per-round width.  Batch (death/refill) rounds kill
        ``queue_size`` points at once, so the width is capped at half the
        live count to bound the sawtooth's variance penalty (and must stay
        below ``nlive`` for the accounting to be defined)."""
        if self.proposal_mode == "batch":
            self.queue_size = max(1, min(self.queue_size_req,
                                         self.nlive // 2))
        else:
            self.queue_size = self.queue_size_req
        mesh = getattr(self, "mesh", None)
        if mesh is not None and mesh.size > 1:
            # the lane axis is sharded across the mesh: keep it divisible
            self.queue_size = max(mesh.size,
                                  self.queue_size // mesh.size * mesh.size)
        # full/narrow widths for the adaptive endgame (see sample()):
        # the last few dispatches of a run use a narrow round so the
        # terminal stop strands (and bills) at most a few lanes
        self._q_full = self.queue_size
        qn = max(16, self.queue_size // 8)
        if mesh is not None and mesh.size > 1:
            qn = max(mesh.size, qn // mesh.size * mesh.size)
        self._q_narrow = min(qn, self.queue_size)

    # ------------------------------------------------------------------
    # persistence

    def save(self, fname):
        save_sampler(self, fname)

    @staticmethod
    def restore(fname, pool=None, mesh=None):
        return restore_sampler(fname, pool=pool, mesh=mesh)

    def __getstate__(self):
        self._ensure_live_mirror()
        state = self.__dict__.copy()
        for k in ("pool", "mapper", "mesh", "_live_dev",
                  "_live_blob_dev", "_bound_upload", "_mirror_stale",
                  "last_proposals_sharding", "_inflight"):
            state.pop(k, None)
        return state

    def __setstate__(self, state):
        self.__dict__ = state
        self.pool = None
        self.mapper = map
        self.mesh = None
        if "timings" not in state:  # pre-timings checkpoints
            self.timings = Timings()

    def reset(self):
        """Re-initialize: fresh live points from the prior and cleared
        run state (reference ``sampler.py:527``)."""
        live_points, logvol_init, init_ncalls = initialize_live_points(
            None, self.loglikelihood, self.nlive, self.ndim, self.rstate,
            blob=self.blob)
        self.live_u, self.live_v, self.live_logl = live_points[:3]
        self.live_blobs = live_points[3] if self.blob else None
        self.live_bound = np.zeros(self.nlive, dtype=int)
        self.live_it = np.zeros(self.nlive, dtype=int)
        self.live_birth = np.full(self.nlive, -np.inf)
        self.logvol_init = logvol_init
        self.it = 1
        self.ncall = init_ncalls
        self.added_live = False
        self.eff = 0.0
        self.unit_cube_sampling = True
        self.bound = UnitCube(self.ncdim)
        self.bound_list = [self.bound]
        self.nbound = 1
        self.bound_version = next(_BOUND_VERSION)
        self.logl_first_update = None
        self.ncall_at_last_update = 0
        self.bound_next = get_bound(self.bounding, self.ncdim)
        self.internal_sampler = UnitCubeSampler(ndim=self.ndim)
        self.plateau_mode = False
        self.plateau_counter = None
        self.plateau_logdvol = None
        self.saved_run = RunRecord()
        self.timings = Timings()
        for k in ("_integ", "_pending_records", "_leftover",
                  "_continuation", "_live_dev", "_live_blob_dev",
                  "_mirror_stale", "_bound_upload", "_nc_carry",
                  "_nc_per_round_ema", "_inflight", "_next_spec",
                  "_nc_entry_ema", "_last_delta_logz",
                  "_bracket_start", "_bracket_it0"):
            self.__dict__.pop(k, None)

    # ------------------------------------------------------------------
    # bound management

    def update_bound(self, subset=slice(None)):
        """Refit the bound to the current live points; bootstrap
        realizations map over the pool when use_pool['update_bound']
        (reference ``sampler.py:497-505``)."""
        pool = self.pool if getattr(self, "use_pool", {}).get(
            "update_bound", True) else None
        self.bound.update(self.live_u[subset, :self.ncdim],
                          rstate=self.rstate,
                          bootstrap=self.bound_bootstrap,
                          pool=pool)
        self.bound_version = next(_BOUND_VERSION)
        if self.bound_enlarge != 1.0:
            self.bound.scale_to_logvol(self.bound.logvol +
                                       np.log(self.bound_enlarge))
        return copy.deepcopy(self.bound)

    def update_bound_if_needed(self, loglstar, ncall=None, force=False):
        """Trigger semantics of the reference (``sampler.py:625-674``):
        first update once sampling becomes inefficient, then every
        ``bound_update_interval`` calls (checked at queue drains)."""
        if ncall is None:
            ncall = self.ncall
        delta_bound = self.bound_update_interval
        call_check_first = ncall >= self.first_bound_update_ncall
        call_check = ncall >= delta_bound + self.ncall_at_last_update
        efficiency_check = self.eff < self.first_bound_update_eff
        if ((self.unit_cube_sampling and efficiency_check
             and call_check_first)
                or (not self.unit_cube_sampling and call_check)
                or (self.unit_cube_sampling
                    and self.logl_first_update is not None
                    and loglstar > self.logl_first_update) or force):
            # the refit reads the host live mirrors; pull them from the
            # device only when the trigger actually fires (a blocking
            # device_get costs ~25 ms through the relay, and most
            # round-boundary checks do not fire)
            import time as _time
            self._ensure_live_mirror()
            t0 = _time.perf_counter()
            if loglstar == LOWL_VAL:
                subset = self.live_logl > loglstar
            else:
                subset = slice(None)
            if self.unit_cube_sampling:
                self.unit_cube_sampling = False
                self.logl_first_update = loglstar
                self.bound = self.bound_next
                self.internal_sampler = self.internal_sampler_next
            self.update_bound(subset=subset)
            if self.save_bounds:
                self.bound_list.append(copy.deepcopy(self.bound))
            self.nbound += 1
            self.ncall_at_last_update = ncall
            self.timings.add("refit", _time.perf_counter() - t0)
            self.timings.count("n_refit")

    def ensure_startpoints_bounded(self, idxs):
        """Force a bound refit if any selected start point escaped the
        bound (reference ``sampler.py:483-491``)."""
        if self.bound.need_centers:
            self.bound.ctrs = self.live_u
        for i in np.unique(idxs):
            u_fit = self.live_u[i, :self.ncdim]
            if not self.bound.contains(u_fit):
                self.update_bound_if_needed(-np.inf, force=True)
                if self.bound.need_centers:
                    self.bound.ctrs = self.live_u
                if not self.bound.contains(u_fit):
                    raise RuntimeError("Update of the bound failed")
                break

    # ------------------------------------------------------------------
    # fused-round device state helpers

    def device_bound_kind(self):
        """Static bound kind for the jitted round ('cube' before the
        first update / for UnitCube bounds)."""
        if self.unit_cube_sampling:
            return "cube"
        spec = self.bound.device_spec()
        if spec is None:
            # user-defined Bound subclass: axes come from the host, and
            # uniform sampling calls bound.samples() through io_callback
            return "custom"
        return spec[0]

    def device_bound_arrays(self, bound=None, version=None):
        """Device upload of the active bound's arrays, cached per refit
        (uploads are expensive on relayed devices).  ``bound``/``version``
        override the active bound — used when resuming a pickled
        pre-launch spec that was planned on a since-refitted bound."""
        import jax.numpy as jnp

        from .internal.kernels import pad_ellipsoids

        kind = self.device_bound_kind()
        src = bound if bound is not None else self.bound
        ver = version if bound is not None else self.bound_version
        if kind == "cube":
            return {}
        if kind == "custom":
            import jax.numpy as jnp
            axes = np.asarray(src.get_random_axes(self.rstate))
            return {"axes": jnp.asarray(axes)}
        cached = getattr(self, "_bound_upload", None)
        if cached is not None and cached[0] == ver and \
                cached[1] == kind:
            dev = cached[2]
        else:
            _, arrays = src.device_spec()
            if kind == "ellipsoids":
                arrays = pad_ellipsoids(arrays["ctrs"], arrays["axes"],
                                        arrays["ams"], arrays["logvols"])
                # the host's latest bootstrap x enlarge calibration as a
                # linear factor: applied by the device-side per-round
                # refit that keeps chained uniform rounds fresh
                arrays["expand"] = np.float64(
                    getattr(src, "last_expand", 1.0) *
                    self.bound_enlarge ** (1.0 / self.ncdim))
            else:
                arrays = dict(arrays)
            dev = {k: jnp.asarray(v) for k, v in arrays.items()}
            self._bound_upload = (ver, kind, dev)
        if kind in ("balls", "cubes"):
            dev = dict(dev)
            dev["ctrs"] = jnp.asarray(np.asarray(src.ctrs))
        return dev

    def _live_packed(self):
        """Pack the live mirrors into the fused round's (nlive, W) float
        matrix: u | v | logl | it | bound | birth."""
        birth = getattr(self, "live_birth", None)
        if birth is None:
            birth = np.full(self.nlive, -np.inf)
        return np.concatenate([
            self.live_u, self.live_v, self.live_logl[:, None],
            self.live_it[:, None].astype(np.float64),
            self.live_bound[:, None].astype(np.float64),
            np.asarray(birth, dtype=np.float64)[:, None],
        ], axis=1)

    def _sync_live(self, live, bounditer):
        """Write the downloaded live matrix back into the host mirrors,
        resolving the device's -1 'current bound' marker."""
        ndim, npdim = self.ndim, self.loglikelihood.npdim
        self.live_u = np.array(live[:, :ndim], dtype=np.float64)
        self.live_v = np.array(live[:, ndim:ndim + npdim],
                               dtype=np.float64)
        self.live_logl = np.array(live[:, ndim + npdim],
                                  dtype=np.float64)
        self.live_it = live[:, ndim + npdim + 1].astype(int)
        lb = live[:, ndim + npdim + 2].astype(int)
        lb[lb < 0] = bounditer
        self.live_bound = lb
        self.live_birth = np.array(live[:, ndim + npdim + 3],
                                   dtype=np.float64)

    def _ensure_live_mirror(self):
        """Refresh the host live mirrors from the device-resident state
        (live points stay on device between fused rounds)."""
        if getattr(self, "_mirror_stale", False):
            import time as _time

            import jax

            t0 = _time.perf_counter()
            live = jax.device_get(self._live_dev)
            self._sync_live(live, self._mirror_bounditer)
            if self.blob and self._live_blob_dev is not None:
                import jax as _jax

                blobs = _jax.device_get(self._live_blob_dev)
                self.live_blobs = [
                    _jax.tree.map(lambda b: b[i], blobs)
                    for i in range(self.nlive)
                ]
            self._mirror_stale = False
            self.timings.add("mirror", _time.perf_counter() - t0)

    # ------------------------------------------------------------------
    # fused dispatch planning / pipelining

    def _estimate_remaining(self, dlogz_eff, logl_max, loglstar):
        """Estimated accepts remaining before a stopping criterion, or
        None when no estimate exists.  delta_logz decays ~e^(-i/nlive),
        so the accepts remaining to reach dlogz are ~nlive*ln(delta/
        dlogz); bracketed (dynamic-batch) runs extrapolate the bracket
        progress instead.  Persistent attrs (_bracket_*) are pickled so
        a resumed run continues the same estimate."""
        est = None
        last_delta = getattr(self, "_last_delta_logz", None)
        if last_delta is not None and np.isfinite(dlogz_eff) \
                and dlogz_eff > 0 and last_delta > 0:
            # small margin: an undershoot costs one extra (cheap)
            # dispatch, an overshoot strands at most ~one round
            est = 1.1 * self.nlive * max(
                np.log(last_delta) - np.log(dlogz_eff), 0.0)
        if np.isfinite(logl_max):
            # dynamic batches stop at logl_max: extrapolate the bracket
            # progress (iterations spent per unit of loglstar motion)
            if getattr(self, "_bracket_start", None) is None \
                    and np.isfinite(loglstar) \
                    and loglstar > LOWL_VAL / 2:
                self._bracket_start = float(loglstar)
                self._bracket_it0 = int(self.it)
            start = getattr(self, "_bracket_start", None)
            if start is not None and loglstar > start \
                    and logl_max > start:
                prog = (loglstar - start) / (logl_max - start)
                prog = min(prog, 0.999)
                done_iters = max(self.it - self._bracket_it0, 1)
                est2 = 1.2 * done_iters * (1.0 - prog) / prog
                est = est2 if est is None else min(est, est2)
            # a-priori batch length from the bracket's saved log-volume
            # span (set by _configure_batch_sampler): available from the
            # batch's first round, before the progress estimate can fire
            tot = getattr(self, "_bracket_est_total", None)
            if tot is not None:
                est3 = 1.2 * max(tot - (self.it - 1), 0.0)
                est = est3 if est is None else min(est, est3)
        return est

    def _make_dispatch_spec(self, dlogz_eff, logl_max, loglstar,
                            est_offset=0, refit=True):
        """Plan one fused dispatch: choose the dispatch width and
        active-round cap from the remaining-work estimate, run the
        round-boundary bound-refit triggers (the ONLY place host refits
        fire), and draw the dispatch key.  The spec is pickled as
        ``_next_spec`` until its dispatch is consumed, so an interrupted
        run relaunches the identical dispatch — the dispatch structure
        stays a pure function of pickled state (bit-exact resume,
        tests/test_resume.py), pipelined or not.

        ``est_offset`` discounts accepts the in-flight dispatch will
        consume before this one runs (pipelined pre-launches plan with
        an estimate that is stale by one dispatch).

        ``refit=False`` (pipelined pre-launch path) plans the dispatch
        on the CURRENT bound and leaves the refit trigger to the caller,
        which runs it AFTER issuing the launch — the host refit then
        overlaps the pre-launched dispatch's device execution instead of
        idling the device.  The caller snapshots the bound into the spec
        (``bound_used``/``bounditer``) so a checkpoint taken after the
        deferred refit still relaunches the dispatch on the bound it was
        actually planned with.

        NOTE: the maxiter/maxcall budgets must NOT shape the dispatch
        (width or active rounds) for the same reason: a maxiter stop
        therefore strands at most one dispatch of speculative work,
        which is billed honestly."""
        # round boundary: refit triggers FIRST (may consume rstate via
        # bootstrap; the refitted bound is pickled with the spec's
        # effects, so restored specs skip this method entirely).  Run
        # before sizing so the first-update transition (unit cube ->
        # real bound + real kernel) is visible to the sizing logic:
        # otherwise the first post-transition dispatch is sized with
        # _pipeline_capable()==False and swallows the whole estimate.
        loglstar_round = max(loglstar, np.float64(LOWL_VAL))
        if refit:
            self.update_bound_if_needed(loglstar_round, ncall=self.ncall)
        est = self._estimate_remaining(dlogz_eff, logl_max, loglstar)
        if est is not None and est_offset:
            est = max(est - est_offset, 0.0)
        # adaptive dispatch sizing: near the stopping criterion activate
        # only as many chained rounds as the estimated remaining work
        # needs, so the terminal stop does not strand (and bill) a huge
        # speculative dispatch.  Same compiled program — the cap is a
        # runtime scalar (see internal/fused.py).
        # endgame: when less than one full round of work remains,
        # dispatch a narrow round instead so the terminal stop strands
        # (and bills) at most a few lanes.  Only for logl_max-bracketed
        # (dynamic batch) runs: the narrow width is a separate compiled
        # program, and its one-time trace cost amortizes over the many
        # batches that share it but not over a static run's single
        # terminal dispatch.
        q_full = getattr(self, "_q_full", self.queue_size)
        q_narrow = getattr(self, "_q_narrow", q_full)
        if est is not None and est < 0.75 * q_full \
                and q_narrow < q_full and np.isfinite(logl_max):
            queue_size = q_narrow
        else:
            queue_size = q_full
        # NOTE on refit cadence: chained rounds coarsen the bound-refit
        # granularity to dispatch boundaries.  That is safe for the MCMC
        # kernels (the bound only supplies starts/axes; per-round scale
        # tuning runs on device), while the rejection-efficiency-
        # sensitive uniform kernels get device-side per-round refits
        # (ellipsoid stacks) or never chain.
        gated = getattr(self.internal_sampler, "gate_rounds_on_done",
                        False) and not self.unit_cube_sampling
        if gated:
            # the device skips every chained round past an in-flight
            # stopping cause (fused.py gate_on_done), so overshoot
            # proposes and bills NOTHING: chain the full compiled depth
            # and let the device end the run/batch.  The endgame then
            # costs O(1) dispatches instead of one est-sized dispatch
            # per shrinking remainder, and a terminal stop strands at
            # most the crossing round's own tail — exactly as an
            # est-sized dispatch would.
            rounds_active = None
        elif est is None:
            rounds_active = None
        else:
            rounds_active = max(1, int(math.ceil(
                (min(est, 2**30) + queue_size // 2) / queue_size)))
        # per-dispatch key, with its seed retained so an interrupted
        # (or merely pre-launched) dispatch relaunches bit-exactly
        key_seed = int(self.rstate.integers(0, 2**63 - 1))
        return {"key_seed": key_seed, "queue_size": queue_size,
                "rounds_active": rounds_active}

    def _pipeline_capable(self):
        """Static preconditions for the eager (pre-yield-drain) launch
        of the next dispatch."""
        if self.unit_cube_sampling:
            # the first-update transition swaps the internal sampler;
            # the unit-cube phase is 1-2 chained dispatches anyway
            return False
        if getattr(self.loglikelihood, "mode", None) == "host":
            return False  # io_callback likelihoods stay synchronous
        if self.device_bound_kind() != "ellipsoids":
            # friends/custom bounds take fresh host-side center arrays
            # from the (lazily refreshed) live mirror at launch
            return False
        return True

    # ------------------------------------------------------------------
    # proposal queue

    def _fill_queue(self, loglstar):
        """Run one jitted proposal round of width ``queue_size``."""
        key = get_jax_key(self.rstate)
        rows, tuning_info = self.internal_sampler.propose_round(
            self, loglstar, self.queue_size, key)
        self.queue = rows
        self.nqueue = len(rows)
        self._pending_tuning = tuning_info

    def _get_point_value(self, loglstar):
        if self.nqueue <= 0:
            self._fill_queue(loglstar)
        ret = self.queue.pop(0)
        self.nqueue -= 1
        return ret

    def _new_point(self, loglstar):
        """Pop proposals until one beats the current threshold; refresh
        tuning and the bound when the queue drains."""
        ncall = self.ncall
        ncall_accum = 0
        while True:
            ret = self._get_point_value(loglstar)
            nc = ret["nc"] or 0
            ncall_accum += nc
            ncall += nc
            if self.nqueue == 0:
                if (self._pending_tuning is not None
                        and not self.unit_cube_sampling):
                    self.internal_sampler.tune(self._pending_tuning,
                                               update=True)
                self._pending_tuning = None
                self.update_bound_if_needed(loglstar, ncall=ncall)
            if ret["logl"] > loglstar:
                break
        return (ret["u"], ret["v"], ret["logl"], ncall_accum,
                ret["blob"], ret["proposal_stats"])

    # ------------------------------------------------------------------
    # results

    @property
    def results(self):
        """Results of the run packaged as an immutable record."""
        d = {}
        for k in ("nc", "v", "id", "it", "u", "n", "birth", "logwt",
                  "logl", "logvol", "logz", "logzvar", "h", "bounditer",
                  "boundidx", "scale", "blob", "proposal_stats"):
            d[k] = np.array(self.saved_run[k])
        # decode the f32-safe clamp back to -inf (prior-born points)
        birth = d["birth"].astype(np.float64)
        birth[birth <= -1e29] = -np.inf
        d["birth"] = birth
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            # samples_n records the exact live-point count at each death:
            # batch (death/refill) rounds give static runs a sawtooth
            # profile, which the error analysis must see
            results = [("nlive", self.nlive), ("niter", self.it - 1),
                       ("ncall", d["nc"]), ("eff", self.eff),
                       ("samples", d["v"]), ("blob", d["blob"]),
                       ("samples_id", d["id"]), ("samples_it", d["it"]),
                       ("samples_n", d["n"].astype(int)),
                       ("samples_birth", d["birth"]),
                       ("samples_u", d["u"]), ("logwt", d["logwt"]),
                       ("logl", d["logl"]), ("logvol", d["logvol"]),
                       ("logz", d["logz"]),
                       ("logzerr", np.sqrt(np.maximum(d["logzvar"], 0))),
                       ("information", d["h"]),
                       ("bound_iter", d["bounditer"]),
                       ("samples_bound", d["boundidx"]),
                       ("scale", d["scale"]),
                       ("proposal_stats", d["proposal_stats"])]
            if self.save_bounds:
                results.append(("bound", copy.deepcopy(self.bound_list)))
        return Results(results)

    @property
    def n_effective(self):
        """Kish effective sample size of the current weights."""
        if len(self.saved_run["logwt"]) == 0:
            return 0
        logwt = np.asarray(self.saved_run["logwt"])
        if len(logwt) == 0 or np.max(logwt) == -np.inf:
            return 0
        from .ops.integrals import get_neff_from_logwt
        return get_neff_from_logwt(logwt)

    @property
    def citations(self):
        return self.cite

    # ------------------------------------------------------------------
    # the main loop

    def sample(self, maxiter=None, maxcall=None, dlogz=0.01,
               logl_max=np.inf, add_live=True, save_bounds=True,
               resume=False, per_dispatch=False):
        """Generator yielding one dead point per iteration (reference
        ``sampler.py:932-1212``).

        ``per_dispatch=True`` switches to a coarse-grained mode that
        yields ONE lightweight :class:`IteratorBlock` per fused device
        dispatch instead of per-record :class:`IteratorResult` objects.
        The per-iteration records are identical either way (they are
        bulk-appended to ``saved_run`` at dispatch time); only the
        generator granularity changes.  ``run_nested`` uses this when
        progress printing is off, since per-record Python costs more
        than the device work on wide dispatches.
        """
        if maxcall is None:
            maxcall = sys.maxsize
        if maxiter is None:
            maxiter = sys.maxsize
        self.save_bounds = save_bounds
        self.interrupted_budget = False
        ncall = 0
        pending_block = None

        if self.it == 1 or len(self.saved_run["logl"]) == 0:
            h = 0.0
            logz = LOWL_VAL
            logzvar = 0.0
            logvol = self.logvol_init
            loglstar = LOWL_VAL
        else:
            if self.added_live and not resume:
                warnings.warn("Repeatedly running sample() or run_nested() "
                              "(not resuming) is deprecated",
                              DeprecationWarning)
                self._remove_live_points()
            h, logz, logzvar, logvol, loglstar = [
                self.saved_run[k][-1]
                for k in ("h", "logz", "logzvar", "logvol", "logl")
            ]

        # -------- fused round loop: the whole per-iteration shell runs
        # on device (see internal/fused.py); live points stay device
        # resident between rounds.  Leftover proposals and pending
        # records are pickled so interrupted runs resume bit-exactly.
        import jax.numpy as jnp

        from .utils.misc import get_jax_key as _get_key

        npdim = self.loglikelihood.npdim
        ndim = self.ndim
        rec_off = 1 + ndim + npdim
        dlogz_eff = -np.inf if dlogz is None else dlogz
        accepted_this_call = 0
        # a natural (dlogz/logl_max/plateau) stop can leave pending
        # yields to drain, and checkpoints fire during that drain: the
        # stop itself must therefore be pickled state, or a resumed run
        # would relaunch a dispatch (consuming an rstate draw the
        # uninterrupted run never made) after the run already ended
        if not resume:
            self._terminal_done = False
        terminal_break = bool(getattr(self, "_terminal_done", False)) \
            and resume

        if getattr(self, "_integ", None) is not None and resume:
            st = self._integ
            logz, logzvar = st["logz"], st["logzvar"]
            h, logvol, loglstar = st["h"], st["logvol"], st["loglstar"]
        if not hasattr(self, "_pending_records"):
            self._pending_records = []
        if not hasattr(self, "_leftover"):
            self._leftover = None
        if not hasattr(self, "_continuation"):
            self._continuation = None
        self._live_dev = getattr(self, "_live_dev", None)
        self._live_blob_dev = getattr(self, "_live_blob_dev", None)
        self._mirror_stale = getattr(self, "_mirror_stale", False)
        # a pre-launched dispatch never survives a sample() re-entry
        # (leftover replay advances the live state past its inputs); the
        # pickled _next_spec relaunches it identically when its turn
        # comes
        self._inflight = None

        # f32 cannot represent the -1e300 sentinel: clamp to -1e30
        def _clamp(x):
            return np.maximum(x, -1e30)

        def _integ_vec():
            # [logz, logzvar, h, logvol, loglstar, plateau_mode,
            #  plateau_counter, plateau_logdvol, it]
            return np.array([
                _clamp(logz), logzvar, h, logvol, _clamp(loglstar),
                float(bool(self.plateau_mode)),
                float(self.plateau_counter or 0),
                float(self.plateau_logdvol or 0.0),
                float(self.it),
            ])

        def _limits_vec():
            # [dlogz, logl_max, max_accepts, max_nc]; caps clamped to
            # 2**30 (exactly representable in float32)
            return np.array([
                float(dlogz_eff), float(logl_max),
                float(min(maxiter - accepted_this_call, 2**30)),
                float(min(maxcall - ncall, 2**30)),
            ])

        def _upload_live():
            if self._live_dev is None:
                packed = self._live_packed()
                packed[:, ndim + npdim] = _clamp(packed[:, ndim + npdim])
                packed[:, ndim + npdim + 3] = _clamp(
                    packed[:, ndim + npdim + 3])
                self._live_dev = jnp.asarray(packed, self.dtype)
                if self.blob:
                    self._live_blob_dev = jax.tree.map(
                        lambda *bs: jnp.asarray(np.stack(bs)),
                        *self.live_blobs)
                if self.mesh is not None:
                    # commit the live state replicated across the mesh so
                    # the sharded round compiles over all chips
                    from jax.sharding import NamedSharding, PartitionSpec
                    sh = NamedSharding(self.mesh, PartitionSpec())
                    self._live_dev = jax.device_put(self._live_dev, sh)
                    if self.blob and self._live_blob_dev is not None:
                        self._live_blob_dev = jax.tree.map(
                            lambda b: jax.device_put(b, sh),
                            self._live_blob_dev)

        while True:
            # ---- drain pending yields (their rows are already appended
            # to saved_run at round-merge time)
            while self._pending_records:
                row = self._pending_records.pop(0)
                accepted_this_call += 1
                ncall += row["nc"]
                yield IteratorResult(**row)
            if pending_block is not None:
                accepted_this_call += pending_block.n
                ncall += pending_block.nc
                yield pending_block
                pending_block = None
            if terminal_break:
                # natural stop (dlogz / logl_max / plateau)
                self.interrupted_budget = False
                break
            if accepted_this_call >= maxiter or ncall >= maxcall:
                # budget stop: callers (the dynamic batch driver) can
                # suspend and later re-enter with resume=True, replaying
                # the leftover proposals bit-exactly
                self.interrupted_budget = True
                warnings.warn(
                    "Sampling stopped short by maxiter/maxcall before "
                    "reaching the dlogz criterion; posterior may be "
                    "poorly sampled.")
                break

            bounditer = self.nbound - 1 if not self.unit_cube_sampling \
                else 0
            integ = _integ_vec()
            limits = _limits_vec()

            if self._leftover is not None:
                # consume-only replay of an interrupted dispatch's tail
                # (chunked by queue_size); no RNG draw (bit-exact resume)
                # — any pipelined pre-launch is superseded by the replay
                # (its pickled spec relaunches it when its turn comes)
                self._inflight = None
                import jax.random as _jr

                key = _jr.key(0)
                _upload_live()
                prop_all = self._leftover["prop"]
                qsz = self.queue_size
                prop = prop_all[:qsz]
                n_real = len(prop)
                pad = np.zeros((qsz - n_real, prop.shape[1]))
                pad[:, ndim + npdim] = -1e30
                prop_padded = jnp.asarray(
                    np.concatenate([prop, pad]), self.dtype)
                pblob = self._leftover.get("blob")
                if pblob is not None:
                    pb_pad = jax.tree.map(
                        lambda b: jnp.asarray(np.concatenate(
                            [b[:qsz],
                             np.zeros((qsz - n_real,) + b.shape[1:],
                                      b.dtype)])), pblob)
                else:
                    pb_pad = None
                t_disp0 = time.perf_counter()
                out, live_out, live_blob_out, old_blobs_dev = \
                    self.internal_sampler.run_replay(
                        self, key, self._live_dev, self._live_blob_dev,
                        prop_padded, pb_pad, integ, limits,
                        kills0=self._leftover.get("kills", 0),
                        birth0=self._leftover.get("birth0", -1e30))
                self.timings.add("dispatch",
                                 time.perf_counter() - t_disp0)
                self.timings.count("n_dispatch")
                n_real_limit = n_real
                skip_off = 0
                dispatch_key_seed = None
                normal_dispatch = False
            elif self._continuation is not None:
                # a budget stop interrupted a CHAINED dispatch mid-way:
                # the interrupted round's tail was replayed above; now
                # regenerate the dispatch's remaining rounds with its
                # ORIGINAL key and a head-skip, so they are bit-identical
                # to what an uninterrupted run would have consumed (the
                # later rounds' proposals depend on the live state, which
                # the replay has now brought to exactly the right point).
                # No bound refit and no fresh RNG draw here.
                cont = self._continuation
                self._continuation = None
                self._inflight = None
                self.queue_size = cont["queue_size"]
                key = jax.random.key(cont["key_seed"])
                dispatch_key_seed = cont["key_seed"]
                _upload_live()
                axes_args = self.device_bound_arrays()
                t_disp0 = time.perf_counter()
                out, live_out, live_blob_out, old_blobs_dev = \
                    self.internal_sampler.run_fused(
                        self, key, self._live_dev, self._live_blob_dev,
                        axes_args, integ, limits,
                        rounds_active=cont["rounds"],
                        rounds_skip=cont["skip"])
                self.timings.add("dispatch",
                                 time.perf_counter() - t_disp0)
                self.timings.count("n_dispatch")
                skip_off = cont["skip"] * self.queue_size
                normal_dispatch = False
                n_real_limit = min(len(out["accepts"]),
                                   cont["rounds"] * self.queue_size)
                if out["done_reason"] & 32 and \
                        not out["done_reason"] & 0b11111:
                    # the device chain-stop gate ended the chain at a
                    # round boundary: gated rounds never ran, so there
                    # is nothing to keep as leftovers
                    n_real_limit = skip_off + out["n_consumed"]
                self.last_proposals_sharding = getattr(
                    out["proposals_dev"], "sharding", None)
            else:
                # ---- launch (or adopt the pipelined pre-launch of)
                # this dispatch.  See _make_dispatch_spec/_can_pipeline:
                # the spec of every un-consumed dispatch is pickled, so
                # the dispatch structure stays a pure function of
                # pickled state (bit-exact resume) either way.
                handle = getattr(self, "_inflight", None)
                self._inflight = None
                if handle is None:
                    spec = getattr(self, "_next_spec", None)
                    if spec is None:
                        spec = self._make_dispatch_spec(
                            dlogz_eff, logl_max, loglstar)
                        self._next_spec = spec
                    self.queue_size = spec["queue_size"]
                    # a pickled pre-launch spec carries the bound it was
                    # planned on (the refit that followed its original
                    # launch has already mutated self.bound): relaunch on
                    # the snapshot so the resumed dispatch is
                    # bit-identical to the one the uninterrupted run
                    # consumed
                    if spec.get("bound_used") is not None and \
                            spec.get("bound_version_used") != \
                            self.bound_version:
                        bounditer = spec["bounditer"]
                        axes_args = self.device_bound_arrays(
                            bound=spec["bound_used"],
                            version=spec["bound_version_used"])
                    else:
                        bounditer = self.nbound - 1 \
                            if not self.unit_cube_sampling else 0
                        axes_args = self.device_bound_arrays()
                    key = jax.random.key(spec["key_seed"])
                    _upload_live()
                    handle = self.internal_sampler.launch_fused(
                        self, key, self._live_dev, self._live_blob_dev,
                        axes_args, integ, limits,
                        rounds_active=spec["rounds_active"])
                    handle["spec"] = spec
                    handle["bounditer"] = bounditer
                else:
                    spec = handle["spec"]
                    bounditer = handle["bounditer"]
                # this dispatch's results are consumed below: its spec
                # is no longer "next"
                self._next_spec = None
                self.queue_size = spec["queue_size"]
                dispatch_key_seed = spec["key_seed"]
                rounds_active = handle["rounds_active"]
                normal_dispatch = True

                skip_off = 0
                t_disp0 = time.perf_counter()
                out, live_out, live_blob_out, old_blobs_dev = \
                    self.internal_sampler.finish_fused(handle)
                self.timings.add("dispatch",
                                 time.perf_counter() - t_disp0)
                self.timings.count("n_dispatch")
                # actual dispatch width: the unit-cube phase caps the
                # chained rounds statically, and the adaptive cap limits
                # the rounds that consumed/billed work at runtime (gated
                # tail entries are dead — never consumed, billed, or
                # kept as leftovers)
                n_real_limit = min(len(out["accepts"]),
                                   rounds_active * self.queue_size)
                if out["done_reason"] & 32 and \
                        not out["done_reason"] & 0b11111:
                    # device chain-stop gate (unit-cube first-update
                    # trigger): the chain ended cleanly at a round
                    # boundary — gated rounds never ran, nothing to
                    # keep as leftovers
                    n_real_limit = out["n_consumed"]
                # update the per-entry call-cost EMA used by the
                # pipelining budget gate (normal dispatches only: replay
                # and continuation dispatches never ran in the
                # uninterrupted run, and resume must stay bit-exact)
                ent = max(n_real_limit, 1)
                per = out.get("nc_launched", 0) / ent
                ema = getattr(self, "_nc_entry_ema", None)
                self._nc_entry_ema = per if ema is None \
                    else 0.5 * ema + 0.5 * per
                # observability: the lane-axis sharding of the round's
                # proposal block (asserted by the mesh tests)
                self.last_proposals_sharding = getattr(
                    out["proposals_dev"], "sharding", None)

            # ---- leftover bookkeeping (checkpoint-exact resume)
            t_cons0 = time.perf_counter()
            self.timings.count("nc_launched", out.get("nc_launched", 0))
            # one event per fused dispatch, at results-consumed time:
            # bench.py derives the steady-state duty-cycle window from
            # the inter-mark gaps (first/last dispatches carry one-time
            # costs a whole-run duty conflates with pipeline stalls)
            self.timings.mark("disp_marks",
                              (t_cons0, int(out.get("nc_launched", 0))))
            n_cons = min(out["n_consumed"], n_real_limit - skip_off)
            nc_col = ndim + npdim + 1  # nc column of the proposals block
            kept_nc = 0
            if self._leftover is not None:
                # chunked replay: drop the consumed prefix; the kill
                # offset advances by this chunk's accepted deaths so the
                # varying-live-count accounting continues where it stopped
                prop_rest = self._leftover["prop"][n_cons:]
                if len(prop_rest):
                    kept_nc = int(prop_rest[:, nc_col].sum())
                    lo = {"prop": prop_rest,
                          "kills": (self._leftover.get("kills", 0) +
                                    out["n_accepted"]),
                          "birth0": self._leftover.get("birth0", -1e30),
                          "cont": self._leftover.get("cont")}
                    if self.blob and self._leftover.get("blob") is not None:
                        lo["blob"] = jax.tree.map(
                            lambda b: b[n_cons:], self._leftover["blob"])
                    self._leftover = lo
                else:
                    # tail fully replayed: if the interrupted dispatch
                    # had more chained rounds, regenerate them next with
                    # its original key (continuation dispatch)
                    self._continuation = self._leftover.get("cont")
                    self._leftover = None
            elif n_cons < n_real_limit - skip_off:
                # dispatch ended early (budget/terminal stop): fetch the
                # device-resident proposals block for checkpoint-exact
                # leftover replay.  Only the interrupted round's OWN tail
                # is replayable verbatim — later chained rounds proposed
                # from a live state frozen at the stop, which the
                # uninterrupted run would have kept evolving — so the
                # remaining rounds are recorded as a CONTINUATION
                # (re-run with the same dispatch key + head skip), making
                # budget-interrupted chained dispatches resume
                # bit-exactly in every proposal mode.
                qr = self.queue_size
                g = skip_off + n_cons  # global entry index of the stop
                r0 = g // qr
                lo_end = min(n_real_limit, (r0 + 1) * qr)
                if self.proposal_mode == "batch":
                    kills = int(np.sum(out["accepts"][r0 * qr:g]))
                else:
                    kills = 0
                props = np.asarray(
                    jax.device_get(out["proposals_dev"]),
                    dtype=np.float64)[g:lo_end]
                n_rounds_exec = n_real_limit // qr
                cont = None
                if r0 + 1 < n_rounds_exec and dispatch_key_seed is not None:
                    cont = {"key_seed": dispatch_key_seed,
                            "skip": r0 + 1,
                            "rounds": n_rounds_exec,
                            "queue_size": qr}
                if len(props):
                    kept_nc = int(props[:, nc_col].sum())
                    # the interrupted round's proposal threshold: births
                    # of refills made while replaying this tail
                    birth0 = float(np.asarray(
                        out["round_thresholds"])[r0])
                    lo = {"prop": props, "kills": kills, "birth0": birth0,
                          "cont": cont}
                    if self.blob:
                        all_blob = jax.device_get(out["qblob"])
                        lo["blob"] = jax.tree.map(
                            lambda b: np.asarray(b)[g:lo_end],
                            all_blob)
                    self._leftover = lo
                else:
                    self._leftover = None
                    self._continuation = cont
            else:
                self._leftover = None

            # ---- adopt the device-side state
            self._live_dev = live_out
            self._live_blob_dev = live_blob_out
            self._mirror_stale = True
            self._mirror_bounditer = bounditer
            if self.blob:
                old_blobs = jax.device_get(old_blobs_dev)
            if out["n_consumed"] > 0:
                last_i = min(skip_off + out["n_consumed"],
                             len(out["delta_logz"])) - 1
                self._last_delta_logz = float(out["delta_logz"][last_i])
            ig = out["integ"]
            logz, logzvar = float(ig["logz"]), float(ig["logzvar"])
            h, logvol = float(ig["h"]), float(ig["logvol"])
            loglstar = float(ig["loglstar"])
            self.plateau_mode = ig["plateau_mode"]
            self.plateau_counter = ig["plateau_counter"]
            self.plateau_logdvol = float(ig["plateau_logdvol"])
            self.it = ig["it"]
            self._integ = dict(logz=logz, logzvar=logzvar, h=h,
                               logvol=logvol, loglstar=loglstar)
            nc_round = out["nc_used"]
            # exact invocation accounting: evals launched this dispatch
            # that were neither consumed nor kept for leftover replay are
            # charged now (their work happened; nobody else will bill it)
            extra_nc = max(out.get("nc_launched", 0) - nc_round - kept_nc,
                           0)
            self.ncall += nc_round + extra_nc
            # telemetry: cumulative billed-but-unconsumed speculative work
            self.nc_waste_total = getattr(self, "nc_waste_total", 0) + \
                extra_nc
            if per_dispatch:
                # the whole dispatch's calls are charged at block yield
                pending_block = IteratorBlock(n=0, nc=nc_round + extra_nc)
            else:
                staged_nc = int(np.sum(
                    out["records"][out["accepts"], rec_off + 6]))
                ncall += nc_round - staged_nc  # discarded entries' calls
            self.eff = 100.0 * (self.it - 1) / max(self.ncall, 1)

            # scale tuning ran on device at every queue refill; adopt
            # the final scale (plus any non-scale bookkeeping) here
            if out["stats"] is not None and not self.unit_cube_sampling:
                self.internal_sampler.apply_fused_tuning(out)

            # terminal stop reasons reported by the device round:
            # 1=dlogz, 2=logl_max, 4=live plateau, 8/16=max iter/calls
            reason = out["done_reason"]
            if reason & 0b00111:
                if reason & 0b00100:
                    warnings.warn("A likelihood plateau was reached; "
                                  "stopping the run.")
                terminal_break = True
                self._terminal_done = True
                if self._leftover is not None:
                    # the run is over: bill the outstanding speculative
                    # work and drop it (exact terminal ncall)
                    lo_nc = int(self._leftover["prop"][:, nc_col].sum())
                    self.ncall += lo_nc
                    extra_nc += lo_nc
                    self._leftover = None
                # a pending continuation represents work never launched:
                # nothing to bill, just drop it
                self._continuation = None
                infl = getattr(self, "_inflight", None)
                if infl is not None:
                    # a pipelined pre-launch can never be consumed now:
                    # bill its launched likelihood work (exact terminal
                    # ncall — the evals happened) and drop it
                    lay = infl["layout"]
                    offi = (lay["rec_shape"][0] * lay["rec_shape"][1] +
                            lay["n_integ"])
                    spec_nc = int(jax.device_get(infl["flat"][offi + 6]))
                    self.ncall += spec_nc
                    extra_nc += spec_nc
                    self.timings.count("nc_stranded_pipeline", spec_nc)
                    self._inflight = None
                self._next_spec = None

            # ---- eager launch of the NEXT dispatch: the spec is
            # created with fresh post-consume state — identical to the
            # lazy loop-top creation, since the yield drain below does
            # not mutate sampling state — and the dispatch starts on
            # the device BEFORE the expensive record-append/yield work,
            # which then overlaps the device compute.  Launching here
            # vs at the next loop top does not change the spec stream
            # (bounds are refit from the SAME post-consume live state),
            # so volatile budget state may gate the timing freely.
            n_new_disp = int(np.sum(out["accepts"]))
            extra_pre = max(out.get("nc_launched", 0) - out["nc_used"] -
                            kept_nc, 0)
            if per_dispatch:
                drain_nc = out["nc_used"] + extra_pre
            elif n_new_disp:
                staged_e = int(np.sum(
                    out["records"][out["accepts"], rec_off + 6]))
                drain_nc = staged_e + extra_pre + \
                    getattr(self, "_nc_carry", 0)
            else:
                drain_nc = 0
            ncall_after = ncall + drain_nc
            acc_after = accepted_this_call + n_new_disp
            if (normal_dispatch and not terminal_break
                    and self._leftover is None
                    and self._continuation is None
                    and self._pipeline_capable()
                    and acc_after < maxiter and ncall_after < maxcall):
                t_pl0 = time.perf_counter()
                # plan and LAUNCH on the current bound, then run the
                # refit trigger: the host refit (the single biggest
                # host cost at large nlive) overlaps the pre-launched
                # dispatch's device execution instead of idling the
                # device.  The planned bound is snapshotted into the
                # pickled spec so a checkpoint taken after the deferred
                # refit relaunches this dispatch bit-identically.
                spec2 = self._make_dispatch_spec(dlogz_eff, logl_max,
                                                 loglstar, refit=False)
                spec2["bounditer"] = self.nbound - 1 \
                    if not self.unit_cube_sampling else 0
                spec2["bound_version_used"] = self.bound_version
                spec2["bound_used"] = copy.deepcopy(self.bound)
                self._next_spec = spec2
                self.queue_size = spec2["queue_size"]
                axes2 = self.device_bound_arrays()
                key2 = jax.random.key(spec2["key_seed"])
                _upload_live()
                # limits as the lazy loop-top launch would compute them
                # AFTER the yield drain advances the budget counters
                limits2 = np.array([
                    float(dlogz_eff), float(logl_max),
                    float(min(maxiter - acc_after, 2**30)),
                    float(min(maxcall - ncall_after, 2**30)),
                ])
                h2 = self.internal_sampler.launch_fused(
                    self, key2, self._live_dev, self._live_blob_dev,
                    axes2, _integ_vec(), limits2,
                    rounds_active=spec2["rounds_active"])
                h2["spec"] = spec2
                h2["bounditer"] = spec2["bounditer"]
                self._inflight = h2
                self.timings.add("prelaunch",
                                 time.perf_counter() - t_pl0)
                self.timings.count("n_prelaunch")
                # deferred round-boundary refit trigger (overlapped with
                # the pre-launched dispatch's device work; see above)
                self.update_bound_if_needed(
                    max(loglstar, np.float64(LOWL_VAL)),
                    ncall=self.ncall)

            # ---- append the round's records in bulk, stage the yields
            recs = np.asarray(out["records"], dtype=np.float64)
            accepts = out["accepts"]
            scale_now = self.internal_sampler.scale
            acc_idx = np.nonzero(accepts)[0]
            n_new = len(acc_idx)
            # speculative work not tied to any single death is attributed
            # to the dispatch's last record (the reference's per-record nc
            # likewise includes its discarded-proposal cost); carried over
            # when a dispatch produced no records
            extra_nc += getattr(self, "_nc_carry", 0)
            self._nc_carry = 0 if n_new else extra_nc
            if n_new:
                tail = recs[acc_idx, rec_off:rec_off + 11]
                if extra_nc:
                    tail[-1, 6] += extra_nc
                worsts = recs[acc_idx, 0].astype(int)
                bidx = tail[:, 8].astype(int)
                bidx[bidx < 0] = bounditer
                old_blob_rows = [None] * n_new
                if self.blob:
                    old_blob_rows = [
                        jax.tree.map(lambda b: b[i], old_blobs)
                        for i in acc_idx
                    ]
                D = self.saved_run.D
                D["id"].extend(worsts.tolist())
                D["u"].extend(list(recs[acc_idx, 1:1 + ndim]))
                D["v"].extend(list(recs[acc_idx, 1 + ndim:rec_off]))
                D["logl"].extend(tail[:, 0].tolist())
                D["logvol"].extend(tail[:, 1].tolist())
                D["logwt"].extend(tail[:, 2].tolist())
                D["logz"].extend(tail[:, 3].tolist())
                D["logzvar"].extend(tail[:, 4].tolist())
                D["h"].extend(tail[:, 5].tolist())
                D["nc"].extend(tail[:, 6].astype(int).tolist())
                D["it"].extend(tail[:, 7].astype(int).tolist())
                D["n"].extend(tail[:, 9].astype(int).tolist())
                D["birth"].extend(tail[:, 10].tolist())
                D["bounditer"].extend([bounditer] * n_new)
                D["boundidx"].extend(bidx.tolist())
                D["scale"].extend([scale_now] * n_new)
                D["blob"].extend(old_blob_rows)
                if self.unit_cube_sampling:
                    row_stats = [None] * n_new
                else:
                    ls = out["lane_stats"][acc_idx]
                    row_stats = [
                        self.internal_sampler.row_stats(*ls[j])
                        for j in range(n_new)
                    ]
                D["proposal_stats"].extend(row_stats)
                if per_dispatch:
                    pending_block = IteratorBlock(n=n_new,
                                                  nc=pending_block.nc)
                else:
                    dlz = out["delta_logz"]
                    for j, i in enumerate(acc_idx):
                        self._pending_records.append(dict(
                            worst=int(worsts[j]),
                            ustar=recs[i, 1:1 + ndim],
                            vstar=recs[i, 1 + ndim:rec_off],
                            loglstar=tail[j, 0], logvol=tail[j, 1],
                            logwt=tail[j, 2], logz=tail[j, 3],
                            logzvar=tail[j, 4], h=tail[j, 5],
                            nc=int(tail[j, 6]), n=int(tail[j, 9]),
                            birth=tail[j, 10],
                            blob=old_blob_rows[j],
                            worst_it=int(tail[j, 7]), boundidx=int(bidx[j]),
                            bounditer=bounditer, eff=self.eff,
                            delta_logz=float(dlz[i]),
                            proposal_stats=row_stats[j]))
            self.timings.add("consume", time.perf_counter() - t_cons0)

        self._ensure_live_mirror()

    def add_live_points(self):
        """Recycle the final live points as dead points over the remaining
        volume (reference ``sampler.py:780-911``)."""
        if self.added_live:
            raise ValueError("The remaining live points have already "
                             "been added to the list of samples!")
        self._ensure_live_mirror()
        self.added_live = True
        if len(self.saved_run["logz"]) > 0:
            logz = self.saved_run["logz"][-1]
            logzvar = self.saved_run["logzvar"][-1]
            h = self.saved_run["h"][-1]
            loglstar = self.saved_run["logl"][-1]
            logvol = self.saved_run["logvol"][-1]
        else:
            h = 0.0
            logz = LOWL_VAL
            logzvar = 0.0
            logvol = self.logvol_init
            loglstar = LOWL_VAL

        lsort_idx = np.argsort(self.live_logl)
        logl_sorted = self.live_logl[lsort_idx]
        births = getattr(self, "live_birth", None)
        births = np.asarray(
            births if births is not None
            else np.full(self.nlive, -np.inf), float)
        # thread-aware live counts for the recycling ramp: a point born at
        # (or above) the current death level is not active there — its
        # thread covers only (birth, death] — so it must not be counted.
        # When every birth lies below the lowest live logl (a completed
        # final round) this reduces exactly to the plain nlive..1 ramp;
        # after a mid-round stop the refills born at the round threshold
        # drop out below it.  n_i = (nlive - i) - #{births >= logl_i}
        # (points already recycled, j < i, always have birth < logl_j <=
        # logl_i, so the count can be taken over all live births).
        births_sorted = np.sort(births)
        cnt_ge = self.nlive - np.searchsorted(births_sorted, logl_sorted,
                                              side="left")
        ramp_n = np.maximum(self.nlive - np.arange(self.nlive) - cnt_ge, 1)
        if not self.plateau_mode:
            # cumulative prod of E[Beta(n_i,1)] shrinkages; equals
            # log(1-(i+1)/(nlive+1)) when ramp_n is the plain ramp
            logvols = np.cumsum(-np.log1p(1.0 / ramp_n))
        else:
            # consume the remaining plateau at its fixed delta-vol first
            logvols = np.log1p(-((1 + np.arange(self.plateau_counter)) *
                                 np.exp(self.plateau_logdvol - logvol)))
            nrest = self.nlive - self.plateau_counter
            logvols = np.concatenate([
                logvols,
                logvols[-1] +
                np.log1p(-(1 + np.arange(nrest)) / (nrest + 1.0))
            ])
        dlvs = -np.diff(logvols, prepend=0)
        logvols += logvol

        loglmax = max(self.live_logl)
        bounditer = self.nbound - 1 if not self.unit_cube_sampling else 0

        for i in range(self.nlive):
            idx = lsort_idx[i]
            logvol, dlv = logvols[i], dlvs[i]
            ustar = self.live_u[idx].copy()
            vstar = self.live_v[idx].copy()
            old_blob = (copy.copy(self.live_blobs[idx])
                        if self.blob else None)
            loglstar_new = self.live_logl[idx]
            boundidx = self.live_bound[idx]
            point_it = self.live_it[idx]
            birth = getattr(self, "live_birth", None)
            birth = birth[idx] if birth is not None else -np.inf

            logwt, logz, logzvar, h = progress_integration(
                loglstar, loglstar_new, logz, logzvar, logvol, dlv, h)
            loglstar = loglstar_new
            delta_logz = np.logaddexp(0, loglmax + logvol - logz)

            self.saved_run.append(
                dict(id=idx, u=ustar, v=vstar, logl=loglstar,
                     logvol=logvol, logwt=logwt, logz=logz,
                     logzvar=logzvar, h=h,
                     nc=1,  # bookkeeping placeholder (no eval happened)
                     n=int(ramp_n[i]) if not self.plateau_mode
                     else self.nlive - i,
                     birth=birth,
                     boundidx=boundidx, it=point_it, bounditer=bounditer,
                     scale=self.internal_sampler.scale, blob=old_blob,
                     proposal_stats=None))
            self.eff = 100.0 * (self.it + i) / self.ncall

            yield IteratorResult(worst=idx, ustar=ustar, vstar=vstar,
                                 loglstar=loglstar, logvol=logvol,
                                 logwt=logwt, logz=logz, logzvar=logzvar,
                                 h=h, nc=1,
                                 n=int(ramp_n[i]) if not self.plateau_mode
                                 else self.nlive - i,
                                 birth=birth,
                                 blob=old_blob,
                                 worst_it=point_it, boundidx=boundidx,
                                 bounditer=bounditer, eff=self.eff,
                                 delta_logz=delta_logz,
                                 proposal_stats=None)

    def _remove_live_points(self):
        """Drop previously added live points from the saved run."""
        if not self.added_live:
            raise ValueError("No live points were added to the "
                             "list of samples!")
        self.added_live = False
        for k in ("id", "u", "v", "logl", "logvol", "logwt", "logz",
                  "logzvar", "h", "nc", "n", "birth", "boundidx", "it",
                  "bounditer", "scale", "blob", "proposal_stats"):
            del self.saved_run[k][-self.nlive:]

    def run_nested(self, maxiter=None, maxcall=None, dlogz=None,
                   logl_max=np.inf, add_live=True, print_progress=True,
                   print_func=None, save_bounds=True, checkpoint_file=None,
                   checkpoint_every=60, resume=False):
        """Run the full static fit (driver around :meth:`sample`)."""
        if resume and self.added_live:
            warnings.warn("Cannot resume a successfully finished run; "
                          "no sampling performed.", RuntimeWarning)
            return
        if dlogz is None:
            if add_live:
                dlogz = 1e-3 * (self.nlive - 1.0) + 0.01
            else:
                dlogz = 0.01
        pbar, print_func = get_print_func(print_func, print_progress)
        if checkpoint_file is not None:
            timer = DelayTimer(checkpoint_every)
        t_run0 = time.perf_counter()
        try:
            ncall = self.ncall
            # without progress printing, consume whole device dispatches
            # (per-record Python costs more than the device work)
            fast = not print_progress
            for results in self.sample(maxiter=maxiter, maxcall=maxcall,
                                       dlogz=dlogz, logl_max=logl_max,
                                       save_bounds=save_bounds,
                                       resume=resume, add_live=add_live,
                                       per_dispatch=fast):
                ncall += results.nc
                if print_progress:
                    niter = self.it - 1
                    print_func(results, niter, ncall, dlogz=dlogz)
                if (checkpoint_file is not None and timer.is_time()):
                    self.save(checkpoint_file)
            if add_live:
                it = 0
                t_al0 = time.perf_counter()
                for results in self.add_live_points():
                    ncall += results.nc
                    niter = self.it + it
                    it += 1
                    if print_progress:
                        print_func(results, niter, ncall, add_live_it=it,
                                   dlogz=dlogz)
                self.timings.add("add_live", time.perf_counter() - t_al0)
            # re-derive the integrals in one consistent pass
            t_int0 = time.perf_counter()
            new_logwt, new_logz, new_logzvar, new_h = compute_integrals(
                logl=self.saved_run["logl"],
                logvol=self.saved_run["logvol"])
            self.saved_run["logwt"] = new_logwt.tolist()
            self.saved_run["logz"] = new_logz.tolist()
            self.saved_run["logzvar"] = new_logzvar.tolist()
            self.saved_run["h"] = new_h.tolist()
            self.timings.add("integrals", time.perf_counter() - t_int0)
            if checkpoint_file is not None:
                self.save(checkpoint_file)
        finally:
            self.timings.add("total", time.perf_counter() - t_run0)
            if pbar is not None:
                pbar.close()
            self.loglikelihood.finalize_history()
            if print_progress:
                sys.stderr.write("\n")
