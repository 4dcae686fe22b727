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
import warnings

import numpy as np
import jax

from .bounding import UnitCube, get_bound
from .internal.samplers import UnitCubeSampler
from .ops.integrals import LOWL_VAL, compute_integrals, progress_integration
from .utils.checkpoint import restore_sampler, save_sampler
from .utils.misc import (DelayTimer, IteratorBlock, IteratorResult,
                         get_jax_key,
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
                 rounds_per_dispatch=1):
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

        self.rstate = rstate or get_random_generator()
        self.sampling = sampling
        self.internal_sampler_next = sampling
        self.internal_sampler = UnitCubeSampler(ndim=ndim)

        self.queue_size = max(int(queue_size or 64), 1)
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
        self.cite = cite or ""
        self.pool = None
        self.mapper = map
        # optional jax.sharding.Mesh: shards the proposal batch over chips
        self.mesh = mesh
        # chain this many propose+consume rounds per device call
        # (amortizes fixed dispatch costs; bound refits and tuning then
        # happen every rounds_per_dispatch queue refills)
        self.rounds_per_dispatch = max(int(rounds_per_dispatch), 1)

    # ------------------------------------------------------------------
    # persistence

    def save(self, fname):
        save_sampler(self, fname)

    @staticmethod
    def restore(fname, pool=None):
        return restore_sampler(fname, pool=pool)

    def __getstate__(self):
        self._ensure_live_mirror()
        state = self.__dict__.copy()
        for k in ("pool", "mapper", "mesh", "_live_dev",
                  "_live_blob_dev", "_bound_upload", "_mirror_stale"):
            state.pop(k, None)
        return state

    def __setstate__(self, state):
        self.__dict__ = state
        self.pool = None
        self.mapper = map
        self.mesh = None

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
        for k in ("_integ", "_pending_records", "_leftover", "_live_dev",
                  "_live_blob_dev", "_mirror_stale", "_bound_upload"):
            self.__dict__.pop(k, None)

    # ------------------------------------------------------------------
    # bound management

    def update_bound(self, subset=slice(None)):
        """Refit the bound to the current live points."""
        self.bound.update(self.live_u[subset, :self.ncdim],
                          rstate=self.rstate,
                          bootstrap=self.bound_bootstrap,
                          pool=None)
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
        self._ensure_live_mirror()
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

    def device_bound_arrays(self):
        """Device upload of the active bound's arrays, cached per refit
        (uploads are expensive on relayed devices)."""
        import jax.numpy as jnp

        from .internal.kernels import pad_ellipsoids

        kind = self.device_bound_kind()
        if kind == "cube":
            return {}
        if kind == "custom":
            import jax.numpy as jnp
            axes = np.asarray(self.bound.get_random_axes(self.rstate))
            return {"axes": jnp.asarray(axes)}
        cached = getattr(self, "_bound_upload", None)
        if cached is not None and cached[0] == self.bound_version and \
                cached[1] == kind:
            dev = cached[2]
        else:
            _, arrays = self.bound.device_spec()
            if kind == "ellipsoids":
                arrays = pad_ellipsoids(arrays["ctrs"], arrays["axes"],
                                        arrays["ams"], arrays["logvols"])
            else:
                arrays = dict(arrays)
            dev = {k: jnp.asarray(v) for k, v in arrays.items()}
            self._bound_upload = (self.bound_version, kind, dev)
        if kind in ("balls", "cubes"):
            dev = dict(dev)
            dev["ctrs"] = jnp.asarray(np.asarray(self.bound.ctrs))
        return dev

    def _live_packed(self):
        """Pack the live mirrors into the fused round's (nlive, W) float
        matrix: u | v | logl | it | bound."""
        return np.concatenate([
            self.live_u, self.live_v, self.live_logl[:, None],
            self.live_it[:, None].astype(np.float64),
            self.live_bound[:, None].astype(np.float64),
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

    def _ensure_live_mirror(self):
        """Refresh the host live mirrors from the device-resident state
        (live points stay on device between fused rounds)."""
        if getattr(self, "_mirror_stale", False):
            import jax

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

    def _check_live_in_bound(self):
        """Force a refit when live points escaped the bound (the fused
        analogue of per-start containment checks,
        reference ``sampler.py:483-491``)."""
        if self.unit_cube_sampling:
            return
        if self.bound.need_centers:
            self.bound.ctrs = self.live_u
        if hasattr(self.bound, "contains_many"):
            escaped = not self.bound.contains_many(
                self.live_u[:, :self.ncdim]).all()
        else:
            escaped = any(
                not self.bound.contains(u[:self.ncdim])
                for u in self.live_u)
        if escaped:
            self.update_bound_if_needed(-np.inf, force=True)
            if self.bound.need_centers:
                self.bound.ctrs = self.live_u
            still = any(not self.bound.contains(u[:self.ncdim])
                        for u in self.live_u)
            if still:
                raise RuntimeError("Update of the bound failed")

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
        for k in ("nc", "v", "id", "it", "u", "logwt", "logl", "logvol",
                  "logz", "logzvar", "h", "bounditer", "boundidx", "scale",
                  "blob", "proposal_stats"):
            d[k] = np.array(self.saved_run[k])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            results = [("nlive", self.nlive), ("niter", self.it - 1),
                       ("ncall", d["nc"]), ("eff", self.eff),
                       ("samples", d["v"]), ("blob", d["blob"]),
                       ("samples_id", d["id"]), ("samples_it", d["it"]),
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
        terminal_break = False

        if getattr(self, "_integ", None) is not None and resume:
            st = self._integ
            logz, logzvar = st["logz"], st["logzvar"]
            h, logvol, loglstar = st["h"], st["logvol"], st["loglstar"]
        if not hasattr(self, "_pending_records"):
            self._pending_records = []
        if not hasattr(self, "_leftover"):
            self._leftover = None
        self._live_dev = getattr(self, "_live_dev", None)
        self._live_blob_dev = getattr(self, "_live_blob_dev", None)
        self._mirror_stale = getattr(self, "_mirror_stale", False)

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
                self._live_dev = jnp.asarray(packed, self.dtype)
                if self.blob:
                    self._live_blob_dev = jax.tree.map(
                        lambda *bs: jnp.asarray(np.stack(bs)),
                        *self.live_blobs)

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
                break
            if accepted_this_call >= maxiter or ncall >= maxcall:
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
                out, live_out, live_blob_out, old_blobs_dev = \
                    self.internal_sampler.run_replay(
                        self, key, self._live_dev, self._live_blob_dev,
                        prop_padded, pb_pad, integ, limits)
                n_real_limit = n_real
            else:
                # round boundary: refit triggers (syncs live mirrors)
                loglstar_round = max(loglstar, np.float64(LOWL_VAL))
                self.update_bound_if_needed(loglstar_round,
                                            ncall=self.ncall)
                bounditer = self.nbound - 1 \
                    if not self.unit_cube_sampling else 0
                axes_args = self.device_bound_arrays()
                key = _get_key(self.rstate)
                _upload_live()
                out, live_out, live_blob_out, old_blobs_dev = \
                    self.internal_sampler.run_fused(
                        self, key, self._live_dev, self._live_blob_dev,
                        axes_args, integ, limits)
                # actual dispatch width (the unit-cube phase caps the
                # chained rounds regardless of rounds_per_dispatch)
                n_real_limit = len(out["accepts"])

            # ---- leftover bookkeeping (checkpoint-exact resume)
            n_cons = min(out["n_consumed"], n_real_limit)
            if self._leftover is not None:
                # chunked replay: drop the consumed prefix
                prop_rest = self._leftover["prop"][n_cons:]
                if len(prop_rest):
                    lo = {"prop": prop_rest}
                    if self.blob and self._leftover.get("blob") is not None:
                        lo["blob"] = jax.tree.map(
                            lambda b: b[n_cons:], self._leftover["blob"])
                    self._leftover = lo
                else:
                    self._leftover = None
            elif n_cons < n_real_limit:
                # rare (dispatch ended early): fetch the device-resident
                # proposals block for checkpoint-exact leftover replay
                props = np.asarray(
                    jax.device_get(out["proposals_dev"]),
                    dtype=np.float64)[n_cons:n_real_limit]
                lo = {"prop": props}
                if self.blob:
                    all_blob = jax.device_get(out["qblob"])
                    lo["blob"] = jax.tree.map(
                        lambda b: np.asarray(b)[n_cons:n_real_limit],
                        all_blob)
                self._leftover = lo
            else:
                self._leftover = None

            # ---- adopt the device-side state
            self._live_dev = live_out
            self._live_blob_dev = live_blob_out
            self._mirror_stale = True
            self._mirror_bounditer = bounditer
            if self.blob:
                old_blobs = jax.device_get(old_blobs_dev)
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
            self.ncall += nc_round
            if per_dispatch:
                # the whole dispatch's calls are charged at block yield
                pending_block = IteratorBlock(n=0, nc=nc_round)
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

            # ---- append the round's records in bulk, stage the yields
            recs = np.asarray(out["records"], dtype=np.float64)
            accepts = out["accepts"]
            scale_now = self.internal_sampler.scale
            acc_idx = np.nonzero(accepts)[0]
            n_new = len(acc_idx)
            if n_new:
                tail = recs[acc_idx, rec_off:rec_off + 9]
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
                            nc=int(tail[j, 6]), blob=old_blob_rows[j],
                            worst_it=int(tail[j, 7]), boundidx=int(bidx[j]),
                            bounditer=bounditer, eff=self.eff,
                            delta_logz=float(dlz[i]),
                            proposal_stats=row_stats[j]))

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

        if not self.plateau_mode:
            logvols = np.log(1.0 - (np.arange(self.nlive) + 1.0) /
                             (self.nlive + 1.0))
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

        lsort_idx = np.argsort(self.live_logl)
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

            logwt, logz, logzvar, h = progress_integration(
                loglstar, loglstar_new, logz, logzvar, logvol, dlv, h)
            loglstar = loglstar_new
            delta_logz = np.logaddexp(0, loglmax + logvol - logz)

            self.saved_run.append(
                dict(id=idx, u=ustar, v=vstar, logl=loglstar,
                     logvol=logvol, logwt=logwt, logz=logz,
                     logzvar=logzvar, h=h,
                     nc=1,  # bookkeeping placeholder (no eval happened)
                     boundidx=boundidx, it=point_it, bounditer=bounditer,
                     scale=self.internal_sampler.scale, blob=old_blob,
                     proposal_stats=None))
            self.eff = 100.0 * (self.it + i) / self.ncall

            yield IteratorResult(worst=idx, ustar=ustar, vstar=vstar,
                                 loglstar=loglstar, logvol=logvol,
                                 logwt=logwt, logz=logz, logzvar=logzvar,
                                 h=h, nc=1, blob=old_blob,
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
                  "logzvar", "h", "nc", "boundidx", "it", "bounditer",
                  "scale", "blob", "proposal_stats"):
            del self.saved_run[k][-self.nlive:]

    def run_nested(self, maxiter=None, maxcall=None, dlogz=None,
                   logl_max=np.inf, add_live=True, print_progress=True,
                   print_func=None, save_bounds=True, checkpoint_file=None,
                   checkpoint_every=60, resume=False):
        """Run the full static fit (driver around :meth:`sample`)."""
        if dlogz is None:
            if add_live:
                dlogz = 1e-3 * (self.nlive - 1.0) + 0.01
            else:
                dlogz = 0.01
        pbar, print_func = get_print_func(print_func, print_progress)
        if checkpoint_file is not None:
            timer = DelayTimer(checkpoint_every)
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
                for results in self.add_live_points():
                    ncall += results.nc
                    niter = self.it + it
                    it += 1
                    if print_progress:
                        print_func(results, niter, ncall, add_live_it=it,
                                   dlogz=dlogz)
            # re-derive the integrals in one consistent pass
            new_logwt, new_logz, new_logzvar, new_h = compute_integrals(
                logl=self.saved_run["logl"],
                logvol=self.saved_run["logvol"])
            self.saved_run["logwt"] = new_logwt.tolist()
            self.saved_run["logz"] = new_logz.tolist()
            self.saved_run["logzvar"] = new_logzvar.tolist()
            self.saved_run["h"] = new_h.tolist()
            if checkpoint_file is not None:
                self.save(checkpoint_file)
        finally:
            if pbar is not None:
                pbar.close()
            self.loglikelihood.finalize_history()
            if print_progress:
                sys.stderr.write("\n")
