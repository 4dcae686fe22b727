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
import math
import sys
import warnings

import numpy as np

from .bounding import UnitCube, get_bound
from .internal.samplers import UnitCubeSampler
from .ops.integrals import LOWL_VAL, compute_integrals, progress_integration
from .utils.checkpoint import restore_sampler, save_sampler
from .utils.misc import (DelayTimer, IteratorResult, get_jax_key,
                         get_print_func, get_random_generator)
from .utils.results import Results, RunRecord

__all__ = ["Sampler", "initialize_live_points"]


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
                 mesh=None):
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
        self.bound_version = 0  # bumped at each refit (device upload cache)
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

    # ------------------------------------------------------------------
    # persistence

    def save(self, fname):
        save_sampler(self, fname)

    @staticmethod
    def restore(fname, pool=None):
        return restore_sampler(fname, pool=pool)

    def __getstate__(self):
        state = self.__dict__.copy()
        for k in ("pool", "mapper", "mesh"):
            state.pop(k, None)
        return state

    def __setstate__(self, state):
        self.__dict__ = state
        self.pool = None
        self.mapper = map
        self.mesh = None

    # ------------------------------------------------------------------
    # bound management

    def update_bound(self, subset=slice(None)):
        """Refit the bound to the current live points."""
        self.bound.update(self.live_u[subset, :self.ncdim],
                          rstate=self.rstate,
                          bootstrap=self.bound_bootstrap,
                          pool=None)
        self.bound_version += 1
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
               resume=False):
        """Generator yielding one dead point per iteration (reference
        ``sampler.py:932-1212``)."""
        if maxcall is None:
            maxcall = sys.maxsize
        if maxiter is None:
            maxiter = sys.maxsize
        self.save_bounds = save_bounds
        ncall = 0

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

        stop_iterations = False
        for it in range(sys.maxsize):
            delta_logz = np.logaddexp(
                0, np.max(self.live_logl) + logvol - logz)

            if it > maxiter or ncall > maxcall:
                stop_iterations = True
                if dlogz is not None and delta_logz > 10 * dlogz:
                    warnings.warn(
                        "Sampling stopped short by maxiter/maxcall before "
                        "reaching the dlogz criterion; posterior may be "
                        "poorly sampled.")
            if dlogz is not None and delta_logz < dlogz:
                stop_iterations = True
            if loglstar > logl_max:
                stop_iterations = True
            if np.ptp(self.live_logl) == 0:
                warnings.warn("A likelihood plateau was reached; stopping "
                              "the run.")
                stop_iterations = True
            if stop_iterations:
                break

            worst = int(np.argmin(self.live_logl))
            worst_it = self.live_it[worst]
            boundidx = self.live_bound[worst]

            if not self.plateau_mode:
                nplateau = (self.live_logl == self.live_logl[worst]).sum()
                if nplateau > 1:
                    # likelihood plateau: spread the current volume evenly
                    # over the plateau points (Fowlie et al. 2020)
                    self.plateau_mode = True
                    self.plateau_counter = nplateau
                    self.plateau_logdvol = (
                        np.log(1.0 / (self.nlive + 1)) + logvol)
            if not self.plateau_mode:
                cur_dlv = self.dlv
            else:
                cur_dlv = -np.log1p(
                    -np.exp(self.plateau_logdvol - logvol))
            assert cur_dlv > 0
            logvol -= cur_dlv

            ustar = self.live_u[worst].copy()
            vstar = self.live_v[worst].copy()
            loglstar_new = self.live_logl[worst]
            old_blob = (copy.copy(self.live_blobs[worst])
                        if self.blob else None)

            u, v, logl, nc, new_blob, proposal_stats = \
                self._new_point(loglstar_new)
            ncall += nc
            self.ncall += nc

            logwt, logz, logzvar, h = progress_integration(
                loglstar, loglstar_new, logz, logzvar, logvol, cur_dlv, h)
            loglstar = loglstar_new

            bounditer = self.nbound - 1 if not self.unit_cube_sampling else 0

            self.saved_run.append(
                dict(id=worst, u=ustar, v=vstar, logl=loglstar,
                     logvol=logvol, logwt=logwt, logz=logz,
                     logzvar=logzvar, h=h, nc=nc, it=worst_it,
                     bounditer=bounditer, boundidx=boundidx,
                     scale=self.internal_sampler.scale, blob=old_blob,
                     proposal_stats=proposal_stats))

            self.live_u[worst] = u
            self.live_v[worst] = v
            self.live_logl[worst] = logl
            self.live_bound[worst] = bounditer
            self.live_it[worst] = self.it
            if self.blob:
                self.live_blobs[worst] = new_blob
            self.eff = 100.0 * self.it / self.ncall
            self.it += 1

            if self.plateau_mode:
                self.plateau_counter -= 1
                if self.plateau_counter == 0:
                    self.plateau_mode = False

            yield IteratorResult(worst=worst, ustar=ustar, vstar=vstar,
                                 loglstar=loglstar, logvol=logvol,
                                 logwt=logwt, logz=logz, logzvar=logzvar,
                                 h=h, nc=nc, blob=old_blob,
                                 worst_it=worst_it, boundidx=boundidx,
                                 bounditer=bounditer, eff=self.eff,
                                 delta_logz=delta_logz,
                                 proposal_stats=proposal_stats)

    def add_live_points(self):
        """Recycle the final live points as dead points over the remaining
        volume (reference ``sampler.py:780-911``)."""
        if self.added_live:
            raise ValueError("The remaining live points have already "
                             "been added to the list of samples!")
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
            for results in self.sample(maxiter=maxiter, maxcall=maxcall,
                                       dlogz=dlogz, logl_max=logl_max,
                                       save_bounds=save_bounds,
                                       resume=resume, add_live=add_live):
                ncall += results.nc
                niter = self.it - 1
                if print_progress:
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
