"""User-facing factories: argument resolution for the static and dynamic
nested samplers (reference ``dynesty.py:458-774``).

Extra TPU-specific knob: ``likelihood_mode`` selects how the user
callables are evaluated —

* ``'jax'`` (default): JAX-traceable per-point functions, vmapped over the
  proposal batch on device;
* ``'vectorized'``: JAX-traceable batched functions;
* ``'host'``: arbitrary Python callables evaluated on the host through
  ``io_callback`` (dynesty's fully-general contract, at reduced speed);
  an optional ``pool`` maps the per-point calls.

``queue_size`` is the proposal batch width (the device parallelism axis,
the analogue of the reference's pool queue).
"""

import numpy as np

from .bounding import get_bound  # noqa: F401  (re-export)
from .internal.likelihood import LogLikelihood
from .internal.samplers import UniformBoundSampler, get_internal_sampler
from .sampler import Sampler, initialize_live_points
from .utils.misc import get_random_generator

__all__ = ["NestedSampler", "DynamicNestedSampler"]

_CORE_REFS = [
    ("Speagle (2020)", "ui.adsabs.harvard.edu/abs/2020MNRAS.493.3132S"),
    ("Koposov et al. (2024)", "doi.org/10.5281/zenodo.3348367"),
]
_NESTED_REFS = [
    ("Skilling (2004)", "ui.adsabs.harvard.edu/abs/2004AIPC..735..395S"),
    ("Skilling (2006)", "projecteuclid.org/euclid.ba/1340370944"),
]
_DYNAMIC_REFS = [
    ("Higson et al. (2019)", "doi.org/10.1007/s11222-018-9844-0"),
]
_BOUND_REFS = {
    "none": [],
    "single": [("Mukherjee, Parkinson & Liddle (2006)",
                "ui.adsabs.harvard.edu/abs/2006ApJ...638L..51M")],
    "multi": [("Feroz, Hobson & Bridges (2009)",
               "ui.adsabs.harvard.edu/abs/2009MNRAS.398.1601F")],
    "balls": [("Buchner (2016)",
               "ui.adsabs.harvard.edu/abs/2014arXiv1407.5459B"),
              ("Buchner (2017)",
               "ui.adsabs.harvard.edu/abs/2017arXiv170704476B")],
    "cubes": [("Buchner (2016)",
               "ui.adsabs.harvard.edu/abs/2014arXiv1407.5459B"),
              ("Buchner (2017)",
               "ui.adsabs.harvard.edu/abs/2017arXiv170704476B")],
}


def _get_citations(nested_type, bound, internal_sampler):
    """Printable citation list for the chosen configuration (reference
    ``dynesty.py:27-123``)."""
    def fmt(refs):
        return "\n".join(f"{name}: {url}" for name, url in refs)

    blocks = [
        ("Code and Methods", _CORE_REFS),
        ("Nested Sampling", _NESTED_REFS),
    ]
    if nested_type == "dynamic":
        blocks.append(("Dynamic Nested Sampling", _DYNAMIC_REFS))
    bound_refs = _BOUND_REFS.get(bound if isinstance(bound, str) else "",
                                 [])
    if bound_refs:
        blocks.append(("Bounding Method", bound_refs))
    sampler_refs = list(getattr(internal_sampler, "citations", []) or [])
    if sampler_refs:
        blocks.append(("Sampling Method", sampler_refs))
    return "\n\n".join(f"{title}:\n{fmt(refs)}"
                       for title, refs in blocks)

_DEFAULT_ENLARGE = 1.25
_DEFAULT_UNIF_BOOTSTRAP = 5


def _get_enlarge_bootstrap(sample, enlarge, bootstrap):
    """Auto rules of the reference (``dynesty.py:169-200``)."""
    if enlarge is not None and bootstrap is None:
        assert enlarge >= 1
        return enlarge, 0
    if enlarge is None and bootstrap is not None:
        assert bootstrap > 1 or bootstrap == 0
        return 1, bootstrap
    if enlarge is None and bootstrap is None:
        if isinstance(sample, UniformBoundSampler):
            return 1, _DEFAULT_UNIF_BOOTSTRAP
        return _DEFAULT_ENLARGE, 0
    if bootstrap == 0 or enlarge == 1:
        return enlarge, bootstrap
    raise ValueError("enlarge and bootstrap together only make sense with "
                     "bootstrap=0 or enlarge=1")


def _check_first_update(first_update):
    for k in first_update.keys():
        if k not in ("min_ncall", "min_eff"):
            raise ValueError(f"Unrecognized first_update key {k}")


def _get_nonbounded(ndim, periodic, reflective):
    """Mask that is True for dims with hard unit-cube boundaries."""
    if periodic is not None and reflective is not None:
        if np.intersect1d(periodic, reflective).size > 0:
            raise ValueError("A parameter cannot be both periodic and "
                             "reflective.")
    if periodic is None and reflective is None:
        return None
    nonbounded = np.ones(ndim, dtype=bool)
    for idx in (periodic, reflective):
        if idx is not None:
            if np.max(idx) >= ndim:
                raise ValueError("periodic/reflective index >= ndim")
            nonbounded[np.asarray(idx)] = False
    return nonbounded


def _resolve_update_interval(update_interval, internal_sampler, nlive):
    if update_interval is None:
        ratio = internal_sampler.update_bound_interval_ratio
    elif isinstance(update_interval, float):
        ratio = update_interval
    elif isinstance(update_interval, int):
        ratio = update_interval / nlive
    else:
        raise ValueError(f"Invalid update_interval {update_interval}")
    return max(1, int(round(ratio * nlive)))


_USE_POOL_KEYS = ("prior_transform", "loglikelihood", "propose_point",
                  "update_bound", "stop_function")


def _parse_use_pool(use_pool):
    """Validate and default the per-site pool flags (reference
    ``sampler.py:381-386``).  ``propose_point`` is accepted for API parity
    but has no separate meaning here: proposals always run as one device
    batch, and in host mode their likelihood calls already go through the
    ``loglikelihood`` flag."""
    use_pool = dict(use_pool or {})
    for k in use_pool:
        if k not in _USE_POOL_KEYS:
            raise ValueError(
                f"Unknown use_pool key '{k}' (valid: {_USE_POOL_KEYS})")
    return {k: bool(use_pool.get(k, True)) for k in _USE_POOL_KEYS}


def _common_init(loglikelihood, prior_transform, ndim, nlive, bound, sample,
                 periodic, reflective, walks, facc, slices, ncdim, blob,
                 likelihood_mode, pool, queue_size, rstate,
                 logl_args, logl_kwargs, ptform_args, ptform_kwargs,
                 enlarge, bootstrap, update_interval, first_update,
                 save_evaluation_history=False, history_filename=None,
                 use_pool=None):
    ncdim = ncdim or ndim
    if ncdim != ndim and sample in ("slice", "rslice"):
        raise ValueError("ncdim unsupported for slice sampling")
    nonbounded = _get_nonbounded(ndim, periodic, reflective)
    internal_sampler = get_internal_sampler(
        sample, ndim, ncdim=ncdim, nonbounded=nonbounded, periodic=periodic,
        reflective=reflective, walks=walks, facc=facc, slices=slices)
    enlarge, bootstrap = _get_enlarge_bootstrap(internal_sampler, enlarge,
                                               bootstrap)
    first_update = first_update or {}
    _check_first_update(first_update)
    rstate = get_random_generator(rstate)

    use_pool = _parse_use_pool(use_pool)
    like = LogLikelihood(loglikelihood, prior_transform, ndim,
                         mode=likelihood_mode, blob=blob, pool=pool,
                         use_pool_logl=use_pool["loglikelihood"],
                         use_pool_ptform=use_pool["prior_transform"],
                         logl_args=logl_args, logl_kwargs=logl_kwargs,
                         ptform_args=ptform_args,
                         ptform_kwargs=ptform_kwargs,
                         save_evaluation_history=save_evaluation_history,
                         history_filename=history_filename)
    if queue_size is None:
        pool_size = (getattr(pool, "njobs", None)
                     or getattr(pool, "_processes", None))
        if likelihood_mode == "host" and pool_size:
            # host mode: the pool's width is the natural batch width
            queue_size = max(32, min(nlive, 8 * pool_size))
        else:
            queue_size = max(32, min(nlive, 256))
    bound_update_interval = _resolve_update_interval(
        update_interval, internal_sampler, nlive)
    return dict(like=like, internal_sampler=internal_sampler,
                enlarge=enlarge, bootstrap=bootstrap,
                first_update=first_update, rstate=rstate,
                queue_size=queue_size, ncdim=ncdim,
                bound_update_interval=bound_update_interval,
                bound=bound, use_pool=use_pool,
                cite=lambda kind: _get_citations(kind, bound,
                                                 internal_sampler))


class NestedSampler(Sampler):
    """Static nested sampler factory (reference ``dynesty.py:578-684``)."""

    def __init__(self, loglikelihood, prior_transform, ndim, nlive=500,
                 bound="multi", sample="auto", periodic=None,
                 reflective=None, update_interval=None, first_update=None,
                 rstate=None, queue_size=None, pool=None, use_pool=None,
                 live_points=None, logl_args=None, logl_kwargs=None,
                 ptform_args=None, ptform_kwargs=None, enlarge=None,
                 bootstrap=None, walks=None, facc=0.5, slices=None,
                 ncdim=None, blob=False, likelihood_mode="jax",
                 mesh=None, rounds_per_dispatch=None,
                 proposal_mode="batch", dtype=None,
                 save_evaluation_history=False, history_filename=None):
        cfg = _common_init(loglikelihood, prior_transform, ndim, nlive,
                           bound, sample, periodic, reflective, walks, facc,
                           slices, ncdim, blob, likelihood_mode, pool,
                           queue_size, rstate, logl_args, logl_kwargs,
                           ptform_args, ptform_kwargs, enlarge, bootstrap,
                           update_interval, first_update,
                           save_evaluation_history, history_filename,
                           use_pool=use_pool)
        live_points, logvol_init, init_ncalls = initialize_live_points(
            live_points, cfg["like"], nlive, ndim, cfg["rstate"], blob=blob)

        # None = auto (8 rounds, with per-kernel caps); an explicit value
        # also lifts the uniform-kernel chain cap (expensive-likelihood
        # regime: dispatch amortization outweighs bound staleness)
        rounds_explicit = rounds_per_dispatch is not None
        super().__init__(
            loglikelihood=cfg["like"],
            ndim=ndim,
            live_points=live_points,
            sampling=cfg["internal_sampler"],
            bounding=cfg["bound"],
            ncdim=cfg["ncdim"],
            rstate=cfg["rstate"],
            queue_size=cfg["queue_size"],
            bound_update_interval=cfg["bound_update_interval"],
            first_bound_update=cfg["first_update"],
            bound_bootstrap=cfg["bootstrap"],
            bound_enlarge=cfg["enlarge"],
            blob=blob,
            logvol_init=logvol_init,
            cite=cfg["cite"]("static"),
            dtype=dtype,
            mesh=mesh,
            rounds_per_dispatch=rounds_per_dispatch or 8,
            rounds_explicit=rounds_explicit,
            proposal_mode=proposal_mode)
        self.ncall = init_ncalls
        self.pool = pool
        self.use_pool = cfg["use_pool"]
        if pool is not None:
            self.mapper = pool.map


def DynamicNestedSampler(loglikelihood, prior_transform, ndim, nlive=500,
                         bound="multi", sample="auto", periodic=None,
                         reflective=None, update_interval=None,
                         first_update=None, rstate=None, queue_size=None,
                         pool=None, use_pool=None, logl_args=None,
                         logl_kwargs=None, ptform_args=None,
                         ptform_kwargs=None, enlarge=None, bootstrap=None,
                         walks=None, facc=0.5, slices=None, ncdim=None,
                         blob=False, likelihood_mode="jax",
                         rounds_per_dispatch=None, proposal_mode="batch",
                         dtype=None, mesh=None,
                         save_evaluation_history=False,
                         history_filename=None):
    """Dynamic nested sampler factory with the reference's full kwarg
    surface (``dynesty.py:691-774``; the implementation lives in
    :mod:`dynesty_tpu.dynamicsampler`, imported lazily to avoid a
    cycle)."""
    from .dynamicsampler import DynamicSampler
    return DynamicSampler.create(
        loglikelihood, prior_transform, ndim, nlive=nlive, bound=bound,
        sample=sample, periodic=periodic, reflective=reflective,
        update_interval=update_interval, first_update=first_update,
        rstate=rstate, queue_size=queue_size, pool=pool,
        use_pool=use_pool, logl_args=logl_args, logl_kwargs=logl_kwargs,
        ptform_args=ptform_args, ptform_kwargs=ptform_kwargs,
        enlarge=enlarge, bootstrap=bootstrap, walks=walks, facc=facc,
        slices=slices, ncdim=ncdim, blob=blob,
        likelihood_mode=likelihood_mode,
        rounds_per_dispatch=rounds_per_dispatch,
        proposal_mode=proposal_mode, dtype=dtype, mesh=mesh,
        save_evaluation_history=save_evaluation_history,
        history_filename=history_filename)


def _dynamic_restore(fname, pool=None, mesh=None):
    from .dynamicsampler import DynamicSampler
    return DynamicSampler.restore(fname, pool=pool, mesh=mesh)


DynamicNestedSampler.restore = _dynamic_restore
