"""API-compatible stand-in for ``dynesty.pool.Pool`` (reference
``pool.py:51-184``).

On TPU the proposal batch width (``queue_size``) is the parallelism axis,
not a process pool; this Pool exists so reference-style code keeps
working:

* in ``likelihood_mode='host'`` it really is a multiprocessing pool with
  the reference's worker-side function cache (user callables are shipped
  once at worker startup, not pickled per call);
* in traced modes it only contributes its ``njobs`` as the default
  proposal batch width.
"""

import multiprocessing as mp

__all__ = ["Pool"]


class FunctionCache:
    """Singleton per worker holding the user callables."""

    loglike = None
    prior_transform = None
    logl_args = ()
    logl_kwargs = {}
    ptform_args = ()
    ptform_kwargs = {}


def initializer(loglike, prior_transform, logl_args, logl_kwargs,
                ptform_args, ptform_kwargs):
    FunctionCache.loglike = loglike
    FunctionCache.prior_transform = prior_transform
    FunctionCache.logl_args = logl_args
    FunctionCache.logl_kwargs = logl_kwargs
    FunctionCache.ptform_args = ptform_args
    FunctionCache.ptform_kwargs = ptform_kwargs


def loglike_cache(x, *args, **kwargs):
    """Worker-side likelihood call through the cache."""
    return FunctionCache.loglike(x, *FunctionCache.logl_args, *args,
                                 **FunctionCache.logl_kwargs, **kwargs)


def prior_transform_cache(x, *args, **kwargs):
    """Worker-side prior transform call through the cache."""
    return FunctionCache.prior_transform(x, *FunctionCache.ptform_args,
                                         *args,
                                         **FunctionCache.ptform_kwargs,
                                         **kwargs)


class Pool:
    """Context-managed spawn pool with cached user functions.

    Parameters mirror the reference: ``njobs``, the two callables, and
    optional static args/kwargs bound to them.
    """

    def __init__(self, njobs, loglike, prior_transform, logl_args=None,
                 logl_kwargs=None, ptform_args=None, ptform_kwargs=None):
        self.njobs = njobs
        self.size = njobs
        self.loglike_0 = loglike
        self.prior_transform_0 = prior_transform
        self.logl_args = logl_args or ()
        self.logl_kwargs = logl_kwargs or {}
        self.ptform_args = ptform_args or ()
        self.ptform_kwargs = ptform_kwargs or {}
        self.pool = None
        self.loglike = loglike_cache
        self.prior_transform = prior_transform_cache

    def __enter__(self):
        ctx = mp.get_context("spawn")
        initargs = (self.loglike_0, self.prior_transform_0, self.logl_args,
                    self.logl_kwargs, self.ptform_args, self.ptform_kwargs)
        self.pool = ctx.Pool(self.njobs, initializer=initializer,
                             initargs=initargs)
        # warm the local process cache too, so map fallbacks work
        initializer(*initargs)
        return self

    def map(self, func, iterable):
        """Chunked map over the workers (ordered)."""
        if self.pool is None:
            return list(map(func, iterable))
        return self.pool.map(func, iterable, chunksize=1)

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self.pool is not None:
            try:
                self.pool.terminate()
                self.pool.join()
            finally:
                self.pool = None
        return False

    def close(self):
        if self.pool is not None:
            self.pool.close()

    def join(self):
        if self.pool is not None:
            self.pool.join()
