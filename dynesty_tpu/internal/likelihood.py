"""Batched evaluation of the user's prior transform and log-likelihood.

The reference wraps per-point Python callables and farms them over a
process pool (``utils.py:120-277``, ``pool.py``); here the batch IS the
parallelism axis: points are evaluated in wide device batches inside jitted
proposal rounds, optionally sharded over a device mesh.

Three evaluation modes:

* ``mode='jax'`` (default): the user functions are JAX-traceable and take a
  single point; we ``vmap`` them over the batch.
* ``mode='vectorized'``: the user functions are JAX-traceable and already
  accept ``(N, ndim)`` batches.
* ``mode='host'``: arbitrary Python callables (dynesty's "any callable"
  contract).  Batches are shipped to the host via ``io_callback`` and
  mapped point-by-point (optionally over a multiprocessing pool via
  ``dynesty_tpu.pool.Pool``).  Slower, but fully general.

Blobs: with ``blob=True`` the log-likelihood returns ``(logl, blob)`` where
``blob`` is any fixed-shape array pytree; kernels thread blobs alongside
``logl``.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import io_callback as _io_callback

__all__ = ["LogLikelihood", "LoglOutput"]

# process-wide cache of jitted batch evaluators, keyed on the user
# callables and bound arguments (see _batch_fn_cache_key)
_BATCH_FN_CACHE = {}


class LoglOutput:
    """Float-comparable carrier of (logl value, blob) returned by host-mode
    per-point evaluation (API parity with the reference ``LoglOutput``)."""

    def __init__(self, v, blob_flag):
        if blob_flag:
            self.val = float(v[0])
            self.blob = v[1]
        else:
            self.val = float(v)
            self.blob = None

    def __lt__(self, other):
        return self.val < float(other)

    def __gt__(self, other):
        return self.val > float(other)

    def __le__(self, other):
        return self.val <= float(other)

    def __ge__(self, other):
        return self.val >= float(other)

    def __float__(self):
        return self.val


class _ContextWrapper:
    """Print the offending input before re-raising a user-function
    exception (reference ``dynesty.py:794-810``, tested
    ``tests/test_misc.py:239-249``).  A class (not a closure) so pool
    workers can pickle it: the wrapped ``fn`` travels by reference when
    it is a module-level function."""

    __slots__ = ("fn", "name", "args", "kwargs")

    def __init__(self, fn, name, args=(), kwargs=None):
        self.fn = fn
        self.name = name
        self.args = tuple(args or ())
        self.kwargs = dict(kwargs or {})

    def __call__(self, x):
        try:
            return self.fn(x, *self.args, **self.kwargs)
        except Exception:
            import sys
            import traceback

            print(f"Exception while calling {self.name} function:",
                  file=sys.stderr)
            print(f"  params: {x}", file=sys.stderr)
            if self.args:
                print(f"  args: {self.args}", file=sys.stderr)
            if self.kwargs:
                print(f"  kwargs: {self.kwargs}", file=sys.stderr)
            print("  exception:", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            raise

    def __getstate__(self):
        return (self.fn, self.name, self.args, self.kwargs)

    def __setstate__(self, state):
        self.fn, self.name, self.args, self.kwargs = state


def _wrap_with_context(fn, name, args=(), kwargs=None):
    return _ContextWrapper(fn, name, args, kwargs)


class LogLikelihood:
    """Wraps user ``loglikelihood``/``prior_transform`` into batched device
    evaluation, with exception surfacing and blob support."""

    def __init__(self, loglikelihood, prior_transform, ndim,
                 mode="jax", blob=False, pool=None,
                 logl_args=None, logl_kwargs=None,
                 ptform_args=None, ptform_kwargs=None,
                 dtype=None, save_evaluation_history=False,
                 history_filename=None, use_pool_logl=True,
                 use_pool_ptform=True):
        if mode not in ("jax", "vectorized", "host"):
            raise ValueError(f"Unknown likelihood mode '{mode}'")
        self.mode = mode
        self.blob = blob
        self.ndim = ndim
        self.pool = pool
        # per-site pool flags (reference use_pool semantics)
        self.use_pool_logl = use_pool_logl
        self.use_pool_ptform = use_pool_ptform
        # evaluation-history recording (HDF5): exactly the lanes whose
        # evaluation is counted (kernels pass their validity mask), so
        # for completed runs history length == ncall
        self.save_evaluation_history = save_evaluation_history
        self.history_filename = history_filename
        self.save_every = 10000
        self.failed_save = False
        self._history_buffer = []
        self.evaluation_history_counter = 0
        if save_evaluation_history:
            if history_filename is None:
                raise ValueError("history_filename is required when "
                                 "save_evaluation_history=True")
            self.history_init()
        self.dtype = dtype or (jnp.float64 if jax.config.x64_enabled
                               else jnp.float32)
        self._base_logl = loglikelihood
        self._base_ptform = prior_transform
        self._logl_args = tuple(logl_args or ())
        self._logl_kwargs = dict(logl_kwargs or {})
        self._ptform_args = tuple(ptform_args or ())
        self._ptform_kwargs = dict(ptform_kwargs or {})

        # Filled lazily on the first (host-side) evaluation; needed to give
        # io_callback / jit fixed result shapes.
        self.npdim = None
        self.blob_shape_dtype = None
        self.ncall_launched = 0
        self._rebuild_callables()

    def _rebuild_callables(self):
        la, lk = self._logl_args, self._logl_kwargs
        pa, pk = self._ptform_args, self._ptform_kwargs
        base_logl, base_ptform = self._base_logl, self._base_ptform
        self._logl = _wrap_with_context(base_logl, "loglikelihood",
                                        la, lk)
        self._ptform = _wrap_with_context(base_ptform, "prior_transform",
                                          pa, pk)
        if self.mode == "host":
            self._batch_fn = None  # built after shapes are known
        else:
            # share the jitted batch evaluator across wrapper instances
            # with identical callables: re-wrapping the same user
            # functions in a fresh jit would re-trace on first call
            key = self._batch_fn_cache_key()
            fn = _BATCH_FN_CACHE.get(key) if key is not None else None
            if fn is None:
                fn = self._build_traced_batch_fn()
                if key is not None:
                    _BATCH_FN_CACHE[key] = fn
            self._batch_fn = fn

    def _batch_fn_cache_key(self):
        try:
            key = (self._base_logl, self._base_ptform, self.mode,
                   bool(self.blob), self._logl_args,
                   tuple(sorted(self._logl_kwargs.items())),
                   self._ptform_args,
                   tuple(sorted(self._ptform_kwargs.items())))
            hash(key)
            return key
        except TypeError:
            return None

    # -- traced path ------------------------------------------------------

    def _build_traced_batch_fn(self):
        ptform, logl, blob_flag = self._ptform, self._logl, self.blob

        def one_point(u):
            v = ptform(u)
            out = logl(v)
            if blob_flag:
                lv, b = out
                return v, lv, b
            return v, out, None

        # f32-accurate matmuls: TPU's default bf16 matmul precision would
        # make logl inconsistent across call sites (see kernels.f32_precision)
        from .kernels import f32_precision

        if self.mode == "vectorized":
            def batch(u):
                v = ptform(u)
                out = logl(v)
                if blob_flag:
                    lv, b = out
                    return v, lv, b
                return v, out, None
            return jax.jit(f32_precision(batch))
        return jax.jit(f32_precision(jax.vmap(one_point)))

    # -- host path --------------------------------------------------------

    def _host_eval_np(self, u):
        """Map the user callables over a numpy batch on the host,
        honoring the per-site use_pool flags."""
        u = np.asarray(u)
        has_pool = self.pool is not None
        pt_mapper = self.pool.map \
            if has_pool and getattr(self, "use_pool_ptform", True) else map
        ll_mapper = self.pool.map \
            if has_pool and getattr(self, "use_pool_logl", True) else map
        v = np.array(list(pt_mapper(self._ptform, u)))
        raw = list(ll_mapper(self._logl, v))
        self.ncall_launched += len(u)
        if self.blob:
            logl = np.array([float(r[0]) for r in raw])
            blob = np.array([r[1] for r in raw])
        else:
            logl = np.array([float(r) for r in raw])
            blob = None
        if not np.all(np.isfinite(logl) | np.isneginf(logl)):
            bad = np.nonzero(~(np.isfinite(logl) | np.isneginf(logl)))[0][0]
            raise ValueError(
                f"The log-likelihood ({logl[bad]}) at u={u[bad]} "
                f"v={v[bad]} is invalid (nan or +inf).")
        return v, logl, blob

    def _ensure_host_callback(self, batch_size):
        npdim = self.npdim
        dtype = self.dtype
        shapes = [
            jax.ShapeDtypeStruct((batch_size, npdim), dtype),
            jax.ShapeDtypeStruct((batch_size,), dtype),
        ]
        if self.blob:
            bs, bd = self.blob_shape_dtype
            shapes.append(jax.ShapeDtypeStruct((batch_size,) + bs, bd))

        def host_fn(u, mask):
            # masked-out lanes never reach the user callable, so the
            # invocation count matches the kernels' logical ncall exactly
            # (reference parity: tests/test_misc.py:611-640)
            u = np.asarray(u)
            mask = np.asarray(mask, dtype=bool)
            v = np.zeros((len(u), npdim))
            logl = np.full(len(u), -np.inf)
            blob = None
            if self.blob:
                bs, bd = self.blob_shape_dtype
                blob = np.zeros((len(u),) + bs, dtype=bd)
            if mask.any():
                vm, loglm, blobm = self._host_eval_np(u[mask])
                v[mask] = vm
                logl[mask] = loglm
                if self.blob:
                    blob[mask] = blobm
            out = [np.asarray(v, dtype), np.asarray(logl, dtype)]
            if self.blob:
                out.append(np.asarray(blob, self.blob_shape_dtype[1]))
            return tuple(out)

        def batch(u, mask):
            out = jax.experimental.io_callback(host_fn, tuple(shapes), u,
                                               mask, ordered=False)
            if self.blob:
                return out[0], out[1], out[2]
            return out[0], out[1], None

        return batch

    # -- public API -------------------------------------------------------

    def eval_host(self, u):
        """Evaluate a numpy batch on the host (used during live point
        initialization, before any jit compilation).  Returns numpy
        ``(v, logl, blob_or_None)`` and learns output shapes."""
        u = np.asarray(u, dtype=np.float64)
        if self.mode == "host":
            v, logl, blob = self._host_eval_np(u)
        else:
            fn = self._batch_fn
            v, logl, blob = fn(jnp.asarray(u, dtype=self.dtype))
            v = np.asarray(v)
            logl = np.asarray(logl, dtype=np.float64)
            blob = np.asarray(blob) if blob is not None else None
            bad = ~(np.isfinite(logl) | np.isneginf(logl))
            if bad.any():
                i = np.nonzero(bad)[0][0]
                raise ValueError(
                    f"The log-likelihood ({logl[i]}) at u={u[i]} "
                    f"v={v[i]} is invalid (nan or +inf).")
        if self.npdim is None:
            self.npdim = v.shape[1]
            if self.blob and blob is not None:
                self.blob_shape_dtype = (blob.shape[1:], blob.dtype)
        if self.save_evaluation_history:
            self.append_evaluation_history(u, v, logl)
        return v, np.asarray(logl, dtype=np.float64), blob

    def trace_cache_key(self):
        """Hashable key identifying the traced batch computation, or
        ``None`` when traces closing over this instance cannot be shared
        across instances (host-mode io_callbacks and evaluation-history
        recording are instance-bound side effects; unhashable bound
        args/kwargs get baked into the trace as constants)."""
        if self.mode == "host" or self.save_evaluation_history:
            return None
        blob_sd = self.blob_shape_dtype
        if blob_sd is not None:
            blob_sd = (tuple(blob_sd[0]), str(blob_sd[1]))
        try:
            key = (self._base_logl, self._base_ptform, self.mode,
                   bool(self.blob), self.ndim, self.npdim, blob_sd,
                   self.dtype, self._logl_args,
                   tuple(sorted(self._logl_kwargs.items())),
                   self._ptform_args,
                   tuple(sorted(self._ptform_kwargs.items())))
            hash(key)
            return key
        except TypeError:
            return None

    def batch_eval(self, u, mask=None):
        """Traced batched evaluation for use inside jitted kernels.

        ``u`` is (N, ndim) and must already be inside the support of the
        prior transform (kernels clamp to [0, 1] before calling).  Returns
        ``(v (N, npdim), logl (N,), blob pytree or None)``.

        ``mask`` marks the lanes whose result will actually be used.  In
        host mode masked-out lanes are never handed to the user callable
        (exact invocation accounting); traced modes evaluate the full
        batch regardless — the lanes are free on vector hardware.
        """
        if self.mode == "host":
            if self.npdim is None:
                raise RuntimeError("Host-mode likelihood must be probed "
                                   "with eval_host before tracing.")
            if mask is None:
                mask = jnp.ones(u.shape[0], dtype=bool)
            v, logl, blob = self._ensure_host_callback(u.shape[0])(u, mask)
        else:
            v, logl, blob = self._batch_fn(u)
            v = jnp.asarray(v, self.dtype)
            logl = jnp.asarray(logl, self.dtype)
        if self.save_evaluation_history:
            rec_mask = mask if mask is not None else \
                jnp.ones(u.shape[0], dtype=bool)
            _io_callback(self._record_batch, None, u, v, logl, rec_mask,
                         ordered=False)
        return v, logl, blob

    # -- evaluation history (HDF5) ----------------------------------------

    def _record_batch(self, u, v, logl, mask=None):
        u, v, logl = np.asarray(u), np.asarray(v), np.asarray(logl)
        if mask is not None:
            # record exactly the lanes whose evaluation counts: in host
            # mode these are the ones the user callable actually saw, so
            # history length == ncall (reference tests/test_misc.py:729-871)
            mask = np.asarray(mask, dtype=bool)
            u, v, logl = u[mask], v[mask], logl[mask]
        if len(logl):
            self.append_evaluation_history(u, v, logl)

    def history_init(self):
        """Create (truncate) the HDF5 history file; datasets are created
        at the first flush once output shapes are known."""
        import h5py

        self.evaluation_history_counter = 0
        with h5py.File(self.history_filename, mode="w"):
            pass

    def append_evaluation_history(self, u, v, logl):
        """Buffer a batch of evaluations; flush when the buffer is
        large."""
        if not self.save_evaluation_history:
            return
        self._history_buffer.append(
            (np.atleast_2d(u), np.atleast_2d(v), np.atleast_1d(logl)))
        if sum(len(b[2]) for b in self._history_buffer) > self.save_every:
            self.history_save()

    def history_save(self):
        """Flush the buffered evaluations to the HDF5 file."""
        if self.failed_save or not self.save_evaluation_history or                 not self._history_buffer:
            return
        import warnings

        import h5py

        try:
            u = np.concatenate([b[0] for b in self._history_buffer])
            v = np.concatenate([b[1] for b in self._history_buffer])
            logl = np.concatenate([b[2] for b in self._history_buffer])
            n = len(logl)
            with h5py.File(self.history_filename, mode="a") as fp:
                for name, arr in (("evaluation_u", u),
                                  ("evaluation_v", v),
                                  ("evaluation_logl", logl)):
                    if name not in fp:
                        fp.create_dataset(
                            name, (0,) + arr.shape[1:],
                            maxshape=(None,) + arr.shape[1:])
                    ds = fp[name]
                    ds.resize(self.evaluation_history_counter + n, axis=0)
                    ds[-n:] = arr
            self._history_buffer = []
            self.evaluation_history_counter += n
        except OSError:
            warnings.warn("Failed to save the evaluation history; will "
                          "not try again.")
            self.failed_save = True

    def finalize_history(self):
        self.history_save()

    # -- pickling (drop the pool; re-attached on restore) ------------------

    def __getstate__(self):
        state = self.__dict__.copy()
        state["pool"] = None
        state["save_evaluation_history"] = False  # disabled after restore
        state["_history_buffer"] = []
        # closures over user callables are rebuilt on unpickle
        for k in ("_logl", "_ptform", "_batch_fn"):
            state.pop(k, None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._rebuild_callables()
