"""Jitted batched proposal rounds: the TPU replacement for the reference's
process-pool proposal queue (``sampler.py:676-717``).

One "round" draws ``Q`` independent constrained proposals at a fixed
likelihood threshold ``loglstar``:

* ``unif``  — uniform rejection sampling from the bounding distribution
  (reference ``internal_samplers.py:243-340``), restructured so successes
  accumulate into output slots while a ``lax.while_loop`` keeps proposing
  whole waves of ``Q`` candidates (big batched likelihood calls).
* ``rwalk`` — exactly ``walks`` Metropolis-style steps per lane
  (``internal_samplers.py:866-986``), a ``lax.scan`` over steps with every
  step evaluating the likelihood for all ``Q`` lanes at once.
* ``slice``/``rslice`` — Neal (2003) stepping-out/doubling plus shrinkage
  (``internal_samplers.py:1075-1206``), with all data-dependent loops as
  ``lax.while_loop`` over active-lane masks.

Everything here is shape-static: ``Q``, ``walks``, ``slices``, the bound's
padded ellipsoid count, and the periodic/reflective masks are compile-time
constants; scalars (``loglstar``, ``scale``) and the bound arrays are
runtime inputs, so one compilation serves an entire run.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.geometry import (apply_reflect_jax, randsphere_batch,
                            unitcheck_batch)

__all__ = [
    "make_unif_round", "make_rwalk_round", "make_slice_round",
    "pad_ellipsoids",
]

_NEG_INF = -jnp.inf


def f32_precision(fn):
    """Trace ``fn`` with float32-accurate matmul precision.

    TPUs default to bfloat16 matmul inputs, which perturbs log-likelihood
    values by up to ~0.4% of the summed terms — and, worse, perturbs them
    DIFFERENTLY per call site (XLA fusion-dependent rounding), so a point
    accepted against a threshold in one kernel can re-evaluate below it
    in another.  Nested sampling only needs the likelihood to be a
    consistent function of position, so every kernel that evaluates user
    code or bound geometry is traced at float32 precision (bf16x3 passes
    on the MXU; negligible cost at these sizes)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped


def _tree_where(mask, a, b):
    """Select ``a`` where mask else ``b`` over matching pytrees; ``mask``
    is (Q,) and leaves are (Q, ...)."""
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)
    return jax.tree.map(sel, a, b)


def _wrap_boundaries(u, periodic_mask, reflective_mask):
    """Apply periodic wrapping / reflection on the marked dimensions."""
    if periodic_mask is not None:
        u = jnp.where(periodic_mask, jnp.mod(u, 1.0), u)
    if reflective_mask is not None:
        u = jnp.where(reflective_mask, apply_reflect_jax(u), u)
    return u


def _masked_eval(like, u, incube):
    """Evaluate the batched likelihood at ``u`` (clamped into the cube for
    safety) and mask out-of-cube lanes to -inf.  Outputs are cast to the
    kernel's dtype (the wrapper may run at a different precision).  In
    host mode the mask keeps dead lanes away from the user callable."""
    uc = jnp.clip(u, 0.0, 1.0)
    v, logl, blob = like.batch_eval(uc, mask=incube)
    logl = jnp.where(incube, logl, _NEG_INF).astype(u.dtype)
    return v.astype(u.dtype), logl, blob


def _zeros_like_batch(like, q, ndim, dtype):
    """Empty result buffers (u, v, logl, blob) for Q lanes."""
    u = jnp.full((q, ndim), 0.5, dtype=dtype)
    v = jnp.zeros((q, like.npdim), dtype=dtype)
    logl = jnp.full((q,), _NEG_INF, dtype=dtype)
    if like.blob and like.blob_shape_dtype is not None:
        bs, bd = like.blob_shape_dtype
        blob = jnp.zeros((q,) + tuple(bs), dtype=bd)
    else:
        blob = None
    return u, v, logl, blob


def pack_columns(q, dtype, *cols):
    """Pack per-lane outputs into ONE (q, W) array so a round costs a
    single device->host transfer (the axon relay pays a large fixed cost
    per fetched buffer).  Scalars are broadcast to length-q columns."""
    parts = []
    for c in cols:
        c = jnp.asarray(c, dtype)
        if c.ndim == 0:
            c = jnp.broadcast_to(c, (q,))
        if c.ndim == 1:
            c = c[:, None]
        parts.append(c)
    return jnp.concatenate(parts, axis=1)


# ==========================================================================
# bound sampling (device side)


def pad_ellipsoids(ctrs, axes, ams, logvols, min_pad=1):
    """Pad stacked ellipsoid arrays to a power-of-two count (with a
    validity mask) so the jitted round recompiles only O(log M) times as
    the decomposition grows."""
    m = len(logvols)
    mpad = max(min_pad, 1 << (m - 1).bit_length())
    ndim = ctrs.shape[1]

    def pad(arr, fill=0.0):
        out = np.full((mpad,) + arr.shape[1:], fill, dtype=np.float64)
        out[:m] = arr
        return out

    # identity precision in the padding slots avoids nan in masked einsums
    ams_pad = pad(ams)
    ams_pad[m:] = np.eye(ndim)
    return {
        "ctrs": pad(ctrs),
        "axes": pad(axes),
        "ams": ams_pad,
        "logvols": pad(logvols, fill=-np.inf),
        "mask": np.arange(mpad) < m,
    }


def _sample_ellipsoid_union(key, arrays, q, ncdim, dtype):
    """Draw ``q`` candidates from a union of ellipsoids: volume-weighted
    ellipsoid choice, ball sample mapped through its axes, 1/q overlap
    rejection (with the reference's numerical q==0 rescue).  Returns
    (points (q, ncdim), valid (q,))."""
    ctrs = arrays["ctrs"].astype(dtype)
    axes = arrays["axes"].astype(dtype)
    ams = arrays["ams"].astype(dtype)
    logvols = arrays["logvols"]
    mask = arrays["mask"]

    kc, kb, ka = jax.random.split(key, 3)
    logp = jnp.where(mask, logvols, -jnp.inf)
    idx = jax.random.categorical(kc, logp, shape=(q,))
    ball = randsphere_batch(kb, (q,), ncdim, dtype=dtype)
    x = ctrs[idx] + jnp.einsum("qij,qj->qi", axes[idx], ball)

    # membership count over all (masked) ellipsoids
    d = x[:, None, :] - ctrs[None, :, :]
    sq = jnp.einsum("qmi,mij,qmj->qm", d, ams, d)
    sq = jnp.where(mask[None, :], sq, jnp.inf)
    nin = jnp.sum(sq < 1.0, axis=1)
    nin_loose = jnp.sum(sq <= 1.0 + 1e-3, axis=1)
    nin = jnp.where(nin > 0, nin, nin_loose)  # round-off rescue
    accept = jax.random.uniform(ka, (q,), dtype=dtype) < \
        1.0 / jnp.maximum(nin, 1)
    valid = accept & (nin > 0)
    return x, valid


def _sample_friends_union(key, arrays, q, ncdim, dtype, ftype):
    """Draw ``q`` candidates from a union of identical balls/cubes centered
    at ``arrays['ctrs']`` (the live points), with 1/q overlap rejection."""
    ctrs = arrays["ctrs"].astype(dtype)
    axes = arrays["axes"].astype(dtype)
    axes_inv = arrays["axes_inv"].astype(dtype)
    nctrs = ctrs.shape[0]

    kc, kb, ka = jax.random.split(key, 3)
    idx = jax.random.randint(kc, (q,), 0, nctrs)
    if ftype == "balls":
        offset = randsphere_batch(kb, (q,), ncdim, dtype=dtype)
    else:
        offset = jax.random.uniform(kb, (q, ncdim), dtype=dtype) * 2.0 - 1.0
    x = ctrs[idx] + offset @ axes  # axes is symmetric (sqrtm)

    dt = jnp.einsum("qmi,ij->qmj", ctrs[None, :, :] - x[:, None, :],
                    axes_inv)
    if ftype == "balls":
        dist = jnp.linalg.norm(dt, axis=-1)
    else:
        dist = jnp.abs(dt).max(axis=-1)
    nin = jnp.sum(dist <= 1.0, axis=1)
    nin = jnp.maximum(nin, 1)  # the chosen center always contains x
    accept = jax.random.uniform(ka, (q,), dtype=dtype) < 1.0 / nin
    return x, accept


def make_ellipsoid_refit(ncdim, dtype=jnp.float64):
    """Traceable one-step refit of a padded ellipsoid stack from the
    current live points, enabling CHAINED uniform rounds: bound
    freshness no longer requires a host round trip, so several
    propose+consume rounds can run per device dispatch (the host's
    full BIC resplit + bootstrap still runs at dispatch boundaries).

    The refit mirrors the host fit (``bounding.py:bounding_ellipsoid``):
    assign each live point to its nearest ellipsoid (Mahalanobis under
    the previous fit), recompute the member mean/MLE-covariance per
    ellipsoid, inflate so the worst member sits at distance
    ``1 - 1e-3``, then apply ``arrays['expand']`` — the host's latest
    bootstrap x enlarge linear factor (staleness of that calibration is
    one dispatch, same as before).  Slots with fewer than ``ncdim + 1``
    members (or a failed factorization) keep their previous fit, so the
    all-members-contained invariant always holds.

    Returns ``refit(u_live, arrays) -> arrays`` (same padded schema).
    """
    d = ncdim
    eps_contain = 1e-3
    # d-ball log-volume prefactor: keeps device log-volumes on the same
    # scale as host-fit values (mixed when a slot keeps its previous fit)
    logvol_pref = (d / 2.0) * math.log(math.pi) - math.lgamma(d / 2.0 + 1.0)

    def refit(u, arrays):
        ctrs0 = arrays["ctrs"].astype(dtype)
        axes0 = arrays["axes"].astype(dtype)
        ams0 = arrays["ams"].astype(dtype)
        logvols0 = arrays["logvols"].astype(dtype)
        mask = arrays["mask"]
        expand = arrays.get("expand")
        expand = jnp.asarray(1.0, dtype) if expand is None \
            else expand.astype(dtype)
        m = ctrs0.shape[0]

        diff = u[:, None, :] - ctrs0[None, :, :]
        d2 = jnp.einsum("nmi,mij,nmj->nm", diff, ams0, diff)
        d2 = jnp.where(mask[None, :], d2, jnp.inf)
        idx = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(idx, m, dtype=dtype)
        counts = onehot.sum(axis=0)
        safe = jnp.maximum(counts, 1.0)
        ctr = (onehot.T @ u) / safe[:, None]
        cent = u[:, None, :] - ctr[None, :, :]
        cov = jnp.einsum("nm,nmi,nmj->mij", onehot, cent,
                         cent) / safe[:, None, None]
        # conditioning floor keeps degenerate clusters factorizable
        tr = jnp.trace(cov, axis1=1, axis2=2) / d
        eye = jnp.eye(d, dtype=dtype)
        cov = cov + (1e-10 * jnp.maximum(tr, 1e-30))[:, None, None] * eye
        chol = jnp.linalg.cholesky(cov)
        ok = jnp.all(jnp.isfinite(chol.reshape(m, -1)), axis=1) & \
            (counts >= d + 1)
        chol_safe = jnp.where(ok[:, None, None], chol, eye[None])
        linv = jax.scipy.linalg.solve_triangular(
            chol_safe, jnp.broadcast_to(eye, (m, d, d)), lower=True)
        am = jnp.einsum("mki,mkj->mij", linv, linv)  # cov^-1

        # inflate to contain every member, then the host's calibration
        dd = u - ctr[idx]
        d2o = jnp.einsum("ni,nij,nj->n", dd, am[idx], dd)
        fmax = jnp.zeros((m,), dtype).at[idx].max(d2o, mode="drop")
        f = jnp.sqrt(jnp.maximum(fmax, 1e-30) / (1.0 - eps_contain))
        f = f * expand
        axes = chol_safe * f[:, None, None]
        am = am / (f ** 2)[:, None, None]
        logvol = jnp.log(jnp.abs(jnp.diagonal(
            chol_safe, axis1=1, axis2=2))).sum(axis=1) + \
            d * jnp.log(f) + logvol_pref

        keep = mask & ok
        k1, k2, k3 = (keep[:, None], keep[:, None, None],
                      keep[:, None, None])
        return {
            "ctrs": jnp.where(k1, ctr, ctrs0),
            "axes": jnp.where(k2, axes, axes0),
            "ams": jnp.where(k3, am, ams0),
            "logvols": jnp.where(keep, logvol, logvols0),
            "mask": mask,
        }

    return refit


# ==========================================================================
# uniform-in-bound kernel


def make_unif_round(like, *, ndim, ncdim, q, bound_kind, nonbounded=None,
                    dtype=jnp.float64, max_waves=100000,
                    host_sampler=None, constrain=None):
    """Build the jitted uniform-sampling round.

    Returns ``fn(key, loglstar, bound_arrays) -> dict`` with per-slot
    ``u, v, logl, blob``, plus scalar ``nc`` (log-likelihood evaluations of
    in-bound candidates), ``n_proposals`` (total candidates drawn) and
    ``n_filled``.
    """
    if nonbounded is not None:
        nonbounded = np.asarray(nonbounded, dtype=bool)
        nb_cluster = jnp.asarray(nonbounded[:ncdim])
    else:
        nb_cluster = None
    n_extra = ndim - ncdim

    def draw_cluster(key, arrays):
        if bound_kind == "cube":
            u = jax.random.uniform(key, (q, ncdim), dtype=dtype)
            return u, jnp.ones((q,), dtype=bool)
        if bound_kind == "ellipsoids":
            return _sample_ellipsoid_union(key, arrays, q, ncdim, dtype)
        if bound_kind == "custom":
            # user-defined Bound: draw on the host (ordered so the host
            # RNG stream stays deterministic)
            from jax.experimental import io_callback

            u = io_callback(
                host_sampler,
                jax.ShapeDtypeStruct((q, ncdim), dtype), ordered=True)
            return u, jnp.ones((q,), dtype=bool)
        return _sample_friends_union(key, arrays, q, ncdim, dtype,
                                     bound_kind)

    # A pathological bound misfit surfaces as a host-side RuntimeWarning
    # after every dispatch (samplers._warn_unif_inefficiency, matching the
    # reference's 10000-fruitless-tries warning) rather than an on-device
    # print: the axon TPU relay does not support host callbacks inside
    # compiled programs, and max_waves bounds any single dispatch.

    def round_fn(key, loglstar, arrays):
        # optional per-round call budget (the host bound-refit cadence,
        # fused.py pass_nc_budget): once the round's cumulative calls
        # cross it, stop filling and return the round PARTIALLY filled
        # (unfilled slots carry logl=-inf, consumed by the general scan
        # as non-accepts).  This caps the exposure to a stale/bloated
        # bound at ~one refit interval of calls — the reference's
        # per-iteration update check gives the same bound (its queue
        # fill also overshoots by at most the in-flight wave).
        nc_budget = arrays.get("nc_budget") \
            if isinstance(arrays, dict) else None
        u0, v0, logl0, blob0 = _zeros_like_batch(like, q, ndim, dtype)
        nc0 = jnp.zeros((q,), jnp.int32)
        if constrain is not None:
            # pin the lane axis to the mesh so the rejection waves (and
            # the batched likelihood inside them) run fully partitioned
            u0, v0, logl0, nc0 = (constrain(u0), constrain(v0),
                                  constrain(logl0), constrain(nc0))
            blob0 = jax.tree.map(constrain, blob0) \
                if blob0 is not None else None

        def cond(carry):
            (_, n_filled, waves, nc, _, _, _) = carry[:7]
            ok = (n_filled < q) & (waves < max_waves)
            if nc_budget is not None:
                # always run wave 1 (guaranteed progress per dispatch)
                ok = ok & ((nc.astype(nc_budget.dtype) < nc_budget)
                           | (waves == 0))
            return ok

        def body(carry):
            key, n_filled, waves, nc, n_prop, pending, bufs = carry
            key, kd, ke = jax.random.split(key, 3)
            uc, valid = draw_cluster(kd, arrays)
            if n_extra > 0:
                u_extra = jax.random.uniform(ke, (q, n_extra), dtype=dtype)
                u_prop = jnp.concatenate([uc, u_extra], axis=1)
            else:
                u_prop = uc
            # Adaptive wave width: once an acceptance estimate exists
            # (n_filled/n_prop from earlier waves), only the first
            # ~need/eff * 1.25 + 4 lanes of this wave count as launched
            # proposals; the rest are masked out BEFORE their outcome is
            # seen (no acceptance bias) and are neither billed nor, in
            # host mode, evaluated.  Without this, the final wave of
            # every fill bills all q lanes even when a handful of slots
            # remain: at ~75% acceptance that rounds 1.3 calls/point up
            # to a full 2.0.  Wave 1 always runs full width.
            need = (q - n_filled).astype(jnp.float32)
            # successes per proposed LANE (folds in draw-validity
            # rejection, e.g. the ellipsoid-union overlap correction,
            # not just the likelihood-threshold acceptance)
            eff = n_filled.astype(jnp.float32) / jnp.maximum(
                n_prop.astype(jnp.float32), 1.0)
            est = jnp.ceil(1.25 * need / jnp.maximum(eff, 1e-6)) + 4.0
            width = jnp.where((n_filled > 0) & (n_prop > 0),
                              jnp.minimum(est, float(q)),
                              float(q)).astype(jnp.int32)
            lane_ok = jnp.arange(q, dtype=jnp.int32) < width
            valid = valid & lane_ok
            if constrain is not None:
                u_prop, valid = constrain(u_prop), constrain(valid)
            incube = unitcheck_batch(uc, nb_cluster)
            valid = valid & incube
            v_prop, logl_prop, blob_prop = _masked_eval(like, u_prop, valid)
            success = valid & (logl_prop > loglstar)

            # pack the successes into the next free output slots
            rank = jnp.cumsum(success) - 1  # 0-based rank among successes
            dest = n_filled + rank
            dest = jnp.where(success & (dest < q), dest, q)
            bu, bv, bl, bnc, bb = bufs
            bu = bu.at[dest].set(u_prop, mode="drop")
            bv = bv.at[dest].set(v_prop, mode="drop")
            bl = bl.at[dest].set(logl_prop, mode="drop")
            if bb is not None:
                bb = jax.tree.map(
                    lambda buf, val: buf.at[dest].set(val, mode="drop"),
                    bb, blob_prop)
            n_new = jnp.minimum(jnp.sum(success).astype(jnp.int32),
                                q - n_filled)
            # exact per-slot ncall attribution: the evaluations since the
            # last successful wave are split over this wave's placed
            # successes (remainder to the lowest ranks), so per-slot nc
            # sums exactly to the round total
            nc_wave = jnp.sum(valid).astype(jnp.int32)
            avail = pending + nc_wave
            share = avail // jnp.maximum(n_new, 1)
            rem = avail - share * jnp.maximum(n_new, 1)
            slot_nc = share + (rank < rem)
            bnc = bnc.at[dest].set(slot_nc, mode="drop")
            pending = jnp.where(n_new > 0, 0, avail)
            return (key, n_filled + n_new, waves + 1, nc + nc_wave,
                    n_prop + width, pending, (bu, bv, bl, bnc, bb))

        init = (key, jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.int32(0), (u0, v0, logl0, nc0, blob0))
        key, n_filled, waves, nc, n_prop, pending, bufs = \
            jax.lax.while_loop(cond, body, init)
        bu, bv, bl, bnc, bb = bufs
        # a failed fill (max_waves hit) leaves unflushed evaluations:
        # charge them to slot 0 so sum(per-slot nc) == total nc always
        bnc = bnc.at[0].add(pending)
        # partial fill (budget/max_waves): unfilled slots must read as
        # rejected proposals downstream, whatever the buffer zeros mean
        # for the problem's logl range
        bl = jnp.where(jnp.arange(q) < n_filled, bl,
                       jnp.asarray(-jnp.inf, bl.dtype))
        packed = pack_columns(q, dtype, bu, bv, bl, bnc, nc, n_prop,
                              n_filled)
        return packed, bb

    return jax.jit(f32_precision(round_fn))


# ==========================================================================
# random-walk kernel


def make_rwalk_round(like, *, ndim, ncdim, q, walks, nonbounded=None,
                     periodic=None, reflective=None, dtype=jnp.float64,
                     constrain=None):
    npdim = like.npdim
    """Build the jitted random-walk round: each of the ``q`` lanes performs
    exactly ``walks`` proposals inside its scaled ellipsoid (axes per
    lane), accepting moves with ``logl > loglstar``.

    ``fn(key, starts, axes, scale, loglstar) -> dict`` with final per-lane
    ``u, v, logl, blob`` plus ``n_accept``/``n_reject`` tallies.  Lanes
    that never accept keep their start point (whose v/logl are passed in,
    so no re-evaluation is needed).
    """
    nb = jnp.asarray(np.asarray(nonbounded, dtype=bool)) \
        if nonbounded is not None else None
    pm = _mask_from_indices(periodic, ndim)
    rm = _mask_from_indices(reflective, ndim)
    n_extra = ndim - ncdim

    def round_fn(key, packed_in, start_blob, scale, loglstar):
        if constrain is not None:
            # lane-partition the walk state: each chip owns q/n lanes of
            # the whole walks-step chain (likelihood included)
            packed_in = constrain(packed_in)
            start_blob = jax.tree.map(constrain, start_blob) \
                if start_blob is not None else None
        start_u = packed_in[:, :ndim]
        start_v = packed_in[:, ndim:ndim + npdim]
        start_logl = packed_in[:, ndim + npdim]
        axes = packed_in[:, ndim + npdim + 1:].reshape(q, ncdim, ncdim)

        def step(carry, step_key):
            u, v, logl, blob, n_acc, n_rej = carry
            kd, ke = jax.random.split(step_key)
            dr = randsphere_batch(kd, (q,), ncdim, dtype=dtype)
            du = jnp.einsum("qij,qj->qi", axes.astype(dtype), dr) * scale
            u_cl = u[:, :ncdim] + du
            if n_extra > 0:
                u_ex = jax.random.uniform(ke, (q, n_extra), dtype=dtype)
                u_prop = jnp.concatenate([u_cl, u_ex], axis=1)
            else:
                u_prop = u_cl
            u_prop = _wrap_boundaries(u_prop, pm, rm)
            ok = unitcheck_batch(u_prop, nb)
            v_prop, logl_prop, blob_prop = _masked_eval(like, u_prop, ok)
            accept = ok & (logl_prop > loglstar)
            u = jnp.where(accept[:, None], u_prop, u)
            v = jnp.where(accept[:, None], v_prop, v)
            logl = jnp.where(accept, logl_prop, logl)
            if blob is not None:
                blob = _tree_where(accept, blob_prop, blob)
            return (u, v, logl, blob, n_acc + accept, n_rej + ~accept), None

        n0 = jnp.zeros((q,), dtype=jnp.int32)
        carry0 = (start_u.astype(dtype), start_v.astype(dtype),
                  start_logl.astype(dtype), start_blob, n0, n0)
        keys = jax.random.split(key, walks)
        (u, v, logl, blob, n_acc, n_rej), _ = jax.lax.scan(
            step, carry0, keys)
        packed = pack_columns(q, dtype, u, v, logl, n_acc, n_rej)
        return packed, blob

    return jax.jit(f32_precision(round_fn))


def _mask_from_indices(indices, ndim):
    if indices is None:
        return None
    mask = np.zeros(ndim, dtype=bool)
    mask[np.asarray(indices)] = True
    return jnp.asarray(mask)


# ==========================================================================
# slice kernels


def make_slice_round(like, *, ndim, q, slices, kind, nonperiodic=None,
                     doubling=False, dtype=jnp.float64,
                     max_shrink_iters=10000, constrain=None):
    """Build the jitted slice-sampling round.

    ``kind='rslice'``: ``slices`` slice updates per lane along random
    (axes-transformed, scale-multiplied) directions.
    ``kind='slice'``: ``slices`` Gibbs passes over all ``ndim`` principal
    axes in a per-lane shuffled order.

    ``fn(key, starts, axes, scale, loglstar) -> dict`` with final per-lane
    ``u, v, logl, blob``, per-lane ``nc`` (likelihood evaluations, counting
    out-of-cube probes like the reference), ``n_expand``/``n_contract``
    tallies and an ``expansion_warning`` flag (interval expanded > 1000
    times with stepping-out; the host then switches to doubling mode).
    """
    assert kind in ("slice", "rslice")
    npdim = like.npdim
    nb = jnp.asarray(np.asarray(nonperiodic, dtype=bool)) \
        if nonperiodic is not None else None
    maxlen = math.sqrt(ndim) / 2.0
    n_steps = slices * ndim if kind == "slice" else slices

    def feval(u0, x, direction):
        """F(x) along the lane directions; counts handled by callers."""
        u = u0 + x[:, None] * direction
        incube = unitcheck_batch(u, nb)
        v, logl, blob = _masked_eval(like, u, incube)
        return u, v, logl, blob

    def doubling_accept(x1, u0, direction, loglstar, L, R, fL, fR):
        """Batched Neal (2003) algorithm 6 acceptance test; returns
        (accept (q,), nc_increment (q,))."""
        def cond(c):
            active = c[0]
            return jnp.any(active)

        def body(c):
            active, lhat, rhat, f_lhat, f_rhat, dflag, reject, nc = c
            mid = 0.5 * (lhat + rhat)
            dflag = dflag | (((0.0 < mid) & (mid <= x1)) |
                             ((x1 < mid) & (mid <= 0.0)))
            go_right = x1 < mid  # shrink the right side toward x1
            _, _, logl_mid, _ = feval(u0, mid, direction)
            nc = nc + active
            f_rhat = jnp.where(active & go_right, logl_mid, f_rhat)
            rhat = jnp.where(active & go_right, mid, rhat)
            f_lhat = jnp.where(active & ~go_right, logl_mid, f_lhat)
            lhat = jnp.where(active & ~go_right, mid, lhat)
            newly_rejected = active & dflag & (loglstar >= f_lhat) & \
                (loglstar >= f_rhat)
            reject = reject | newly_rejected
            active = active & ~newly_rejected & (rhat - lhat > 1.1)
            return (active, lhat, rhat, f_lhat, f_rhat, dflag, reject, nc)

        q_ = x1.shape[0]
        init = (jnp.ones((q_,), bool) & (R - L > 1.1), L, R, fL, fR,
                jnp.zeros((q_,), bool), jnp.zeros((q_,), bool),
                jnp.zeros((q_,), jnp.int32))
        out = jax.lax.while_loop(cond, body, init)
        return ~out[6], out[7]

    def one_slice_step(key, u0, v0, logl0, blob0, direction, loglstar):
        """One slice update for all lanes along per-lane ``direction``."""
        q_ = u0.shape[0]
        dirlen = jnp.linalg.norm(direction, axis=1)
        dirnorm = jnp.where(dirlen > maxlen, dirlen / maxlen, 1.0)
        direction = direction / dirnorm[:, None]

        k0, k1, k2 = jax.random.split(key, 3)
        r0 = jax.random.uniform(k0, (q_,), dtype=dtype)
        left = -r0
        right = 1.0 - r0
        _, _, logl_l, _ = feval(u0, left, direction)
        _, _, logl_r, _ = feval(u0, right, direction)
        nc = jnp.full((q_,), 2, dtype=jnp.int32)
        n_expand = jnp.zeros((q_,), jnp.int32)
        expansion_warning = jnp.zeros((), bool)

        if not doubling:
            def expand(side_sign, x, logl_x, nc, n_expand):
                def cond(c):
                    return jnp.any(c[0])

                def body(c):
                    active, x, logl_x, nc, n_exp = c
                    x_new = jnp.where(active, x + side_sign, x)
                    _, _, logl_new, _ = feval(u0, x_new, direction)
                    logl_x = jnp.where(active, logl_new, logl_x)
                    nc = nc + active
                    n_exp = n_exp + active
                    active = active & (logl_x > loglstar)
                    return (active, x_new, logl_x, nc, n_exp)

                active0 = logl_x > loglstar
                return jax.lax.while_loop(
                    cond, body, (active0, x, logl_x, nc, n_expand))

            _, left, logl_l, nc, n_expand = expand(-1.0, left, logl_l, nc,
                                                   n_expand)
            _, right, logl_r, nc, n_expand = expand(+1.0, right, logl_r, nc,
                                                    n_expand)
            expansion_warning = jnp.any(n_expand > 1000)
            big_l, big_r, big_fl, big_fr = left, right, logl_l, logl_r
        else:
            def cond(c):
                return jnp.any(c[0])

            def body(c):
                active, l, r, fl, fr, nc, n_exp, kk, grow = c
                kk, kv = jax.random.split(kk)
                go_left = jax.random.uniform(kv, (q_,), dtype=dtype) < 0.5
                width = r - l
                l_new = jnp.where(active & go_left, l - width, l)
                r_new = jnp.where(active & ~go_left, r + width, r)
                x_eval = jnp.where(go_left, l_new, r_new)
                _, _, logl_new, _ = feval(u0, x_eval, direction)
                fl = jnp.where(active & go_left, logl_new, fl)
                fr = jnp.where(active & ~go_left, logl_new, fr)
                nc = nc + active
                n_exp = n_exp + active * grow
                grow = jnp.where(active, jnp.minimum(grow * 2, 1 << 30), grow)
                active = active & ((fl > loglstar) | (fr > loglstar))
                return (active, l_new, r_new, fl, fr, nc, n_exp, kk, grow)

            active0 = (logl_l > loglstar) | (logl_r > loglstar)
            grow0 = jnp.ones((q_,), jnp.int32)
            (_, left, right, logl_l, logl_r, nc, n_expand, k1, _) = \
                jax.lax.while_loop(cond, body,
                                   (active0, left, right, logl_l, logl_r,
                                    nc, n_expand, k1, grow0))
            big_l, big_r, big_fl, big_fr = left, right, logl_l, logl_r

        # shrinkage loop
        def s_cond(c):
            active, it = c[0], c[-1]
            return jnp.any(active) & (it < max_shrink_iters)

        def s_body(c):
            (active, l, r, u, v, logl, blob, nc, n_con, kk, it) = c
            kk, kx = jax.random.split(kk)
            x = l + jax.random.uniform(kx, (q_,), dtype=dtype) * (r - l)
            u_prop, v_prop, logl_prop, blob_prop = feval(u0, x, direction)
            nc = nc + active
            n_con = n_con + active
            good = logl_prop > loglstar
            if doubling:
                d_acc, d_nc = doubling_accept(x, u0, direction, loglstar,
                                              big_l, big_r, big_fl, big_fr)
                nc = nc + jnp.where(active & good, d_nc, 0)
                good = good & d_acc
            newly = active & good
            u = jnp.where(newly[:, None], u_prop, u)
            v = jnp.where(newly[:, None], v_prop, v)
            logl = jnp.where(newly, logl_prop, logl)
            if blob is not None:
                blob = _tree_where(newly, blob_prop, blob)
            bad = active & ~good
            l = jnp.where(bad & (x < 0), x, l)
            r = jnp.where(bad & (x > 0), x, r)
            return (active & ~good, l, r, u, v, logl, blob, nc, n_con, kk,
                    it + 1)

        init = (jnp.ones((q_,), bool), left, right, u0, v0, logl0, blob0,
                nc, jnp.zeros((q_,), jnp.int32), k2, jnp.int32(0))
        (_, _, _, u, v, logl, blob, nc, n_contract, _, _) = \
            jax.lax.while_loop(s_cond, s_body, init)
        return u, v, logl, blob, nc, n_expand, n_contract, \
            expansion_warning

    def _make_directions(kdir, axes_d, scale):
        if kind == "rslice":
            # random isotropic directions transformed by the axes
            drhat = jax.random.normal(kdir, (q, n_steps, ndim), dtype=dtype)
            drhat = drhat / jnp.linalg.norm(drhat, axis=-1, keepdims=True)
            return jnp.einsum("qij,qsj->qsi", axes_d, drhat) * scale
        # per-lane shuffled principal-axis order, repeated per pass
        perm = jax.vmap(
            lambda k: jnp.concatenate([
                jax.random.permutation(jax.random.fold_in(k, s), ndim)
                for s in range(slices)
            ]))(jax.random.split(kdir, q))  # (q, slices*ndim)
        # axis i of the ellipsoid is column i of axes: per-lane
        # row-gather of axes.T by the shuffled axis order
        return jax.vmap(lambda a, p: a.T[p])(axes_d, perm) * scale

    def round_fn(key, packed_in, start_blob, scale, loglstar):
        if constrain is not None:
            packed_in = constrain(packed_in)
            start_blob = jax.tree.map(constrain, start_blob) \
                if start_blob is not None else None
        start_u = packed_in[:, :ndim]
        start_v = packed_in[:, ndim:ndim + npdim]
        start_logl = packed_in[:, ndim + npdim]
        axes = packed_in[:, ndim + npdim + 1:].reshape(q, ndim, ndim)
        kdir, kstep = jax.random.split(key)
        axes_d = axes.astype(dtype)
        directions = _make_directions(kdir, axes_d, scale)

        n0 = jnp.zeros((q,), jnp.int32)
        carry0 = (start_u.astype(dtype), start_v.astype(dtype),
                  start_logl.astype(dtype), start_blob, n0, n0, n0,
                  jnp.zeros((), bool))
        step_keys = jax.random.split(kstep, n_steps)

        def step_accum(carry, inp):
            u, v, logl, blob, nc_tot, n_exp, n_con, warn = carry
            skey, dirs = inp
            (u, v, logl, blob, nc1, ne1, ncon1, w1) = one_slice_step(
                skey, u, v, logl, blob, dirs, loglstar)
            return (u, v, logl, blob, nc_tot + nc1, n_exp + ne1,
                    n_con + ncon1, warn | w1), None

        dirs_by_step = jnp.moveaxis(directions, 1, 0)  # (n_steps, q, ndim)
        (u, v, logl, blob, nc, n_expand, n_contract, warn), _ = \
            jax.lax.scan(step_accum, carry0, (step_keys, dirs_by_step))
        packed = pack_columns(q, dtype, u, v, logl, nc, n_expand,
                              n_contract, warn)
        return packed, blob

    # -- persistent-lane state machine (stepping-out mode) -----------------
    # The barrier formulation above synchronizes all Q lanes at every
    # expand/shrink while_loop, so each slice step costs the SLOWEST
    # lane's evaluation count.  Here every lane advances its own
    # (init-left, init-right, expand-left, expand-right, shrink) phase
    # machine through its full budget of ``n_steps`` slice updates, so
    # the total sequential depth is max-over-lanes of the per-lane TOTAL
    # (which concentrates), not the sum of per-step maxima: ~2-4x fewer
    # batched likelihood launches for identical sampling semantics.
    PH_INIT_L, PH_INIT_R, PH_EXP_L, PH_EXP_R, PH_SHRINK = 0, 1, 2, 3, 4

    def round_fn_sm(key, packed_in, start_blob, scale, loglstar):
        if constrain is not None:
            # lane-partition the per-lane slice state machine
            packed_in = constrain(packed_in)
            start_blob = jax.tree.map(constrain, start_blob) \
                if start_blob is not None else None
        start_u = packed_in[:, :ndim].astype(dtype)
        start_v = packed_in[:, ndim:ndim + npdim].astype(dtype)
        start_logl = packed_in[:, ndim + npdim].astype(dtype)
        axes = packed_in[:, ndim + npdim + 1:].reshape(q, ndim, ndim)
        kdir, kr0, kloop = jax.random.split(key, 3)
        directions = _make_directions(kdir, axes.astype(dtype), scale)
        if constrain is not None:
            directions = constrain(directions)
        # cap each direction's length at the cube diagonal (reference
        # internal_samplers.py:1100-1108), precomputed for all steps
        dirlen = jnp.linalg.norm(directions, axis=-1)
        dirnorm = jnp.where(dirlen > maxlen, dirlen / maxlen, 1.0)
        directions = directions / dirnorm[..., None]

        r0 = jax.random.uniform(kr0, (q,), dtype=dtype)
        i0 = jnp.zeros((q,), jnp.int32)
        if constrain is not None:
            r0, i0 = constrain(r0), constrain(i0)
        state = dict(
            s=i0, phase=jnp.full((q,), PH_INIT_L, jnp.int32),
            u=start_u, v=start_v, logl=start_logl, blob=start_blob,
            u0=start_u, l=-r0, r=1.0 - r0,
            fl=jnp.full((q,), _NEG_INF, dtype),
            fr=jnp.full((q,), _NEG_INF, dtype),
            nc=i0, n_exp=i0, n_con=i0, exp_step=i0,
            warn=jnp.zeros((), bool), it=jnp.int32(0))

        max_total = n_steps * max_shrink_iters

        def cond(st):
            return jnp.any(st["s"] < n_steps) & (st["it"] < max_total)

        def body(st):
            s, phase = st["s"], st["phase"]
            l, r, fl, fr = st["l"], st["r"], st["fl"], st["fr"]
            active = s < n_steps
            kit = jax.random.fold_in(kloop, st["it"])
            u_sh, u_r0 = jax.random.uniform(kit, (2, q), dtype=dtype)

            dirc = jnp.take_along_axis(
                directions, jnp.minimum(s, n_steps - 1)[:, None, None],
                axis=1)[:, 0, :]
            x = jnp.where(
                phase == PH_INIT_L, l,
                jnp.where(phase == PH_INIT_R, r,
                          jnp.where(phase == PH_EXP_L, l - 1.0,
                                    jnp.where(phase == PH_EXP_R, r + 1.0,
                                              l + u_sh * (r - l)))))
            upos = st["u0"] + x[:, None] * dirc
            incube = unitcheck_batch(upos, nb) & active
            v_x, logl_x, blob_x = _masked_eval(like, upos, incube)
            nc = st["nc"] + active

            is_il = active & (phase == PH_INIT_L)
            is_ir = active & (phase == PH_INIT_R)
            is_el = active & (phase == PH_EXP_L)
            is_er = active & (phase == PH_EXP_R)
            is_sh = active & (phase == PH_SHRINK)

            fl = jnp.where(is_il | is_el, logl_x, fl)
            fr = jnp.where(is_ir | is_er, logl_x, fr)
            l = jnp.where(is_el, x, l)
            r = jnp.where(is_er, x, r)
            expanding = is_el | is_er
            n_exp = st["n_exp"] + expanding
            exp_step = st["exp_step"] + expanding
            n_con = st["n_con"] + is_sh

            acc = is_sh & (logl_x > loglstar)
            rej = is_sh & ~acc
            l = jnp.where(rej & (x < 0), x, l)
            r = jnp.where(rej & (x > 0), x, r)

            # phase transitions (using the updated fl/fr)
            after_ir = jnp.where(
                fl > loglstar, PH_EXP_L,
                jnp.where(fr > loglstar, PH_EXP_R, PH_SHRINK))
            nphase = jnp.where(is_il, PH_INIT_R, phase)
            nphase = jnp.where(is_ir, after_ir, nphase)
            el_done = is_el & (logl_x <= loglstar)
            nphase = jnp.where(
                el_done,
                jnp.where(fr > loglstar, PH_EXP_R, PH_SHRINK), nphase)
            er_done = is_er & (logl_x <= loglstar)
            nphase = jnp.where(er_done, PH_SHRINK, nphase)

            # acceptance: record the point and enter the next slice step
            u = jnp.where(acc[:, None], upos, st["u"])
            v = jnp.where(acc[:, None], v_x, st["v"])
            logl = jnp.where(acc, logl_x, st["logl"])
            blob = (_tree_where(acc, blob_x, st["blob"])
                    if st["blob"] is not None else None)
            u0 = jnp.where(acc[:, None], upos, st["u0"])
            s_new = s + acc
            l = jnp.where(acc, -u_r0, l)
            r = jnp.where(acc, 1.0 - u_r0, r)
            fl = jnp.where(acc, _NEG_INF, fl)
            fr = jnp.where(acc, _NEG_INF, fr)
            nphase = jnp.where(acc, PH_INIT_L, nphase)
            warn = st["warn"] | jnp.any(exp_step > 1000)
            exp_step = jnp.where(acc, 0, exp_step)

            return dict(s=s_new, phase=nphase, u=u, v=v, logl=logl,
                        blob=blob, u0=u0, l=l, r=r, fl=fl, fr=fr, nc=nc,
                        n_exp=n_exp, n_con=n_con, exp_step=exp_step,
                        warn=warn, it=st["it"] + 1)

        st = jax.lax.while_loop(cond, body, state)
        packed = pack_columns(q, dtype, st["u"], st["v"], st["logl"],
                              st["nc"], st["n_exp"], st["n_con"],
                              st["warn"])
        return packed, st["blob"]

    return jax.jit(f32_precision(round_fn if doubling else round_fn_sm))
