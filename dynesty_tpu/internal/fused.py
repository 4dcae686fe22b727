"""Fused proposal+consume rounds: the whole nested-sampling inner loop of
one queue refill runs in a single jitted device call.

The host path (``Sampler._new_point``) pops proposals one per iteration,
paying a host round-trip of bookkeeping per dead point; here the
sequential shell itself — worst-point selection, plateau handling, the
streaming trapezoid evidence update, live-point replacement, stopping
checks — is a ``lax.scan`` over the freshly proposed batch, exactly
mirroring the reference iteration (``sampler.py:1070-1212``) but executed
on device.  One fused call advances up to ``Q`` iterations and returns a
packed record block; the host only appends records, refits bounds between
rounds, and handles printing/checkpoints.

Proposal-queue semantics are preserved: all ``Q`` proposals are generated
at the round's starting threshold, and each is accepted at consume time
only if it beats the *current* (risen) threshold — statistically identical
to the reference's speculative queue (``sampler.py:732-778``).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.integrals import progress_integration_jax

__all__ = ["make_fused_round", "unpack_flat", "record_columns",
           "LIVE_EXTRA_COLS"]

# live matrix layout: u | v | logl | it | bound  (floats; ints stored as
# floats, exact below 2^24 in f32)
LIVE_EXTRA_COLS = 2


def record_columns(ndim, npdim):
    """Names/width of the packed per-iteration record rows."""
    names = (["worst"] + [f"u{i}" for i in range(ndim)] +
             [f"v{i}" for i in range(npdim)] +
             ["logl", "logvol", "logwt", "logz", "logzvar", "h", "nc",
              "worst_it", "boundidx"])
    return names


def make_fused_round(propose_fn, *, kind, nlive, ndim, npdim, q, dtype,
                     blob=False, rounds=1, tune_fn=None):
    """Wrap a proposal round into a fused propose+consume device call.

    The consume scan carries only the live log-likelihood vector and an
    "occupant" index per live slot (-1 = original point, else the queue
    entry currently occupying it); full record rows, the updated live
    matrix and blob buffers are assembled vectorized after the scan, so
    the sequential part stays tiny.

    ``rounds > 1`` chains several propose+consume rounds inside ONE
    device call (amortizing fixed dispatch/transfer costs on relayed
    devices); bound refits then happen every ``rounds`` queue refills.
    Counters, the nc accumulator and the done flag carry across the
    inner rounds, so the result is exactly ``rounds`` consecutive rounds
    without host involvement.

    ``tune_fn(scale, stats_vec) -> scale`` (traceable) applies the
    kernel's proposal-scale update BETWEEN inner rounds, i.e. at every
    queue refill — the same cadence at which the reference tunes when
    its proposal queue drains (``sampler.py:757-764``).  The final scale
    is returned to the host in the info vector.

    Returned jitted function::

        fused(key, live, live_blob, axes_args, ctrl)
          -> (flat, live_out, live_blob_out, old_blobs, qblob)

    ``ctrl`` packs integrator state, stop limits and the proposal scale
    into one vector (one upload): [logz, logzvar, h, logvol, loglstar,
    plateau_mode, plateau_counter, plateau_logdvol, it, dlogz, logl_max,
    max_accepts, max_nc, scale].
    """
    il = ndim + npdim  # logl column
    ii = il + 1  # live_it column
    ib = il + 2  # live_bound column
    dlv_default = float(np.log1p(1.0 / nlive))
    plateau_base = float(np.log(1.0 / (nlive + 1)))

    def one_round(rkey, live, live_blob, integ, counters, limits, scale,
                  axes_args):
        """One propose+consume round; counters/done flow in and out."""
        k_sel, k_prop = jax.random.split(rkey)
        live_logl0 = live[:, il]
        loglstar0 = jnp.min(live_logl0)

        (qu, qv, qlogl, qblob, qnc, stats,
         lane_stats) = propose_fn(
            k_sel, k_prop, live, live_blob, axes_args, scale, loglstar0)

        it0 = integ["it"]

        def body(carry, entry):
            (live_logl, occupant, logz, logzvar, h, logvol, loglstar,
             p_mode, p_counter, p_logdvol, n_acc, n_cons, nc_accum,
             nc_used, done, reason) = carry
            i, e_logl, e_nc = entry

            delta_logz = jnp.logaddexp(
                0.0, jnp.max(live_logl) + logvol - logz)
            causes = jnp.stack([
                delta_logz < limits["dlogz"],
                loglstar > limits["logl_max"],
                jnp.ptp(live_logl) == 0,
                n_acc >= limits["max_accepts"],
                nc_used >= limits["max_nc"],
            ])
            stop = jnp.any(causes)
            first_stop = stop & ~done
            reason = jnp.where(
                first_stop,
                jnp.sum(causes * (2 ** jnp.arange(5, dtype=jnp.int32))
                        ).astype(jnp.int32),
                reason)
            done = done | stop

            worst = jnp.argmin(live_logl)
            loglstar_new = live_logl[worst]

            nplateau = jnp.sum(
                live_logl == loglstar_new).astype(jnp.int32)
            enter = (~p_mode) & (nplateau > 1) & (~done)
            p_counter = jnp.where(enter, nplateau, p_counter)
            p_logdvol = jnp.where(enter, plateau_base + logvol,
                                  p_logdvol)
            p_mode = p_mode | enter
            cur_dlv = jnp.where(
                p_mode, -jnp.log1p(-jnp.exp(p_logdvol - logvol)),
                dlv_default)

            accept = (~done) & (e_logl > loglstar_new)
            consume = ~done
            nc_entry = jnp.where(consume, e_nc, 0)
            nc_this = nc_accum + nc_entry

            logvol_new = logvol - cur_dlv
            (logwt, logz_new, logzvar_new,
             h_new) = progress_integration_jax(
                 loglstar, loglstar_new, logz, logzvar, logvol_new,
                 cur_dlv, h)

            src = occupant[worst]
            live_logl = jnp.where(
                accept, live_logl.at[worst].set(e_logl), live_logl)
            occupant = jnp.where(
                accept, occupant.at[worst].set(i), occupant)

            logz = jnp.where(accept, logz_new, logz)
            logzvar = jnp.where(accept, logzvar_new, logzvar)
            h = jnp.where(accept, h_new, h)
            logvol = jnp.where(accept, logvol_new, logvol)
            loglstar = jnp.where(accept, loglstar_new, loglstar)
            n_acc = n_acc + accept
            n_cons = n_cons + consume
            nc_used = nc_used + nc_entry
            nc_accum = jnp.where(accept, 0, nc_this)

            p_counter = jnp.where(accept & p_mode, p_counter - 1,
                                  p_counter)
            p_mode = p_mode & ~(p_mode & (p_counter == 0))

            out = (worst, src, accept, loglstar_new, logvol_new, logwt,
                   logz_new, logzvar_new, h_new, nc_this, delta_logz)
            return (live_logl, occupant, logz, logzvar, h, logvol,
                    loglstar, p_mode, p_counter, p_logdvol, n_acc,
                    n_cons, nc_accum, nc_used, done, reason), out

        occupant0 = jnp.full((nlive,), -1, jnp.int32)
        init = (live_logl0, occupant0,
                integ["logz"], integ["logzvar"], integ["h"],
                integ["logvol"], integ["loglstar"],
                integ["plateau_mode"], integ["plateau_counter"],
                integ["plateau_logdvol"],
                counters["n_acc"], counters["n_cons"],
                counters["nc_accum"], counters["nc_used"],
                counters["done"], counters["reason"])
        lanes = jnp.arange(q, dtype=jnp.int32)
        carry, outs = jax.lax.scan(body, init, (lanes, qlogl, qnc))
        (live_logl_f, occupant_f, logz, logzvar, h, logvol, loglstar,
         p_mode, p_counter, p_logdvol, n_acc, n_cons, nc_accum, nc_used,
         done, reason) = carry
        (worsts, srcs, accepts, r_logl, r_logvol, r_logwt, r_logz,
         r_logzvar, r_h, r_nc, r_dlogz) = outs

        # -- vectorized record/live assembly -----------------------------
        acc_before = jnp.cumsum(accepts.astype(jnp.int32)) - accepts
        entry_it = (it0 + acc_before).astype(dtype)

        from_orig = srcs < 0
        u_dead = jnp.where(from_orig[:, None], live[worsts, :ndim],
                           qu[jnp.maximum(srcs, 0)])
        v_dead = jnp.where(from_orig[:, None],
                           live[worsts, ndim:il],
                           qv[jnp.maximum(srcs, 0)])
        it_dead = jnp.where(from_orig, live[worsts, ii],
                            entry_it[jnp.maximum(srcs, 0)])
        bound_dead = jnp.where(from_orig, live[worsts, ib], -1.0)
        recs = jnp.concatenate([
            worsts.astype(dtype)[:, None], u_dead, v_dead,
            jnp.stack([r_logl, r_logvol, r_logwt, r_logz, r_logzvar,
                       r_h, r_nc.astype(dtype), it_dead, bound_dead],
                      axis=1),
        ], axis=1)
        if live_blob is not None:
            old_blobs = jax.tree.map(
                lambda lb, qb: jnp.where(
                    _bmask(from_orig, lb.ndim), lb[worsts],
                    qb[jnp.maximum(srcs, 0)]),
                live_blob, qblob)
        else:
            old_blobs = None

        idx = jnp.where(accepts, worsts, nlive)
        last = jnp.full((nlive,), -1, jnp.int32).at[idx].max(
            lanes, mode="drop")
        replaced = last >= 0
        lastc = jnp.maximum(last, 0)
        new_rows = jnp.concatenate([
            qu[lastc], qv[lastc],
            jnp.stack([qlogl[lastc], entry_it[lastc],
                       jnp.full((nlive,), -1.0, dtype)], axis=1),
        ], axis=1)
        live_out = jnp.where(replaced[:, None], new_rows, live)
        if live_blob is not None:
            live_blob_out = jax.tree.map(
                lambda lb, qb: jnp.where(_bmask(replaced, lb.ndim),
                                         qb[lastc], lb),
                live_blob, qblob)
        else:
            live_blob_out = None

        integ_out = {
            "logz": logz, "logzvar": logzvar, "h": h, "logvol": logvol,
            "loglstar": loglstar, "plateau_mode": p_mode,
            "plateau_counter": p_counter, "plateau_logdvol": p_logdvol,
            "it": it0 + (n_acc - counters["n_acc"]),
        }
        counters_out = {
            "n_acc": n_acc, "n_cons": n_cons, "nc_accum": nc_accum,
            "nc_used": nc_used, "done": done, "reason": reason,
        }
        stats_vec = jnp.zeros((4,), dtype).at[:len(stats)].set(
            jnp.stack([jnp.asarray(sv, dtype) for sv in stats]))
        proposals = jnp.concatenate(
            [qu, qv, qlogl[:, None], qnc.astype(dtype)[:, None],
             lane_stats.astype(dtype)], axis=1)
        round_out = (recs, accepts, r_dlogz, proposals, stats_vec,
                     old_blobs, qblob)
        return live_out, live_blob_out, integ_out, counters_out, round_out

    def fused(key, live, live_blob, axes_args, ctrl):
        integ = {
            "logz": ctrl[0], "logzvar": ctrl[1], "h": ctrl[2],
            "logvol": ctrl[3], "loglstar": ctrl[4],
            "plateau_mode": ctrl[5] > 0.5,
            "plateau_counter": ctrl[6].astype(jnp.int32),
            "plateau_logdvol": ctrl[7],
            "it": ctrl[8].astype(jnp.int32),
        }
        limits = {
            "dlogz": ctrl[9], "logl_max": ctrl[10],
            "max_accepts": ctrl[11].astype(jnp.int32),
            "max_nc": ctrl[12].astype(jnp.int32),
        }
        scale0 = ctrl[13]
        counters = {
            "n_acc": jnp.int32(0), "n_cons": jnp.int32(0),
            "nc_accum": jnp.int32(0), "nc_used": jnp.int32(0),
            "done": jnp.asarray(False), "reason": jnp.int32(0),
        }

        def round_step(carry, rkey):
            live, live_blob, integ, counters, scale = carry
            was_done = counters["done"]
            live, live_blob, integ, counters, round_out = one_round(
                rkey, live, live_blob, integ, counters, limits, scale,
                axes_args)
            if tune_fn is not None:
                # per-queue-refill scale adaptation (reference cadence:
                # tune when the proposal queue drains, sampler.py:757-764)
                scale = jnp.where(was_done, scale,
                                  tune_fn(scale, round_out[4]).astype(
                                      scale.dtype))
            return (live, live_blob, integ, counters, scale), round_out

        rkeys = jax.random.split(key, rounds)
        (live, live_blob, integ, counters, scale), stacked = jax.lax.scan(
            round_step, (live, live_blob, integ, counters, scale0), rkeys)
        (recs, accepts, r_dlogz, proposals, stats_vecs, old_blobs,
         qblobs) = stacked
        recs = recs.reshape(rounds * q, -1)
        accepts = accepts.reshape(rounds * q)
        r_dlogz = r_dlogz.reshape(rounds * q)
        proposals = proposals.reshape(rounds * q, -1)
        lane_stats = proposals[:, -2:]
        stats_vec = stats_vecs.sum(axis=0)
        if old_blobs is not None:
            old_blobs = jax.tree.map(
                lambda b: b.reshape((rounds * q,) + b.shape[2:]),
                old_blobs)
            qblobs = jax.tree.map(
                lambda b: b.reshape((rounds * q,) + b.shape[2:]), qblobs)

        integ_vec = jnp.stack([
            integ["logz"], integ["logzvar"], integ["h"], integ["logvol"],
            integ["loglstar"], integ["plateau_mode"].astype(dtype),
            integ["plateau_counter"].astype(dtype),
            integ["plateau_logdvol"],
            (ctrl[8].astype(jnp.int32) + counters["n_acc"]).astype(dtype),
        ])
        info_vec = jnp.stack([
            counters["n_acc"].astype(dtype),
            counters["nc_used"].astype(dtype),
            counters["done"].astype(dtype),
            counters["n_cons"].astype(dtype),
            counters["reason"].astype(dtype),
            scale.astype(dtype),
        ])
        # the full proposals block stays on device: it is only needed
        # for leftover replay when a dispatch ends early, so the common
        # path saves its (rounds*q, ndim+npdim+4) transfer — relayed
        # TPU fetches are bandwidth-bound
        flat = jnp.concatenate([
            recs.astype(dtype).ravel(),
            integ_vec.astype(dtype),
            info_vec,
            stats_vec,
            accepts.astype(dtype),
            r_dlogz.astype(dtype),
            lane_stats.astype(dtype).ravel(),
        ])
        return flat, proposals, live, live_blob, old_blobs, qblobs

    from .kernels import f32_precision
    fused_jit = jax.jit(f32_precision(fused))
    width = 1 + ndim + npdim + 9
    layout = {
        "rec_shape": (rounds * q, width),
        "prop_shape": (rounds * q, ndim + npdim + 4),
        "n_integ": 9,
        "n_info": 6,
        "n_stats": 4,
        "q": rounds * q,
        "ndim": ndim,
        "npdim": npdim,
    }
    return fused_jit, layout


def _bmask(mask, ndim_leaf):
    return mask.reshape(mask.shape + (1,) * (ndim_leaf - 1))


def unpack_flat(flat, layout):
    """Split the fused round's flat output vector back into named parts
    (host side, numpy)."""
    q, w = layout["rec_shape"]
    pos = 0
    recs = flat[pos:pos + q * w].reshape(q, w); pos += q * w
    integ = flat[pos:pos + layout["n_integ"]]; pos += layout["n_integ"]
    info = flat[pos:pos + layout["n_info"]]; pos += layout["n_info"]
    stats = flat[pos:pos + layout["n_stats"]]; pos += layout["n_stats"]
    accepts = flat[pos:pos + q] > 0.5; pos += q
    delta_logz = flat[pos:pos + q]; pos += q
    lane_stats = flat[pos:pos + q * 2].reshape(q, 2); pos += q * 2
    return {
        "records": recs,
        "integ": {
            "logz": integ[0], "logzvar": integ[1], "h": integ[2],
            "logvol": integ[3], "loglstar": integ[4],
            "plateau_mode": bool(integ[5] > 0.5),
            "plateau_counter": int(integ[6]),
            "plateau_logdvol": integ[7], "it": int(integ[8]),
        },
        "n_accepted": int(info[0]),
        "nc_used": int(info[1]),
        "done": bool(info[2] > 0.5),
        "n_consumed": int(info[3]),
        "done_reason": int(info[4]),
        "scale_final": float(info[5]),
        "stats": stats,
        "accepts": accepts,
        "delta_logz": delta_logz,
        "lane_stats": lane_stats,
    }


# --------------------------------------------------------------------------
# device-side start/axes selection


def select_starts(k_sel, live, logl_col, q, bound_kind, axes_args, dtype,
                  eye_dim=None):
    """Pick Q start rows among live points above the threshold, plus
    per-lane random axes from the bound (volume-weighted for ellipsoid
    stacks), all on device."""
    live_logl = live[:, logl_col]
    loglstar = jnp.min(live_logl)
    valid = live_logl > loglstar
    kc, ka = jax.random.split(k_sel)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idxs = jax.random.categorical(kc, logits, shape=(q,))
    starts = live[idxs]

    if bound_kind == "ellipsoids":
        logvols = axes_args["logvols"]
        mask = axes_args["mask"]
        logp = jnp.where(mask, logvols, -jnp.inf)
        ell_idx = jax.random.categorical(ka, logp, shape=(q,))
        axes = axes_args["axes"].astype(dtype)[ell_idx]
    elif bound_kind in ("balls", "cubes", "custom"):
        axes = jnp.broadcast_to(axes_args["axes"].astype(dtype),
                                (q,) + axes_args["axes"].shape)
    else:  # unit cube: identity axes
        d = eye_dim
        axes = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (q, d, d))
    return idxs, starts, axes
