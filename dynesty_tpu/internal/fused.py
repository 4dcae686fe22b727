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

__all__ = ["make_fused_round", "unpack_flat",
           "record_columns", "LIVE_EXTRA_COLS"]

# Debug/test knob: build fused rounds WITHOUT the thin scalar consume
# fast path (batch mode falls back to the general O(nlive)-carry scan
# unconditionally).  Read at trace time; tests flip it (clearing the
# round caches) to assert the two paths are bit-identical end to end.
_FORCE_GENERAL_CONSUME = False

# live matrix layout: u | v | logl | it | bound | birth  (floats; ints
# stored as floats, exact below 2^24 in f32).  ``birth`` is the logl
# threshold above which the point was drawn (-inf, clamped, for points
# sampled from the whole prior) — the thread decomposition used by the
# error analysis (resample/unravel) needs it under batched death/refill,
# where a refilled slot is NOT a continuation of the thread that died in
# it (the refill is drawn above the round threshold, not above the
# slot's own death).
LIVE_EXTRA_COLS = 3


def record_columns(ndim, npdim):
    """Names/width of the packed per-iteration record rows."""
    names = (["worst"] + [f"u{i}" for i in range(ndim)] +
             [f"v{i}" for i in range(npdim)] +
             ["logl", "logvol", "logwt", "logz", "logzvar", "h", "nc",
              "worst_it", "boundidx", "n", "birth"])
    return names


def make_fused_round(propose_fn, *, kind, nlive, ndim, npdim, q, dtype,
                     blob=False, rounds=1, tune_fn=None, mode="batch",
                     mesh=None, chain_stop_fn=None, gate_on_done=False,
                     pass_nc_budget=False):
    """Wrap a proposal round into a fused propose+consume device call.

    ``mode`` selects the batching semantics:

    * ``'batch'`` (default) — batched death/refill: each round kills the
      ``q`` worst live points at the shared threshold ``sorted_logl[q-1]``
      and refills all ``q`` at that SAME threshold, recording each death
      with the varying-live-count shrinkage ``dlv_j = log((n_j+1)/n_j)``,
      ``n_j = nlive - j``.  Exact (it is ordinary dynamic-nested-sampling
      bookkeeping with a sawtooth live-point profile) and waste-free: no
      proposal is ever generated against a stale threshold, so MCMC
      kernels never discard work.  Requires ``q < nlive``.
    * ``'queue'`` — the reference's speculative proposal queue
      (``sampler.py:732-778``): all ``q`` proposals are generated at the
      round-start threshold and consumed against the rising one,
      discarding (and charging) entries that fall below it; the live
      count stays constant.

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

    ``chain_stop_fn(integ, counters, ctrl) -> bool`` (traceable), when
    given, is evaluated at the START of every chained round; once it
    fires, that round and all later rounds are skipped entirely
    (nothing proposed, billed or consumed) and bit 32 is set in the
    reported stop reason.  Used by the unit-cube phase to stop the
    chain exactly where the host's first-bound-update trigger would
    fire (reference cadence: checked at every queue drain,
    ``sampler.py:625-674``), so chaining cannot overshoot the
    transition.  The gate makes the round cond carry-dependent — which
    costs XLA some scan pipelining — so it is only used for programs
    where stranded speculative rounds would be costlier (rejection
    waves from the whole prior volume).

    Returned jitted function::

        fused(key, live, live_blob, axes_args, ctrl)
          -> (flat, live_out, live_blob_out, old_blobs, qblob)

    ``ctrl`` packs integrator state, stop limits and the proposal scale
    into one vector (one upload): [logz, logzvar, h, logvol, loglstar,
    plateau_mode, plateau_counter, plateau_logdvol, it, dlogz, logl_max,
    max_accepts, max_nc, scale, kills0, rounds_active, birth0].
    ``kills0`` is the number of deaths already recorded in the round
    being (re)entered — nonzero only when replaying the leftover tail of
    an interrupted batch-mode round, so its varying-live-count accounting
    continues where it stopped.  ``birth0`` (replay only) is the
    interrupted round's proposal threshold, recorded as the birth of any
    refills made while consuming the replayed tail.
    """
    assert mode in ("batch", "queue")
    if mode == "batch" and q >= nlive:
        raise ValueError(
            f"batch mode needs q < nlive (got q={q}, nlive={nlive})")
    if mesh is not None:
        from ..parallel.mesh import lane_constrainer, replicate
        _lane = lane_constrainer(mesh)

        def _repl(x):
            return replicate(mesh, x)
    else:
        _lane = None

        def _repl(x):
            return x
    il = ndim + npdim  # logl column
    ii = il + 1  # live_it column
    ib = il + 2  # live_bound column
    ibirth = il + 3  # live_birth column
    dlv_default = float(np.log1p(1.0 / nlive))

    def one_round(rkey, live, live_blob, integ, counters, limits, scale,
                  axes_args, kills0, birth0):
        """One propose+consume round; counters/done flow in and out."""
        k_sel, k_prop = jax.random.split(rkey)
        live_logl0 = live[:, il]
        if mode == "batch":
            # shared kill threshold: the q-th smallest live logl.  When
            # that order statistic already equals the live maximum (a
            # plateau reaching into the kill set — e.g. a flat
            # likelihood), proposing above it is unsatisfiable and the
            # rejection kernels would spin; saturate to the largest
            # value STRICTLY below the maximum instead (-inf on a full
            # plateau, where the consume scan's plateau stop fires
            # before anything is consumed).
            sort_idx = jnp.argsort(live_logl0)
            sorted_logl = live_logl0[sort_idx]
            lmax = sorted_logl[-1]
            cand = sorted_logl[q - 1]
            fallback = jnp.max(
                jnp.where(live_logl0 < lmax, live_logl0,
                          jnp.asarray(-jnp.inf, live_logl0.dtype)))
            loglstar0 = jnp.where(cand < lmax, cand, fallback)
        else:
            loglstar0 = jnp.min(live_logl0)
        if kind == "replay":
            # replayed entries were generated at the INTERRUPTED round's
            # threshold, which the host passes through ctrl — the live
            # state here is already partially refilled, so recomputing
            # the threshold would overstate the refill births
            birth_new = birth0
        else:
            birth_new = loglstar0

        (qu, qv, qlogl, qblob, qnc, stats,
         lane_stats) = propose_fn(
            k_sel, k_prop, live, live_blob, axes_args, scale, loglstar0)
        if mesh is not None:
            # parallel/sequential boundary: the kernels ran with the lane
            # axis partitioned across the mesh; the consume scan runs on
            # replicated state, so the tiny per-lane results are gathered
            # here (one all-gather of a few KB per round, over ICI)
            qu, qv, qlogl, qnc = (_repl(qu), _repl(qv), _repl(qlogl),
                                  _repl(qnc))
            qblob = _repl(qblob)
            lane_stats = _repl(lane_stats)

        it0 = integ["it"]

        # Batch-mode fast path precondition: with a strict q-th-order-
        # statistic threshold (cand < lmax), every kernel proposal beats
        # every victim (kernels propose STRICTLY above loglstar0 =
        # sorted[q-1] >= each victim), so the round's deaths are exactly
        # the q sorted-worst original live points, refilled slots can
        # never die intra-round, and the consume scan's carry collapses
        # to scalars (no O(nlive) reductions per step).  The general
        # scan below stays the fallback for queue mode, replay rounds,
        # and plateau-saturated thresholds.
        thin_ok = None
        if (mode == "batch" and kind != "replay"
                and not _FORCE_GENERAL_CONSUME):
            thin_ok = cand < lmax
            # partially-filled rounds (nc-budget/max_waves cutoffs mark
            # unfilled slots logl=-inf) violate the every-proposal-beats-
            # every-victim invariant: take the general scan
            thin_ok = thin_ok & (jnp.min(qlogl) > loglstar0)

        def body(carry, entry):
            (live_logl, occupant, logz, logzvar, h, logvol, loglstar,
             p_mode, p_counter, p_logdvol, n_acc, n_cons, nc_accum,
             nc_used, done, reason, racc) = carry
            i, e_logl, e_nc = entry
            # live-point count charged to this death (sawtooth in batch
            # mode: the round's kills shrink it until the refill)
            if mode == "batch":
                n_now = (nlive - racc).astype(dtype)
            else:
                n_now = jnp.asarray(float(nlive), dtype)

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
            p_logdvol = jnp.where(enter,
                                  -jnp.log(n_now + 1.0) + logvol,
                                  p_logdvol)
            p_mode = p_mode | enter
            if mode == "batch":
                dlv_now = jnp.log1p(1.0 / n_now)
            else:
                dlv_now = jnp.asarray(dlv_default, dtype)
            cur_dlv = jnp.where(
                p_mode, -jnp.log1p(-jnp.exp(p_logdvol - logvol)),
                dlv_now)

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
            racc = racc + accept

            out = (worst, src, accept, loglstar_new, logvol_new, logwt,
                   logz_new, logzvar_new, h_new, nc_this, delta_logz,
                   n_now)
            return (live_logl, occupant, logz, logzvar, h, logvol,
                    loglstar, p_mode, p_counter, p_logdvol, n_acc,
                    n_cons, nc_accum, nc_used, done, reason, racc), out

        occupant0 = jnp.full((nlive,), -1, jnp.int32)
        init = (live_logl0, occupant0,
                integ["logz"], integ["logzvar"], integ["h"],
                integ["logvol"], integ["loglstar"],
                integ["plateau_mode"], integ["plateau_counter"],
                integ["plateau_logdvol"],
                counters["n_acc"], counters["n_cons"],
                counters["nc_accum"], counters["nc_used"],
                counters["done"], counters["reason"], kills0)
        lanes = jnp.arange(q, dtype=jnp.int32)

        def run_general(_):
            carry, outs = jax.lax.scan(body, init, (lanes, qlogl, qnc))
            (_live_logl_f, _occupant_f, logz, logzvar, h, logvol,
             loglstar, p_mode, p_counter, p_logdvol, n_acc, n_cons,
             nc_accum, nc_used, done, reason, _racc) = carry
            return ((logz, logzvar, h, logvol, loglstar, p_mode,
                     p_counter, p_logdvol, n_acc, n_cons, nc_accum,
                     nc_used, done, reason), outs)

        def run_thin(_):
            # deaths are exactly the q sorted-worst originals, in order;
            # every proposal is accepted while the run is not done (see
            # thin_ok above) — the scan carry is pure scalars.
            victims = sort_idx[:q]
            vict_logl = sorted_logl[:q]
            # plateau count among CURRENT live at each kill step: refills
            # sit strictly above every victim value, so only originals
            # count — (# originals <= v_j) minus (j killed so far)
            npl_pre = (jnp.searchsorted(
                sorted_logl, vict_logl, side="right").astype(jnp.int32) -
                jnp.arange(q, dtype=jnp.int32))

            def tbody(carry, entry):
                (logz, logzvar, h, logvol, loglstar, p_mode, p_counter,
                 p_logdvol, n_acc, n_cons, nc_accum, nc_used, done,
                 reason, racc, rmax) = carry
                e_logl, e_nc, v_logl, npl = entry
                n_now = (nlive - racc).astype(dtype)

                delta_logz = jnp.logaddexp(0.0, rmax + logvol - logz)
                causes = jnp.stack([
                    delta_logz < limits["dlogz"],
                    loglstar > limits["logl_max"],
                    rmax == v_logl,
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

                loglstar_new = v_logl
                enter = (~p_mode) & (npl > 1) & (~done)
                p_counter = jnp.where(enter, npl, p_counter)
                p_logdvol = jnp.where(enter,
                                      -jnp.log(n_now + 1.0) + logvol,
                                      p_logdvol)
                p_mode = p_mode | enter
                cur_dlv = jnp.where(
                    p_mode, -jnp.log1p(-jnp.exp(p_logdvol - logvol)),
                    jnp.log1p(1.0 / n_now))

                accept = ~done  # e_logl > v_logl by construction
                nc_entry = jnp.where(accept, e_nc, 0)
                nc_this = nc_accum + nc_entry

                logvol_new = logvol - cur_dlv
                (logwt, logz_new, logzvar_new,
                 h_new) = progress_integration_jax(
                     loglstar, loglstar_new, logz, logzvar, logvol_new,
                     cur_dlv, h)

                logz = jnp.where(accept, logz_new, logz)
                logzvar = jnp.where(accept, logzvar_new, logzvar)
                h = jnp.where(accept, h_new, h)
                logvol = jnp.where(accept, logvol_new, logvol)
                loglstar = jnp.where(accept, loglstar_new, loglstar)
                n_acc = n_acc + accept
                n_cons = n_cons + accept
                nc_used = nc_used + nc_entry
                nc_accum = jnp.where(accept, 0, nc_this)
                p_counter = jnp.where(accept & p_mode, p_counter - 1,
                                      p_counter)
                p_mode = p_mode & ~(p_mode & (p_counter == 0))
                racc = racc + accept
                rmax = jnp.where(accept, jnp.maximum(rmax, e_logl), rmax)

                out = (accept, loglstar_new, logvol_new, logwt, logz_new,
                       logzvar_new, h_new, nc_this, delta_logz, n_now)
                return (logz, logzvar, h, logvol, loglstar, p_mode,
                        p_counter, p_logdvol, n_acc, n_cons, nc_accum,
                        nc_used, done, reason, racc, rmax), out

            tinit = (integ["logz"], integ["logzvar"], integ["h"],
                     integ["logvol"], integ["loglstar"],
                     integ["plateau_mode"], integ["plateau_counter"],
                     integ["plateau_logdvol"],
                     counters["n_acc"], counters["n_cons"],
                     counters["nc_accum"], counters["nc_used"],
                     counters["done"], counters["reason"], kills0, lmax)
            carry, touts = jax.lax.scan(tbody, tinit,
                                        (qlogl, qnc, vict_logl, npl_pre))
            (logz, logzvar, h, logvol, loglstar, p_mode, p_counter,
             p_logdvol, n_acc, n_cons, nc_accum, nc_used, done, reason,
             _racc, _rmax) = carry
            (t_acc, t_logl, t_logvol, t_logwt, t_logz, t_logzvar, t_h,
             t_nc, t_dlogz, t_n) = touts
            outs = (victims, jnp.full((q,), -1, jnp.int32), t_acc,
                    t_logl, t_logvol, t_logwt, t_logz, t_logzvar, t_h,
                    t_nc, t_dlogz, t_n)
            return ((logz, logzvar, h, logvol, loglstar, p_mode,
                     p_counter, p_logdvol, n_acc, n_cons, nc_accum,
                     nc_used, done, reason), outs)

        if thin_ok is None:
            scalars, outs = run_general(None)
        else:
            scalars, outs = jax.lax.cond(thin_ok, run_thin, run_general,
                                         None)
        (logz, logzvar, h, logvol, loglstar, p_mode, p_counter,
         p_logdvol, n_acc, n_cons, nc_accum, nc_used, done,
         reason) = scalars
        (worsts, srcs, accepts, r_logl, r_logvol, r_logwt, r_logz,
         r_logzvar, r_h, r_nc, r_dlogz, r_n) = outs

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
        # a dead point that was itself accepted earlier this round (queue
        # mode only) was born at this round's threshold
        birth_dead = jnp.where(from_orig, live[worsts, ibirth],
                               birth_new)
        recs = jnp.concatenate([
            worsts.astype(dtype)[:, None], u_dead, v_dead,
            jnp.stack([r_logl, r_logvol, r_logwt, r_logz, r_logzvar,
                       r_h, r_nc.astype(dtype), it_dead, bound_dead,
                       r_n.astype(dtype), birth_dead],
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
                       jnp.full((nlive,), -1.0, dtype),
                       jnp.broadcast_to(birth_new, (nlive,)).astype(
                           dtype)], axis=1),
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
                     old_blobs, qblob, loglstar0.astype(dtype))
        return live_out, live_blob_out, integ_out, counters_out, round_out

    def fused(key, live, live_blob, axes_args, ctrl):
        if mesh is not None:
            # live state, bound arrays and control scalars are replicated
            # on every chip; only the lane axis is partitioned
            live, live_blob = _repl(live), _repl(live_blob)
            axes_args, ctrl = _repl(axes_args), _repl(ctrl)
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
        kills0 = ctrl[14].astype(jnp.int32)
        # replay only: the interrupted round's proposal threshold (birth
        # of any refills made while consuming the replayed tail)
        birth0 = ctrl[16] if ctrl.shape[0] > 16 else ctrl[4]
        # continuation of a budget-interrupted dispatch: rounds below
        # this index were already consumed (and their tail replayed), so
        # they are skipped entirely; the SAME dispatch key then makes
        # the remaining rounds bit-identical to the uninterrupted run's
        rounds_skip = ctrl[17].astype(jnp.int32) if ctrl.shape[0] > 17 \
            else jnp.int32(0)
        # runtime cap on the chained rounds that consume/bill work: the
        # host shrinks it near a stopping criterion so a terminal stop
        # does not strand (and bill) a mostly-unused speculative dispatch
        # — same compiled program, no re-trace.  Gated rounds still
        # execute on device (static graph) but consume nothing, report
        # zero nc, and are excluded from tuning statistics.
        rounds_active = ctrl[15].astype(jnp.int32)
        counters = {
            "n_acc": jnp.int32(0), "n_cons": jnp.int32(0),
            "nc_accum": jnp.int32(0), "nc_used": jnp.int32(0),
            "done": jnp.asarray(False), "reason": jnp.int32(0),
        }
        if chain_stop_fn is not None:
            counters["chain_stop"] = jnp.asarray(False)

        def _zero_blob_like(live_blob):
            if live_blob is None:
                return None
            return jax.tree.map(
                lambda b: jnp.zeros((q,) + b.shape[1:], b.dtype),
                live_blob)

        def round_step(carry, rinp):
            rkey, ridx = rinp
            # rounds past the runtime cap are skipped entirely via
            # lax.cond (no likelihood work, nothing billed).  For
            # ungated programs, rounds after an in-flight stopping cause
            # still propose (their work is billed as stranded
            # speculation); gating them on the carried done flag was
            # measured ~30% slower for the MCMC kernels on the 25-D
            # benchmark — a carry-dependent cond blocks XLA's scan
            # pipelining — for zero call savings, since the host's
            # est-based rounds_active already bounds overshoot.  The
            # rejection kernels (``gate_on_done``) are different: their
            # wave while_loop is already carry-dependent (no pipelining
            # to lose) and a stranded round costs a full fill of billed
            # evaluations, so they skip every round past the stop —
            # which lets the host chain rounds deep into the endgame
            # without stranding work.
            forced_off = (ridx >= rounds_active) | (ridx < rounds_skip)
            if gate_on_done and chain_stop_fn is None:
                counters_c = carry[3]
                forced_off = forced_off | counters_c["done"]
            if chain_stop_fn is not None:
                # evaluate the chain-stop trigger at the round boundary
                # (host-check cadence); once fired — or once the round
                # chain is done for any reason — later rounds run
                # nothing and bill nothing
                live_c, blob_c, integ_c, counters_c, scale_c = carry
                trig = counters_c["chain_stop"] | \
                    chain_stop_fn(integ_c, counters_c, ctrl)
                counters_c = dict(counters_c, chain_stop=trig)
                carry = (live_c, blob_c, integ_c, counters_c, scale_c)
                forced_off = forced_off | trig | counters_c["done"]

            def do_round(carry):
                live, live_blob, integ, counters, scale = carry
                was_done = counters["done"]
                chain_flag = counters.get("chain_stop")
                # the interrupted-round kill offset applies only to the
                # first chained round of a dispatch (replay continuation)
                rkills = jnp.where(ridx == 0, kills0, 0)
                live, live_blob, integ, counters, round_out = one_round(
                    rkey, live, live_blob, integ, counters, limits,
                    scale, axes_args, rkills, birth0)
                if chain_flag is not None:
                    # one_round rebuilds the counters dict: re-attach
                    # the carried chain-stop flag
                    counters = dict(counters, chain_stop=chain_flag)
                if tune_fn is not None:
                    # per-queue-refill scale adaptation (reference
                    # cadence: tune when the proposal queue drains,
                    # sampler.py:757-764)
                    scale = jnp.where(was_done, scale,
                                      tune_fn(scale,
                                              round_out[4]).astype(
                                                  scale.dtype))
                return (live, live_blob, integ, counters, scale), \
                    round_out

            def skip_round(carry):
                live, live_blob, integ, counters, scale = carry
                width = 1 + ndim + npdim + 11
                round_out = (
                    jnp.zeros((q, width), dtype),
                    jnp.zeros((q,), bool),
                    jnp.zeros((q,), dtype),
                    jnp.zeros((q, ndim + npdim + 4), dtype),
                    jnp.zeros((4,), dtype),
                    _zero_blob_like(live_blob),
                    _zero_blob_like(live_blob),
                    jnp.zeros((), dtype),
                )
                return carry, round_out

            return jax.lax.cond(forced_off, skip_round, do_round, carry)

        rkeys = jax.random.split(key, rounds)
        (live, live_blob, integ, counters, scale), stacked = jax.lax.scan(
            round_step, (live, live_blob, integ, counters, scale0),
            (rkeys, jnp.arange(rounds, dtype=jnp.int32)))
        (recs, accepts, r_dlogz, proposals, stats_vecs, old_blobs,
         qblobs, round_thresholds) = stacked
        recs = recs.reshape(rounds * q, -1)
        accepts = accepts.reshape(rounds * q)
        r_dlogz = r_dlogz.reshape(rounds * q)
        proposals = proposals.reshape(rounds * q, -1)
        if mesh is not None:
            # stays device-resident AND lane-sharded (fetched only for
            # leftover replay); also the output-sharding evidence that
            # the round really was partitioned (tests/test_parallel.py)
            proposals = _lane(proposals)
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
        # total logical evals LAUNCHED this dispatch (consumed or not):
        # the basis for exact terminal ncall accounting on the host
        nc_launched = proposals[:, ndim + npdim + 1].sum()
        reason_out = counters["reason"]
        if chain_stop_fn is not None:
            # bit 32: the chain-stop trigger fired (reported in
            # addition to any terminal/budget cause bits)
            reason_out = reason_out + \
                32 * counters["chain_stop"].astype(jnp.int32)
        info_vec = jnp.stack([
            counters["n_acc"].astype(dtype),
            counters["nc_used"].astype(dtype),
            counters["done"].astype(dtype),
            counters["n_cons"].astype(dtype),
            reason_out.astype(dtype),
            scale.astype(dtype),
            nc_launched.astype(dtype),
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
            round_thresholds.astype(dtype).reshape(rounds),
        ])
        return flat, proposals, live, live_blob, old_blobs, qblobs

    from .kernels import f32_precision
    fused_jit = jax.jit(f32_precision(fused))
    width = 1 + ndim + npdim + 11
    layout = {
        "rec_shape": (rounds * q, width),
        "prop_shape": (rounds * q, ndim + npdim + 4),
        "n_integ": 9,
        "n_info": 7,
        "n_stats": 4,
        "q": rounds * q,
        "rounds": rounds,
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
    rounds = layout.get("rounds", 1)
    round_thresholds = flat[pos:pos + rounds]; pos += rounds
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
        "nc_launched": int(info[6]),
        "stats": stats,
        "accepts": accepts,
        "delta_logz": delta_logz,
        "lane_stats": lane_stats,
        "round_thresholds": round_thresholds,
    }


# --------------------------------------------------------------------------
# device-side start/axes selection


def select_starts(k_sel, live, logl_col, q, bound_kind, axes_args, dtype,
                  eye_dim=None, loglstar=None):
    """Pick Q start rows among live points above ``loglstar`` (default:
    the live minimum), plus per-lane random axes from the bound
    (volume-weighted for ellipsoid stacks), all on device."""
    live_logl = live[:, logl_col]
    if loglstar is None:
        loglstar = jnp.min(live_logl)
    valid = live_logl > loglstar
    # degenerate plateau (nothing strictly above): any start will do —
    # the consume scan stops on the plateau cause before using them
    valid = valid | ~jnp.any(valid)
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
