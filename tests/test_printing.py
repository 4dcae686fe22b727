"""Progress-printing tests (reference ``tests/test_printing.py``): both
the tqdm and the raw-stderr fallback printers must work, and the ETA
estimator must extrapolate the dlogz trend sensibly."""

import numpy as np
import jax.numpy as jnp

import dynesty_tpu as dytpu
from dynesty_tpu.utils.misc import EtaEstimator, print_fn, get_print_func

from utils import get_rstate

NDIM = 2
LNORM = -0.5 * np.log(2 * np.pi) * NDIM


def loglike(x):
    return -0.5 * jnp.sum(x * x) + LNORM


def ptform(u):
    return 10.0 * (2.0 * u - 1.0)


def _run(print_func=None):
    rstate = get_rstate()
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=60,
                            bound="single", sample="unif", rstate=rstate,
                            queue_size=16)
    s.run_nested(print_progress=True, print_func=print_func, maxiter=300)
    return s


def test_printing_tqdm(capsys):
    _run()
    err = capsys.readouterr().err
    assert "logz" in err or "it" in err


def test_printing_fallback(capsys):
    _run(print_func=print_fn)
    err = capsys.readouterr().err
    assert "logz:" in err
    assert "eff(%)" in err


def test_get_print_func_silent():
    pbar, fn = get_print_func(None, False)
    assert pbar is None
    fn(None, 0, 0)  # no-op must swallow anything


def test_eta_estimator_static():
    eta = EtaEstimator()
    # geometric decay: delta_logz halves every 50 iterations
    rem_prev = None
    for i, n in enumerate(range(0, 500, 50)):
        delta = 100.0 * 0.5 ** i
        rem = eta.remaining_iters(n, delta, 0.01)
    # at delta=100*0.5^9~0.2, ~4.3 halvings to 0.01 => ~215 iters
    assert rem is not None
    assert 100 < rem < 400
    # already converged => 0 remaining
    assert eta.remaining_iters(500, 0.005, 0.01) == 0


def test_fallback_eta_per_run(monkeypatch, capsys):
    """Two consecutive runs through the fallback printer must not share
    ETA history (regression: module-global EtaEstimator)."""
    import dynesty_tpu.utils.misc as miscmod

    class _NoTqdm:
        def __init__(self):
            raise ImportError("forced")

    monkeypatch.setattr(miscmod, "_TqdmPrinter", _NoTqdm)
    pbar1, fn1 = miscmod.get_print_func(None, True)
    pbar2, fn2 = miscmod.get_print_func(None, True)
    assert pbar1 is None and pbar2 is None
    assert fn1 is not fn2
    assert fn1.eta is not fn2.eta
    # drive history into the first run's estimator
    for i, n in enumerate(range(0, 300, 50)):
        fn1.eta.remaining_iters(n, 100.0 * 0.5 ** i, 0.01)
    assert len(fn1.eta.history) > 0
    # the second run starts clean
    assert fn2.eta.history == []
    # and the fallback printer still renders a full status line
    _run(print_func=fn2)
    assert "logz:" in capsys.readouterr().err


def test_print_fn_signature_parity(capsys):
    """Reference-style positional calls bind add_live_it (not pbar) as
    the 4th argument (reference ``utils.py:502-511``), and an
    unconverged margin (> 1e6) prints as inf."""
    from types import SimpleNamespace

    from dynesty_tpu.utils.misc import get_print_fn_args

    res = SimpleNamespace(loglstar=-1.0, logz=-5.0, logzvar=0.01,
                          delta_logz=3e7, bounditer=1, nc=2, eff=25.0)
    # 4th positional = add_live_it; must not be bound to pbar
    print_fn(res, 10, 100, 3, 0.01)
    err = capsys.readouterr().err
    assert "+3" in err
    args = get_print_fn_args(res, 10, 100, dlogz=0.01)
    assert any("inf" in s for s in args.long_str)
    # only the long tier carries the iteration prefix
    assert not any(s.startswith("i:") for s in args.mid_str)


def test_eta_estimator_batch():
    eta = EtaEstimator()
    # batch bracket [0, 10], loglstar crossed 25% after 100 iters
    rem = eta.remaining_iters(100, None, None, nbatch=1, loglstar=0.0,
                              logl_min=0.0, logl_max=10.0)
    assert rem is None  # no progress yet
    rem = eta.remaining_iters(200, None, None, nbatch=1, loglstar=2.5,
                              logl_min=0.0, logl_max=10.0)
    assert rem is not None
    assert 250 < rem < 350  # 100 iters for 25% => ~300 remaining
