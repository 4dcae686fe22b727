"""Shells ncall-gap instrumentation (round-5, VERDICT item 4).

Runs the 2-D Gaussian-shells row (nlive=1000, multi/unif, dlogz=0.05)
with ``save_bounds=True`` on ours and on the reference at the same seed,
then prints one line per saved bound: the bound index, the number of
ellipsoids, the union log-volume, and the ncall accumulated since the
previous refit.  The comparison localizes WHERE the +15% mean-ncall gap
comes from: a looser decomposition (higher logvol at matched depth) vs
a staler refit cadence (larger ncall-per-refit bursts).

Usage:
  python examples/shells_probe.py ours [seed]
  python examples/shells_probe.py ref  [seed]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(rec):
    print(json.dumps(rec), flush=True)


def _bound_stats(b):
    """(nells, union logvol) for a saved bound, both implementations
    (ours stores per-ellipsoid ``logvols``; the reference
    ``logvol_ells`` — both keep the union logsumexp in ``logvol``)."""
    logvols = getattr(b, "logvols", getattr(b, "logvol_ells", None))
    if logvols is not None:
        m = np.max(logvols)
        return len(logvols), float(m + np.log(np.sum(np.exp(
            np.asarray(logvols) - m))))
    logvol = getattr(b, "logvol", None)
    if logvol is not None:
        return 1, float(logvol)
    return 0, float("nan")


def run_ours(seed):
    import dynesty_tpu as dytpu
    from dynesty_tpu.models import GaussianShells

    prob = GaussianShells()
    s = dytpu.NestedSampler(prob.loglike, prob.ptform, 2, nlive=1000,
                            bound="multi", sample="unif", queue_size=256,
                            rstate=np.random.Generator(
                                np.random.PCG64(seed)))
    s.run_nested(dlogz=0.05, print_progress=False, save_bounds=True)
    _emit({"impl": "ours", "seed": seed,
           "nc_waste": int(getattr(s, "nc_waste_total", 0)),
           "n_dispatch": int(s.timings.get("n_dispatch", 0)),
           "n_refit": int(s.timings.get("n_refit", 0))})
    return s.results, s.bound_list


def run_ref(seed):
    sys.path.insert(0, "/tmp/refpkg")
    if not os.path.exists("/tmp/refpkg/dynesty"):
        import shutil
        shutil.copytree("/root/reference/py/dynesty", "/tmp/refpkg/dynesty")
        init = "/tmp/refpkg/dynesty/__init__.py"
        src = open(init).read()
        src = src.replace(
            "except PackageNotFoundError:\n    # package is not installed"
            "\n    pass",
            "except PackageNotFoundError:\n    __version__ = '3.0.0'")
        open(init, "w").write(src)
    import dynesty as refdy

    # the reference's ``bound_list`` appends the LIVE bound object
    # (``sampler.py:672``), so by run end every entry aliases the final
    # bound; snapshot the deepcopy that ``update_bound`` already makes
    snaps = []
    orig_update = refdy.sampler.Sampler.update_bound

    def patched(self, subset=slice(None)):
        snap = orig_update(self, subset=subset)
        snaps.append(snap)
        return snap

    refdy.sampler.Sampler.update_bound = patched

    r, w = 2.0, 0.1
    c1 = np.array([-3.5, 0.0])
    c2 = np.array([3.5, 0.0])
    lnorm = -np.log(np.sqrt(2.0 * np.pi) * w)

    def _shell(x, c):
        d = np.linalg.norm(x - c)
        return -((d - r) ** 2) / (2.0 * w ** 2) + lnorm

    def loglike(x):
        return np.logaddexp(_shell(x, c1), _shell(x, c2))

    def ptform(u):
        return 6.0 * (2.0 * u - 1.0)

    s = refdy.NestedSampler(loglike, ptform, 2, nlive=1000,
                            bound="multi", sample="unif",
                            rstate=np.random.Generator(
                                np.random.PCG64(seed)))
    s.run_nested(dlogz=0.05, print_progress=False, save_bounds=True)
    return s.results, [s.bound_list[0]] + snaps

def main():
    impl = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 56432
    res, bounds = run_ours(seed) if impl == "ours" else run_ref(seed)
    ncall = np.asarray(res.ncall)
    biter = np.asarray(res.bound_iter)
    logl = np.asarray(res.logl)
    total = int(ncall.sum())
    for i, b in enumerate(bounds):
        sel = biter == i
        n_ells, lv = _bound_stats(b)
        first = int(np.argmax(sel)) if sel.any() else -1
        _emit({"impl": impl, "seed": seed, "bound": i,
               "nells": n_ells, "logvol": round(lv, 3),
               "ncall_in": int(ncall[sel].sum()),
               "n_iters": int(sel.sum()),
               "logl_first": (round(float(logl[first]), 3)
                              if first >= 0 else None)})
    _emit({"impl": impl, "seed": seed, "total_ncall": total,
           "n_bounds": len(bounds), "logz": round(float(res.logz[-1]), 3)})


if __name__ == "__main__":
    main()
