"""TPU duty-cycle probe: the heavy-likelihood bench row without the
reference measurement — fast feedback for dispatch-pipeline work.

Prints the run wall-clock, whole-run and steady-state duty cycles and
the full Timings dict, plus inter-dispatch gap marks.

Usage: python examples/duty_probe.py [nlive] [rounds] [queue]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    import dynesty_tpu as dytpu

    nlive = int(sys.argv[1]) if len(sys.argv) > 1 else bench.H_NLIVE
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else bench.H_ROUNDS
    queue = int(sys.argv[3]) if len(sys.argv) > 3 else bench.QUEUE

    loglike = bench._heavy_loglike_jax()
    warm = dytpu.NestedSampler(loglike, bench._heavy_ptform, bench.H_NDIM,
                               nlive=nlive, bound="multi", sample="unif",
                               rstate=np.random.Generator(
                                   np.random.PCG64(1)),
                               queue_size=queue,
                               rounds_per_dispatch=rounds)
    warm.run_nested(print_progress=False)

    rstate = np.random.Generator(np.random.PCG64(bench.SEED))
    t0 = time.time()
    s = dytpu.NestedSampler(loglike, bench._heavy_ptform, bench.H_NDIM,
                            nlive=nlive, bound="multi", sample="unif",
                            rstate=rstate, queue_size=queue,
                            rounds_per_dispatch=rounds)
    s.run_nested(print_progress=False)
    elapsed = time.time() - t0
    res = s.results
    ncall = int(s.ncall)
    ceiling = bench._measure_device_ceiling(loglike, queue)
    duty_steady, n_window = bench._steady_state_duty(s.timings, ceiling)
    marks = s.timings.get("disp_marks", [])
    gaps = [round((marks[i][0] - marks[i - 1][0]) * 1e3, 1)
            for i in range(1, len(marks))]
    out = {
        "nlive": nlive, "rounds": rounds, "queue": queue,
        "wall_s": round(elapsed, 3),
        "ncall": ncall,
        "logz": round(float(res.logz[-1]), 3),
        "logz_pull": round(float(
            (res.logz[-1] - bench.H_TRUTH) / res.logzerr[-1]), 2),
        "evals_per_s": round(ncall / elapsed, 1),
        "ceiling": round(ceiling, 1),
        "duty_cycle": round(ncall / elapsed / ceiling, 4),
        "duty_cycle_steady": (round(duty_steady, 4)
                              if duty_steady is not None else None),
        "steady_window_dispatches": n_window,
        "gaps_ms": gaps,
        "nc_per_mark": [m[1] for m in marks],
        "timings": bench._round_timings(s.timings),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
