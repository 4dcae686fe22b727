"""Multimodal 2-D eggbox with multi-ellipsoid bounds (the reference's
``demos/Examples -- Eggbox.ipynb``; analytic logz = 235.856).

Run: python examples/eggbox.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dynesty_tpu as dytpu
from dynesty_tpu import plotting
from dynesty_tpu.models import Eggbox


def main():
    prob = Eggbox()
    sampler = dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                  nlive=1000, bound="multi",
                                  sample="unif", queue_size=256)
    sampler.run_nested(dlogz=0.01)
    res = sampler.results
    res.summary()
    print(f"truth: {prob.logz_truth:.3f}, "
          f"ellipsoids at the end: {sampler.bound.nells}")

    fig, _ = plotting.cornerpoints(res)
    fig.savefig("eggbox_points.png")
    print("wrote eggbox_points.png")


if __name__ == "__main__":
    main()
