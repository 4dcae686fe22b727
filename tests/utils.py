"""Shared test helpers (mirrors the reference ``tests/utils.py``)."""

import os

import numpy as np


def get_rstate(seed=None):
    if seed is None:
        seed = int(os.environ.get("DYNESTY_TEST_RANDOMSEED", 56432))
    return np.random.Generator(np.random.PCG64(seed))


def get_printing():
    return bool(int(os.environ.get("DYNESTY_TEST_PRINTING", 0)))
