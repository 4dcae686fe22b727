"""Top-level ``results`` module for reference namespace parity
(``dynesty/results.py``): the :class:`Results` container and the default
progress printer live under ``dynesty_tpu.results`` exactly as they do
under ``dynesty.results``."""

from .utils.results import Results, RunRecord, results_substitute
from .utils.misc import print_fn

__all__ = ["Results", "RunRecord", "results_substitute", "print_fn"]
