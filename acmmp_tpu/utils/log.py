"""Structured logging and per-stage metrics.

The reference only prints ad-hoc progress lines (acmmp_definitions.cpp:252,
602-605, 1033); here every stage reports structured metrics (valid-depth
fraction, cost quantiles) and the profiler can be toggled with one env var
(ACMMP_TPU_PROFILE=<dir> wraps stages in jax.profiler traces)."""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

import numpy as np


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(f"acmmp_tpu.{name}")
    if not logging.getLogger("acmmp_tpu").handlers:
        root = logging.getLogger("acmmp_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        root.addHandler(handler)
        root.setLevel(os.environ.get("ACMMP_TPU_LOGLEVEL", "INFO"))
    return logger


def stage_metrics(log: logging.Logger, tag: str, depth: np.ndarray,
                  cost: np.ndarray) -> None:
    valid = float((depth > 0).mean())
    log.info(
        "%s: valid_depth=%.3f cost_p50=%.4f cost_p90=%.4f",
        tag, valid, float(np.median(cost)), float(np.percentile(cost, 90)),
    )


@contextmanager
def timed(log: logging.Logger, tag: str):
    t0 = time.time()
    yield
    log.info("%s took %.2fs", tag, time.time() - t0)


@contextmanager
def profiled(tag: str):
    """jax.profiler trace when ACMMP_TPU_PROFILE is set to a directory."""
    prof_dir = os.environ.get("ACMMP_TPU_PROFILE")
    if not prof_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(prof_dir, tag)):
        yield
