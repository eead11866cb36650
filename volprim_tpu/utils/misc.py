"""Misc utilities (reference: /root/reference/volprim/utils.py)."""

from __future__ import annotations

import time
from contextlib import contextmanager

import numpy as np


def concatenate_images(images) -> np.ndarray:
    """Side-by-side concat of same-height images (reference
    concatenate_tensors, utils.py:15-32), for batch-sensor reference images."""
    return np.concatenate([np.asarray(im) for im in images], axis=1)


@contextmanager
def time_operation(label: str):
    """utils.py:34-47."""
    t0 = time.perf_counter()
    yield
    print(f"{label}: {(time.perf_counter() - t0) * 1e3:.1f} ms")


# Reference-compatible alias (volprim.utils.concatenate_tensors).
concatenate_tensors = concatenate_images
