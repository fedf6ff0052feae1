"""Quantized count store (SURVEY.md §1.1 / §2.13 M6).

Reference behavior: ``db/memory/MemoryQuantizedCountStore.scala`` [U]
stores context token counts as int16 codes into an exponentially-binned
codebook, roughly halving the context store (Daiber et al. 2013). The
exact binning base is PIN-AT-IMPLEMENTATION (SURVEY §2.9); we freeze
base=1.1 with exact codes for small counts, exposed as config.

code(c) = c                         for c <= EXACT_MAX
        = EXACT_MAX + round(log(c/EXACT_MAX)/log(BASE))   otherwise
value(k) = k                        for k <= EXACT_MAX
         = round(EXACT_MAX * BASE**(k-EXACT_MAX))         otherwise
"""

from __future__ import annotations

import math

import numpy as np

BASE = 1.1
EXACT_MAX = 16  # counts <= 16 are stored exactly (small counts dominate)


def quantize(count: int, base: float = BASE, exact_max: int = EXACT_MAX) -> int:
    if count <= exact_max:
        return max(count, 0)
    return exact_max + int(round(math.log(count / exact_max) / math.log(base)))


def dequantize(code: int, base: float = BASE, exact_max: int = EXACT_MAX) -> int:
    if code <= exact_max:
        return max(code, 0)
    return int(round(exact_max * base ** (code - exact_max)))


def make_codebook(max_code: int = 256, base: float = BASE, exact_max: int = EXACT_MAX) -> np.ndarray:
    """Dense code → count lookup table (int64), broadcastable."""
    return np.array([dequantize(k, base, exact_max) for k in range(max_code)], dtype=np.int64)


def quantize_array(counts: np.ndarray, base: float = BASE, exact_max: int = EXACT_MAX) -> np.ndarray:
    counts = np.asarray(counts, dtype=np.float64)
    small = counts <= exact_max
    codes = np.empty(counts.shape, dtype=np.int16)
    codes[small] = np.maximum(counts[small], 0).astype(np.int16)
    big = ~small
    codes[big] = (exact_max + np.round(np.log(counts[big] / exact_max) / math.log(base))).astype(np.int16)
    return codes
