"""Double-single ("df64") arithmetic: emulate ~48-bit-mantissa addition with
pairs of float32, TPU-natively (no software float64).

The reference unigram DP accumulates float32 token scores in a C++ double
(FATokenSegmentationTools_1best_t.h:129-140).  Plain float32 accumulation
flips Viterbi decisions on near-ties, so we track (hi, lo) compensated sums —
Knuth two-sum, error-free for each step."""

from __future__ import annotations

import jax.numpy as jnp


def two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def df_add(hi, lo, f):
    """(hi, lo) + f32 -> normalized (hi, lo)."""
    s, e = two_sum(hi, f)
    e = e + lo
    hi2, lo2 = two_sum(s, e)
    return hi2, lo2


def df_lt(a_hi, a_lo, b_hi, b_lo):
    """a < b for df64 pairs."""
    return (a_hi < b_hi) | ((a_hi == b_hi) & (a_lo < b_lo))
