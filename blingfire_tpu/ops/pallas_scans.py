"""Pallas TPU kernels for the sequential phases of the segmenters.

The XLA lax.scan formulation pays per-step dispatch overhead (several µs) for
steps that are only a handful of vector ops; fused Pallas loops run them as
straight VPU code.  Two primitives cover every scan in the tokenizers:

  claim_scan    — the BPE greedy non-overlap resolution: per arc, test two
                  bitmask positions and set a bit range.  The mask is a few
                  uint32 lanes per document; "gather a bit by position" is a
                  select chain over the mask words (no dynamic indexing).
  pointer_scan  — visited/emission walks: carry a per-document cursor, emit
                  where cursor == position, advance cursor by a per-position
                  target (max(t, p) + 1).

Kernels tile the batch dimension over the grid so VMEM blocks stay small;
CPU tests run the same kernels in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(x, tb):
    B = x.shape[0]
    pad = (-B) % tb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, B


# -------------------------------------------------------------------- claim


def _claim_kernel(
    W: int, N: int, start_ref, end_ref, valid_ref, len_ref, out_ref, mask_ref
):
    TB, A = start_ref.shape

    def bit_at(mask, q):
        wi = q // 32
        bi = (q % 32).astype(jnp.uint32)
        word = jnp.zeros((TB,), jnp.uint32)
        for w in range(W):
            word = jnp.where(wi == w, mask[:, w], word)
        return ((word >> bi) & 1) == 1

    def subm(nb):
        nbs = jnp.minimum(jnp.clip(nb, 0, 32), 31).astype(jnp.uint32)
        return jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nbs) - 1)

    lens = len_ref[:, 0]
    out_ref[:, :] = jnp.zeros((TB, A), jnp.bool_)
    # arcs are sorted valid-first: iterate only to this tile's max arc count
    limit = jnp.max(jnp.sum(valid_ref[:, :], axis=1)).astype(jnp.int32)

    def cond(st):
        a, _m = st
        return a < limit

    def body(st):
        a, mask = st
        stt = start_ref[:, a]
        en = end_ref[:, a]
        vd = valid_ref[:, a] != 0
        free1 = ~bit_at(mask, jnp.clip(stt, 0, N))
        free2 = (en + 1 >= lens) | ~bit_at(mask, jnp.clip(en + 1, 0, N))
        claim = vd & free1 & free2
        cols = []
        for w in range(W):
            lo = jnp.clip(stt + 1 - 32 * w, 0, 32)
            hi = jnp.clip(en + 1 - 32 * w, 0, 32)
            bits = subm(hi) & ~subm(lo)
            cols.append(jnp.where(claim, mask[:, w] | bits, mask[:, w]))
        out_ref[:, a] = claim
        return (a + 1, jnp.stack(cols, axis=1))

    _, final_mask = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((TB, W), jnp.uint32))
    )
    mask_ref[:, :] = final_mask


def claim_scan(s_start, s_end, s_valid, lengths, n_positions: int):
    """Greedy claim over sorted arcs.  Shapes: (B, A) + (B,) -> (B, A) bool."""
    B0, A = s_start.shape
    W = (n_positions + 1 + 31) // 32
    tb = min(TILE_B, B0)
    s_start, _ = _pad_rows(s_start, tb)
    s_end, _ = _pad_rows(s_end, tb)
    s_valid, _ = _pad_rows(s_valid.astype(jnp.int32), tb)
    lens2, _ = _pad_rows(lengths[:, None], tb)
    B = s_start.shape[0]
    kernel = functools.partial(_claim_kernel, W, n_positions)
    out, mask = pl.pallas_call(
        kernel,
        grid=(B // tb,),
        out_shape=(
            jax.ShapeDtypeStruct((B, A), jnp.bool_),
            jax.ShapeDtypeStruct((B, W), jnp.uint32),
        ),
        in_specs=[
            pl.BlockSpec((tb, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(s_start, s_end, s_valid, lens2)
    return out[:B0], mask[:B0]


# ------------------------------------------------------------- pointer scan


def _pointer_kernel(targets_ref, valid_ref, out_ref):
    TB, N = targets_ref.shape

    def body(p, cur):
        t = targets_ref[:, p]
        em = (cur == p) & (valid_ref[:, p] != 0)
        out_ref[:, p] = em
        return jnp.where(em, jnp.maximum(t, p) + 1, cur)

    jax.lax.fori_loop(0, N, body, jnp.zeros((TB,), jnp.int32))


def pointer_scan(targets, valid):
    """Cursor walk: emit[p] = visited; cursor jumps to max(targets[p], p)+1.
    Shapes: (B, N) int32 + (B, N) bool -> (B, N) bool."""
    B0, N = targets.shape
    tb = min(TILE_B, B0)
    targets, _ = _pad_rows(targets, tb)
    valid, _ = _pad_rows(valid.astype(jnp.int32), tb)
    B = targets.shape[0]
    out = pl.pallas_call(
        _pointer_kernel,
        grid=(B // tb,),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.bool_),
        in_specs=[
            pl.BlockSpec((tb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(targets, valid)
    return out[:B0]
