"""Batched FM-index query ops over the 16-ary wavelet-tree layout.

Same op surface as ``seal_tpu.ops.fm_ops`` (the Psi layout), so the fused
constrained decoder runs unchanged on either index.  A level query is ONE
contiguous 48-word gather (interleaved rank directory + packed 4-bit codes,
see ``seal_tpu/index/wavelet.py``) plus a SWAR nibble-match and
``lax.population_count`` on the VPU; a symbol rank/access descends
``digits`` (= symbol_bits/4) sequential levels -- the dependent-gather
chain that sets the latency floor, halved vs the 4-ary design.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from seal_tpu.index.fm_index import SHIFT
from seal_tpu.index.wavelet import (
    BUCKET_DEPTH,
    CODE_WORDS,
    DIGIT_BITS,
    RADIX,
    WORDS_PER_BLOCK,
    WaveletFMIndex,
    heap_base,
)
from seal_tpu.ops import _generic

# bit 0 of each nibble.  A NUMPY scalar on purpose: a module-level
# ``jnp.uint32`` is a live jax.Array that every traced wavelet program
# captures as a jaxpr *const* (prepended executable parameter), and under
# jax 0.9.0 the C++ fast-path replay of such programs mismatches the stored
# const list after another signature of the same jit wrapper is traced
# ("Executable expected parameter 0 of size 4..." -- see
# tests/test_decode_modes.py::test_signature_change_replay).  A numpy
# scalar is baked into the HLO as a literal instead.
_ONES = np.uint32(0x11111111)


def _load_block(index: WaveletFMIndex, level: int, pos):
    """The 48 interleaved words of ``pos``'s block: [..., 48] uint32.

    MUST stay a whole-row ``jnp.take`` along the block axis: XLA lowers it
    to a sliced gather that moves the 48-word block per index, where the
    equivalent elementwise ``base[..., None] + arange(48)`` indexing
    gathers 48 scalars per index -- measured 10-30x slower on v5e.
    """
    return jnp.take(index.blocks[level], pos >> 8, axis=0)


def _match_nibbles(w, d):
    """Per code word, bitmask (at nibble-low positions) of rows whose
    4-bit digit == d: XOR against the broadcast digit, then OR-reduce each
    nibble's 4 bits down to bit 0 -- a zero nibble (= a match) leaves its
    low bit clear, so the complement under the 0x11111111 lane mask marks
    matches exactly (no SWAR borrow hazards)."""
    codes = w[..., RADIX:WORDS_PER_BLOCK]
    x = codes ^ (d[..., None].astype(jnp.uint32) * _ONES)
    y = x | (x >> 2)
    y = y | (y >> 1)
    return ~y & _ONES


def _rank_from_block(w, pos, d):
    """Count of digit ``d`` in the level sequence before ``pos``, given the
    block words ``w`` (= _load_block at pos)."""
    base = jnp.take_along_axis(w, d[..., None].astype(jnp.int32), axis=-1)[..., 0]
    match = _match_nibbles(w, d)
    within = pos & (jnp.int32(1 << 8) - 1)
    word_idx = within >> 3
    bit_lim = ((within & 7) << 2).astype(jnp.uint32)
    lane = jnp.arange(CODE_WORDS, dtype=jnp.int32)
    partial = match & ((jnp.uint32(1) << bit_lim[..., None]) - 1)
    counts = jnp.where(
        lane < word_idx[..., None],
        lax.population_count(match),
        jnp.where(lane == word_idx[..., None], lax.population_count(partial), 0),
    )
    return base.astype(jnp.int32) + counts.sum(-1).astype(jnp.int32)


def _rank_digit(index: WaveletFMIndex, level: int, pos, d):
    return _rank_from_block(_load_block(index, level, pos), pos, d)


def _digit_at(w, pos):
    """The 4-bit code of row ``pos`` from its block words."""
    within = pos & 255
    word = jnp.take_along_axis(
        w, (RADIX + (within >> 3))[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return ((word >> ((within & 7) << 2).astype(jnp.uint32)) & 15).astype(jnp.int32)


def rank(index: WaveletFMIndex, symbol, pos):
    """Occ(symbol, pos) for *shifted* symbols; 16-ary wavelet descent."""
    symbol = jnp.asarray(symbol, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    valid = (symbol >= 0) & (symbol < index.sigma)
    c = jnp.where(valid, symbol, 0)
    L = index.digits
    p = jnp.broadcast_to(pos, c.shape)
    for lvl in range(L):
        node = heap_base(lvl) + (c >> (DIGIT_BITS * (L - lvl)))
        start = index.node_start[node]
        d = (c >> (DIGIT_BITS * (L - 1 - lvl))) & 15
        cnt0 = jnp.take_along_axis(
            index.node_cnt[node], d[..., None], axis=-1
        )[..., 0]
        p = _rank_digit(index, lvl, start + p, d) - cnt0
    return jnp.where(valid, p, 0)


def access(index: WaveletFMIndex, rows):
    """BWT symbol (shifted) at the given rows; 16-ary wavelet descent."""
    rows = jnp.asarray(rows, jnp.int32)
    ok = (rows >= 0) & (rows < index.n_rows)
    p = jnp.where(ok, rows, 0)
    c = jnp.zeros_like(p)
    L = index.digits
    for lvl in range(L):
        node = heap_base(lvl) + c
        start = index.node_start[node]
        x = start + p
        w = _load_block(index, lvl, x)
        d = _digit_at(w, x)
        cnt0 = jnp.take_along_axis(
            index.node_cnt[node], d[..., None], axis=-1
        )[..., 0]
        p = _rank_from_block(w, x, d) - cnt0
        c = (c << DIGIT_BITS) | d
    return jnp.where(ok, c, 0)


def backward_step(index: WaveletFMIndex, token, lo, hi):
    """One backward-search step, half-open [lo, hi), *unshifted* token."""
    token = jnp.asarray(token, jnp.int32)
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    c = token + SHIFT
    valid = (c >= 1) & (c < index.sigma)
    safe_c = jnp.where(valid, c, 0)
    base = index.C[safe_c]
    pos = jnp.stack([jnp.broadcast_to(lo, safe_c.shape),
                     jnp.broadcast_to(hi, safe_c.shape)], 0)
    r = rank(index, jnp.stack([safe_c, safe_c], 0), pos)
    new_lo = jnp.where(valid, base + r[0], 0)
    new_hi = jnp.where(valid, base + r[1], 0)
    new_hi = jnp.maximum(new_lo, new_hi)
    return new_lo.astype(jnp.int32), new_hi.astype(jnp.int32)


def bwt_at(index: WaveletFMIndex, rows):
    """BWT symbols at rows, *unshifted* (sentinel -> -1).

    Hybrid mode (``index.bwt`` present): one direct gather -- the 4-level
    descent is ~4x slower for window enumeration (measured round 3), and
    the raw array costs only 2 B/token.
    """
    if index.bwt is not None:
        rows = jnp.asarray(rows, jnp.int32)
        return index.bwt[rows].astype(jnp.int32) - SHIFT
    return access(index, rows).astype(jnp.int32) - SHIFT


def range_for_sequences(index: WaveletFMIndex, tokens, lengths):
    return _generic.range_for_sequences(backward_step, index, tokens, lengths)


def count_sequences(index: WaveletFMIndex, tokens, lengths):
    lo, hi = range_for_sequences(index, tokens, lengths)
    return hi - lo


def window_continuations(index: WaveletFMIndex, lo, hi, window: int):
    return _generic.window_continuations(bwt_at, index, lo, hi, window)


def validate_tokens(index: WaveletFMIndex, tokens, lo, hi):
    return _generic.validate_tokens(backward_step, index, tokens, lo, hi)


def contains_tokens(index: WaveletFMIndex, tokens, lo, hi):
    """Membership test (== ``validate_tokens(...) > 0``).  The wavelet
    layout has no select path, so this is the plain two-bound rank."""
    return _generic.validate_tokens(backward_step, index, tokens, lo, hi) > 0


def extend_ranges(index: WaveletFMIndex, tokens, lo, hi):
    return backward_step(index, tokens, lo, hi)


def _bucket_digits(index: WaveletFMIndex) -> int:
    return min(BUCKET_DEPTH // DIGIT_BITS, index.digits)


def bucket_counts_width(index: WaveletFMIndex) -> int:
    """Static width of ``bucket_counts`` output (for loop-carried buffers)."""
    return 1 << (DIGIT_BITS * _bucket_digits(index))


def bucket_counts(index: WaveletFMIndex, lo, hi):
    """Exact per-bucket counts of BWT[lo:hi) by wavelet interval bisection.

    Descends ``BUCKET_DEPTH/4`` 16-ary levels tracking the interval through
    every prefix node: the wavelet tree is its own bucket structure, no
    auxiliary table.  Returns int32 [..., 16^depth] where bucket b spans
    shifted symbols with top bits == b (bucket_size = ``bucket_size_of``).
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    depth = _bucket_digits(index)
    plo = lo[..., None]  # [..., nodes] bounds within each node's sequence
    phi = hi[..., None]
    for lvl in range(depth):
        nodes = heap_base(lvl) + jnp.arange(1 << (DIGIT_BITS * lvl), dtype=jnp.int32)
        start = index.node_start[nodes]
        cnt0 = index.node_cnt[nodes]  # [nodes, 16]
        w_lo = _load_block(index, lvl, start + plo)
        w_hi = _load_block(index, lvl, start + phi)
        child_lo, child_hi = [], []
        for v in range(RADIX):
            d = jnp.full(plo.shape, v, jnp.int32)
            child_lo.append(_rank_from_block(w_lo, start + plo, d) - cnt0[..., v])
            child_hi.append(_rank_from_block(w_hi, start + phi, d) - cnt0[..., v])
        plo = jnp.stack(child_lo, -1).reshape(lo.shape + (RADIX << (DIGIT_BITS * lvl),))
        phi = jnp.stack(child_hi, -1).reshape(hi.shape + (RADIX << (DIGIT_BITS * lvl),))
    return jnp.maximum(phi - plo, 0).astype(jnp.int32)


def bucket_size_of(index: WaveletFMIndex) -> int:
    """Shifted-symbol span per bucket_counts bucket."""
    return 1 << (DIGIT_BITS * (index.digits - _bucket_digits(index)))


def dense_counts(index: WaveletFMIndex, lo, hi, chunk: int = 4096):
    return _generic.dense_counts(validate_tokens, index, lo, hi, chunk)
