"""Batched FM-index query ops over the wavelet-tree layout.

Same op surface as ``seal_tpu.ops.fm_ops`` (the Psi layout), so the fused
constrained decoder runs unchanged on either index.  Every rank1 is one
rank-table gather + one 4-word slice gather + ``lax.population_count`` on
the VPU; a symbol rank/access descends ``levels`` bit-planes sequentially
(the latency cost of the ~2.6x memory saving -- see
``seal_tpu/index/wavelet.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from seal_tpu.index.fm_index import SHIFT
from seal_tpu.index.wavelet import BUCKET_DEPTH, WaveletFMIndex
from seal_tpu.ops import _generic


def _rank1(index: WaveletFMIndex, level: int, pos):
    """Ones in bits[level][0:pos).  ``pos`` int32 [...], any batch shape."""
    pos = jnp.asarray(pos, jnp.int32)
    blk = pos >> 7
    base = index.rank128[level, blk].astype(jnp.int32)
    word0 = blk << 2
    w = index.bits[level, word0[..., None] + jnp.arange(4, dtype=jnp.int32)]
    within = pos & 127
    word_idx = within >> 5
    bit_idx = within & 31
    lane = jnp.arange(4, dtype=jnp.int32)
    # popcount of full words before the position's word, plus the partial
    full_mask = lane < word_idx[..., None]
    part_mask = lane == word_idx[..., None]
    partial_bits = w & ((jnp.uint32(1) << bit_idx[..., None].astype(jnp.uint32)) - 1)
    counts = jnp.where(
        full_mask,
        lax.population_count(w),
        jnp.where(part_mask, lax.population_count(partial_bits), 0),
    )
    return base + counts.sum(-1).astype(jnp.int32)


def rank(index: WaveletFMIndex, symbol, pos):
    """Occ(symbol, pos) for *shifted* symbols; wavelet descent."""
    symbol = jnp.asarray(symbol, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    valid = (symbol >= 0) & (symbol < index.sigma)
    c = jnp.where(valid, symbol, 0)
    L = index.levels
    p = jnp.broadcast_to(pos, c.shape)
    for lvl in range(L):
        node = ((1 << lvl) - 1) + (c >> (L - lvl))
        start = index.node_start[node]
        start_ones = index.node_ones[node]
        b = (c >> (L - 1 - lvl)) & 1
        ones = _rank1(index, lvl, start + p) - start_ones
        p = jnp.where(b == 1, ones, p - ones)
    return jnp.where(valid, p, 0)


def access(index: WaveletFMIndex, rows):
    """BWT symbol (shifted) at the given rows; wavelet descent."""
    rows = jnp.asarray(rows, jnp.int32)
    ok = (rows >= 0) & (rows < index.n_rows)
    p = jnp.where(ok, rows, 0)
    c = jnp.zeros_like(p)
    L = index.levels
    for lvl in range(L):
        node = ((1 << lvl) - 1) + c
        start = index.node_start[node]
        start_ones = index.node_ones[node]
        x = start + p
        word = index.bits[lvl, x >> 5]
        bit = (word >> (x & 31).astype(jnp.uint32)).astype(jnp.int32) & 1
        ones = _rank1(index, lvl, x) - start_ones
        p = jnp.where(bit == 1, ones, p - ones)
        c = (c << 1) | bit
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
    """BWT symbols at rows, *unshifted* (sentinel -> -1)."""
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


def extend_ranges(index: WaveletFMIndex, tokens, lo, hi):
    return backward_step(index, tokens, lo, hi)


def bucket_counts_width(index: WaveletFMIndex) -> int:
    """Static width of ``bucket_counts`` output (for loop-carried buffers)."""
    return 1 << min(BUCKET_DEPTH, index.levels)


def bucket_counts(index: WaveletFMIndex, lo, hi):
    """Exact per-bucket counts of BWT[lo:hi) by wavelet interval bisection.

    Descends BUCKET_DEPTH levels tracking the interval through every prefix
    node: the wavelet tree is its own bucket structure, no auxiliary table.
    Returns int32 [..., 2^BUCKET_DEPTH] where bucket b spans shifted symbols
    with top BUCKET_DEPTH bits == b (i.e. bucket_size = 2^(levels - depth)).
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    depth = min(BUCKET_DEPTH, index.levels)
    # per-node interval bounds within the node's sequence, [..., 2^l, 2]
    plo = (lo - 0)[..., None]  # root node: positions are absolute
    phi = (hi - 0)[..., None]
    for lvl in range(depth):
        nodes = ((1 << lvl) - 1) + jnp.arange(1 << lvl, dtype=jnp.int32)
        start = index.node_start[nodes]
        start_ones = index.node_ones[nodes]
        ones_lo = _rank1(index, lvl, start + plo) - start_ones
        ones_hi = _rank1(index, lvl, start + phi) - start_ones
        left_lo, left_hi = plo - ones_lo, phi - ones_hi
        right_lo, right_hi = ones_lo, ones_hi
        # interleave children: node 2i (left), 2i+1 (right)
        plo = jnp.stack([left_lo, right_lo], -1).reshape(lo.shape + (2 << lvl,))
        phi = jnp.stack([left_hi, right_hi], -1).reshape(hi.shape + (2 << lvl,))
    return jnp.maximum(phi - plo, 0).astype(jnp.int32)


def bucket_size_of(index: WaveletFMIndex) -> int:
    """Shifted-symbol span per bucket_counts bucket."""
    depth = min(BUCKET_DEPTH, index.levels)
    return 1 << (index.levels - depth)


def dense_counts(index: WaveletFMIndex, lo, hi, chunk: int = 4096):
    return _generic.dense_counts(validate_tokens, index, lo, hi, chunk)
