"""Batched FM-index query ops over the 4-ary wavelet-tree layout.

Same op surface as ``seal_tpu.ops.fm_ops`` (the Psi layout), so the fused
constrained decoder runs unchanged on either index.  A level query is ONE
contiguous 12-word gather (interleaved rank directory + packed 2-bit codes,
see ``seal_tpu/index/wavelet.py``) plus ``lax.population_count`` on the
VPU; a symbol rank/access descends ``digits`` (= symbol_bits/2) levels
sequentially -- half the binary design's depth with ~4x less gathered data.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from seal_tpu.index.fm_index import SHIFT
from seal_tpu.index.wavelet import (
    BUCKET_DEPTH,
    WORDS_PER_BLOCK,
    WaveletFMIndex,
    heap_base,
)
from seal_tpu.ops import _generic

_EVEN = jnp.uint32(0x55555555)  # bits 0,2,4,... (the low bit of each code)


def _load_block(index: WaveletFMIndex, level: int, pos):
    """The 12 interleaved words of ``pos``'s block: [..., 12] uint32."""
    blk = (pos >> 7) * WORDS_PER_BLOCK
    return index.blocks[level, blk[..., None] + jnp.arange(WORDS_PER_BLOCK)]


def _match_words(w, d):
    """Per code word, bitmask (at even positions) of rows whose digit == d."""
    codes = w[..., 4:12]
    low = codes & _EVEN
    high = (codes >> 1) & _EVEN
    d = d[..., None]
    m_low = jnp.where((d & 1) == 1, low, low ^ _EVEN)
    m_high = jnp.where((d >> 1) == 1, high, high ^ _EVEN)
    return m_low & m_high


def _rank_from_block(w, pos, d):
    """Count of digit ``d`` in the level sequence before ``pos``, given the
    block words ``w`` (= _load_block at pos)."""
    base = jnp.take_along_axis(w, d[..., None].astype(jnp.int32), axis=-1)[..., 0]
    match = _match_words(w, d)
    within = pos & 127
    word_idx = within >> 4
    bit_lim = ((within & 15) << 1).astype(jnp.uint32)
    lane = jnp.arange(8, dtype=jnp.int32)
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
    """The 2-bit code of row ``pos`` from its block words."""
    within = pos & 127
    word = jnp.take_along_axis(
        w, (4 + (within >> 4))[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return ((word >> ((within & 15) << 1).astype(jnp.uint32)) & 3).astype(jnp.int32)


def rank(index: WaveletFMIndex, symbol, pos):
    """Occ(symbol, pos) for *shifted* symbols; 4-ary wavelet descent."""
    symbol = jnp.asarray(symbol, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    valid = (symbol >= 0) & (symbol < index.sigma)
    c = jnp.where(valid, symbol, 0)
    L = index.digits
    p = jnp.broadcast_to(pos, c.shape)
    for lvl in range(L):
        node = heap_base(lvl) + (c >> (2 * (L - lvl)))
        start = index.node_start[node]
        d = (c >> (2 * (L - 1 - lvl))) & 3
        cnt0 = jnp.take_along_axis(
            index.node_cnt[node], d[..., None], axis=-1
        )[..., 0]
        p = _rank_digit(index, lvl, start + p, d) - cnt0
    return jnp.where(valid, p, 0)


def access(index: WaveletFMIndex, rows):
    """BWT symbol (shifted) at the given rows; 4-ary wavelet descent."""
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
        c = (c << 2) | d
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


def _bucket_digits(index: WaveletFMIndex) -> int:
    return min(BUCKET_DEPTH // 2, index.digits)


def bucket_counts_width(index: WaveletFMIndex) -> int:
    """Static width of ``bucket_counts`` output (for loop-carried buffers)."""
    return 1 << (2 * _bucket_digits(index))


def bucket_counts(index: WaveletFMIndex, lo, hi):
    """Exact per-bucket counts of BWT[lo:hi) by wavelet interval bisection.

    Descends ``BUCKET_DEPTH/2`` 4-ary levels tracking the interval through
    every prefix node: the wavelet tree is its own bucket structure, no
    auxiliary table.  Returns int32 [..., 4^depth] where bucket b spans
    shifted symbols with top bits == b (bucket_size = ``bucket_size_of``).
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    depth = _bucket_digits(index)
    plo = lo[..., None]  # [..., nodes] bounds within each node's sequence
    phi = hi[..., None]
    for lvl in range(depth):
        nodes = heap_base(lvl) + jnp.arange(1 << (2 * lvl), dtype=jnp.int32)
        start = index.node_start[nodes]
        cnt0 = index.node_cnt[nodes]  # [nodes, 4]
        w_lo = _load_block(index, lvl, start + plo)
        w_hi = _load_block(index, lvl, start + phi)
        child_lo, child_hi = [], []
        for v in range(4):
            d = jnp.full(plo.shape, v, jnp.int32)
            child_lo.append(_rank_from_block(w_lo, start + plo, d) - cnt0[..., v])
            child_hi.append(_rank_from_block(w_hi, start + phi, d) - cnt0[..., v])
        plo = jnp.stack(child_lo, -1).reshape(lo.shape + (4 << (2 * lvl),))
        phi = jnp.stack(child_hi, -1).reshape(hi.shape + (4 << (2 * lvl),))
    return jnp.maximum(phi - plo, 0).astype(jnp.int32)


def bucket_size_of(index: WaveletFMIndex) -> int:
    """Shifted-symbol span per bucket_counts bucket."""
    return 1 << (2 * (index.digits - _bucket_digits(index)))


def dense_counts(index: WaveletFMIndex, lo, hi, chunk: int = 4096):
    return _generic.dense_counts(validate_tokens, index, lo, hi, chunk)
