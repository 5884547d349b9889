"""Compact device FM-index: a 16-ary wavelet tree over the BWT.

The default ``DeviceFMIndex`` trades memory for speed: Psi (4 B/token) makes
a rank query one binary search, and the explicit BWT (2 B/token) makes
window enumeration one gather -- ~7.6 B/token.  This module is the capacity
mode: the sdsl-equivalent wavelet-tree representation
(``csa_wt_int<>``, ``/root/reference/seal/cpp_modules/fm_index.cpp:19``)
rebuilt TPU-first.

Radix history: the original binary tree descended ``log2(sigma)`` (~16)
levels, each touching TWO gather streams -- gather-throughput-bound at 5.5x
the Psi layout's decode cost.  The 4-ary redesign (2-bit digits, 8 levels,
one interleaved 12-word block per level query) reached 27 q/s -- still 4x
off the Psi layout, and profiling showed the remaining cost is the
*sequential depth*: each level is a dependent HBM gather that cannot
overlap the next.  This 16-ary layout resolves FOUR symbol bits per level,
so BART's 16-bit alphabet descends **4** levels instead of 8, at the same
bytes/token:

* ``blocks`` -- uint32 [digits, n_blocks, 48]: per 256 rows, words 0..15 =
  cumulative counts of digit values 0..15 before the block (the rank
  directory), words 16..47 = the rows' 4-bit codes packed 8 per word.
  A rank of any digit value is one whole-block ROW gather (``jnp.take``
  along the block axis -- XLA moves the 48-word slice per index; the
  elementwise ``base + arange(48)`` formulation gathers 48 scalars per
  index and measured 10-30x slower on v5e) + a SWAR nibble-match and
  ``lax.population_count`` on the VPU.
* ``node_start`` / ``node_cnt`` -- per-node start offsets and start ranks
  (16-ary heap packing), so the descent needs no second rank query.

Memory: 48 words / 256 rows / level = 0.75 B/token/level -> **3.0 B/token**
at BART's 16-bit alphabet (identical to the 4-ary layout, ~2.5x less than
the fast layout) plus node tables (~4.5 MB at digits=5, 280 KB at 4).

Symbol rank descends ``digits`` levels; symbol access walks the same path
reading the stored codes; interval bucket counts (for the exact proposal
loop's pruning) come from bisecting the interval 2 digits deep -- the
wavelet tree IS the bucket structure, so no auxiliary table is shipped.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from seal_tpu.index.fm_index import FMIndex, SHIFT

BUCKET_DEPTH = 8  # bucket id width in BITS for bucket_counts (256 buckets)
DIGIT_BITS = 4  # bits resolved per level (16-ary)
RADIX = 1 << DIGIT_BITS
BLOCK_ROWS = 256
CODE_WORDS = BLOCK_ROWS * DIGIT_BITS // 32  # 32
WORDS_PER_BLOCK = RADIX + CODE_WORDS  # 16 count words + 32 code words


def heap_base(level: int) -> int:
    """Start of level ``level`` in the 16-ary node heap: sum of 16^j, j<level."""
    return ((1 << (DIGIT_BITS * level)) - 1) // (RADIX - 1)


@struct.dataclass
class WaveletFMIndex:
    blocks: Any  # uint32 [digits, n_blocks, 48]  interleaved counts+codes
    node_start: Any  # int32 [heap]  level-l node v at heap_base(l)+v
    node_cnt: Any  # int32 [heap, 16]  per-digit start ranks of each node
    C: Any  # int32 [sigma_bound+1]
    beginnings: Any  # int32 [n_docs+1]
    corpus_counts: Any  # int32 [vocab]

    n_rows: int = struct.field(pytree_node=False)
    digits: int = struct.field(pytree_node=False)  # 4-bit digits per symbol
    sigma: int = struct.field(pytree_node=False)  # true corpus alphabet size
    vocab: int = struct.field(pytree_node=False)
    n_docs: int = struct.field(pytree_node=False)
    # HYBRID mode: the raw shifted BWT (uint16/uint32 [n_rows]) alongside the
    # wavelet tree.  Rank ops (validate/extend/buckets) descend the wavelet
    # -- 4 dependent block gathers, FASTER than the Psi binary search's ~12
    # (measured round 3) -- while window enumeration reads this array in one
    # gather instead of a 4-level descent.  +2 B/token over compact (5.0
    # B/token total) but still 1.5x smaller than the Psi layout's 7.6, and
    # faster than both on the decode hot path.
    bwt: Any = None

    @property
    def levels(self) -> int:
        """Symbol width in bits (4 per descent level)."""
        return DIGIT_BITS * self.digits

    @property
    def n_tokens(self) -> int:
        return self.n_rows - 1

    def memory_bytes(self) -> int:
        return sum(
            a.size * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(self)
            if hasattr(a, "dtype")
        )

    def full_range(self, shape=()):
        lo = jnp.zeros(shape, dtype=jnp.int32)
        hi = jnp.full(shape, self.n_rows, dtype=jnp.int32)
        return lo, hi

    @classmethod
    def from_host(
        cls, index: FMIndex, vocab: int | None = None, keep_bwt: bool = False
    ) -> "WaveletFMIndex":
        n = index.size()
        if n >= 2**31:
            # node offsets / ranks are int32 on device; larger corpora must
            # shard (parallel/sharded_index.py) -- single-chip uint32 row
            # plumbing is a pervasive hazard with x64 disabled (BASELINE.md)
            raise ValueError("corpora >= 2^31 rows need the sharded index")
        bwt = np.asarray(index.bwt, np.int64)
        sigma = int(index.C.size - 1)
        if vocab is None:
            vocab = max(sigma - SHIFT, 1)
        sigma_bound = max(int(vocab) + SHIFT, sigma, 2)
        bits = math.ceil(math.log2(sigma_bound))
        digits = max(1, -(-bits // DIGIT_BITS))

        n_blocks = (n >> 8) + 1
        blocks = np.zeros((digits, n_blocks, WORDS_PER_BLOCK), np.uint32)
        heap = heap_base(digits)
        node_start = np.zeros(heap, np.int64)
        node_cnt = np.zeros((heap, RADIX), np.int64)

        seq = bwt  # level-l sequence: symbols stably grouped by l-digit prefix
        pad_rows = n_blocks * BLOCK_ROWS - n
        blk_of = np.arange(n) >> 8
        for lvl in range(digits):
            d = ((seq >> (DIGIT_BITS * (digits - 1 - lvl))) & 15).astype(np.uint8)
            # code words: 4-bit values little-endian, 8 rows per word
            dp = np.concatenate([d, np.zeros(pad_rows, np.uint8)])
            bits_mat = np.empty(dp.size * 4, np.uint8)
            for b in range(4):
                bits_mat[b::4] = (dp >> b) & 1
            codes = np.packbits(bits_mat, bitorder="little").view("<u4")
            codes = codes.reshape(n_blocks, CODE_WORDS)
            # cumulative per-digit counts at block starts
            hist = np.bincount(blk_of * RADIX + d, minlength=n_blocks * RADIX)
            hist = hist.reshape(n_blocks, RADIX)
            cum = np.zeros((n_blocks, RADIX), np.int64)
            cum[1:] = np.cumsum(hist, axis=0)[:-1]
            blocks[lvl, :, :RADIX] = cum.astype(np.uint32)
            blocks[lvl, :, RADIX:] = codes
            # node tables: prefix-grouped starts + their per-digit start ranks.
            # node_cnt[v, dig] = # of digit `dig` before node v's start == the
            # exclusive node-axis cumsum of the per-(node, digit) histogram.
            prefix = seq >> (DIGIT_BITS * (digits - lvl))
            n_nodes = 1 << (DIGIT_BITS * lvl)
            counts = np.bincount(prefix, minlength=n_nodes)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            base = heap_base(lvl)
            node_start[base : base + n_nodes] = starts
            nd = np.bincount(prefix * RADIX + d, minlength=n_nodes * RADIX)
            nd = nd.reshape(n_nodes, RADIX)
            node_cnt[base : base + n_nodes, :] = np.cumsum(nd, axis=0) - nd
            # next level: stable regroup by (l+1)-digit prefix
            if lvl + 1 < digits:
                order = np.argsort(
                    seq >> (DIGIT_BITS * (digits - 1 - lvl)), kind="stable"
                )
                seq = seq[order]

        counts_v = np.zeros(vocab, dtype=np.int32)
        occ = np.asarray(index.occurring_distinct)
        keep = occ < vocab
        counts_v[occ[keep]] = np.asarray(index.occurring_counts, dtype=np.int64)[keep]

        C = np.zeros(sigma_bound + 1, np.int64)
        C[: index.C.size] = index.C
        C[index.C.size :] = index.C[-1]

        bwt_dev = None
        if keep_bwt:
            bwt_dtype = np.uint16 if sigma_bound <= 0xFFFF else np.uint32
            bwt_dev = jnp.asarray(np.asarray(index.bwt, bwt_dtype))

        return cls(
            blocks=jnp.asarray(blocks),
            node_start=jnp.asarray(node_start, jnp.int32),
            node_cnt=jnp.asarray(node_cnt, jnp.int32),
            C=jnp.asarray(C, jnp.int32),
            beginnings=jnp.asarray(index.beginnings, jnp.int32),
            corpus_counts=jnp.asarray(counts_v),
            bwt=bwt_dev,
            n_rows=n,
            digits=digits,
            sigma=sigma,  # validity gate matches the Psi layout exactly
            vocab=int(vocab),
            n_docs=index.n_docs,
        )
