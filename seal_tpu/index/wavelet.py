"""Compact device FM-index: a 4-ary wavelet tree over the BWT.

The default ``DeviceFMIndex`` trades memory for speed: Psi (4 B/token) makes
a rank query one binary search, and the explicit BWT (2 B/token) makes
window enumeration one gather -- ~7.6 B/token.  This module is the capacity
mode: the sdsl-equivalent wavelet-tree representation
(``csa_wt_int<>``, ``/root/reference/seal/cpp_modules/fm_index.cpp:19``)
rebuilt TPU-first.

Round-3 redesign: the original binary tree descended ``log2(sigma)`` (~16)
levels, each level touching TWO gather streams (rank table + bit words) --
profiled as gather-throughput-bound at 5.5x the Psi layout's decode cost.
The 4-ary tree resolves TWO symbol bits per level (8 levels for BART's
alphabet) and interleaves everything a level query needs into ONE
contiguous 12-word block:

* ``blocks`` -- uint32 [digits, n_blocks * 12]: per 128 rows, words 0..3 =
  cumulative counts of digit values 0..3 before the block (the rank
  directory), words 4..11 = the rows' 2-bit codes packed 16 per word.
  A rank of any digit value is one 12-word contiguous gather + masked
  ``lax.population_count`` on the VPU.
* ``node_start`` / ``node_cnt`` -- per-node start offsets and start ranks
  (4-ary heap packing), so the descent needs no second rank query.

Memory: 12 words / 128 rows / level = 0.375 B/token/level -> **3.0 B/token**
at BART's 16-bit alphabet (+0.4 vs the binary layout, ~2.5x less than the
fast layout) plus ~1 MB of node tables.  Queries descend half the levels of
the binary design with ~4x less gathered data.

Symbol rank descends ``digits`` levels; symbol access walks the same path
reading the stored codes; interval bucket counts (for the exact proposal
loop's pruning) come from bisecting the interval 4 digits deep -- the
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
BLOCK_ROWS = 128
WORDS_PER_BLOCK = 12  # 4 count words + 8 code words


def heap_base(level: int) -> int:
    """Start of level ``level`` in the 4-ary node heap: sum of 4^j, j<level."""
    return ((1 << (2 * level)) - 1) // 3


@struct.dataclass
class WaveletFMIndex:
    blocks: Any  # uint32 [digits, n_blocks * 12]  interleaved counts+codes
    node_start: Any  # int32 [heap]  level-l node v at heap_base(l)+v
    node_cnt: Any  # int32 [heap, 4]  per-digit start ranks of each node
    C: Any  # int32 [sigma_bound+1]
    beginnings: Any  # int32 [n_docs+1]
    corpus_counts: Any  # int32 [vocab]

    n_rows: int = struct.field(pytree_node=False)
    digits: int = struct.field(pytree_node=False)  # 2-bit digits per symbol
    sigma: int = struct.field(pytree_node=False)  # true corpus alphabet size
    vocab: int = struct.field(pytree_node=False)
    n_docs: int = struct.field(pytree_node=False)

    @property
    def levels(self) -> int:
        """Symbol width in bits (2 per descent level)."""
        return 2 * self.digits

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
    def from_host(cls, index: FMIndex, vocab: int | None = None) -> "WaveletFMIndex":
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
        digits = max(1, -(-math.ceil(math.log2(sigma_bound)) // 2))

        n_blocks = (n >> 7) + 1
        blocks = np.zeros((digits, n_blocks * WORDS_PER_BLOCK), np.uint32)
        heap = heap_base(digits)
        node_start = np.zeros(heap, np.int64)
        node_cnt = np.zeros((heap, 4), np.int64)

        seq = bwt  # level-l sequence: symbols stably grouped by l-digit prefix
        pad_rows = n_blocks * BLOCK_ROWS - n
        for lvl in range(digits):
            d = ((seq >> (2 * (digits - 1 - lvl))) & 3).astype(np.uint8)
            # code words: 2-bit values little-endian, 16 rows per word
            dp = np.concatenate([d, np.zeros(pad_rows, np.uint8)])
            bits_mat = np.empty(dp.size * 2, np.uint8)
            bits_mat[0::2] = dp & 1
            bits_mat[1::2] = dp >> 1
            codes = np.packbits(bits_mat, bitorder="little").view("<u4")
            codes = codes.reshape(n_blocks, 8)
            # cumulative per-digit counts at block starts
            blk_of = np.arange(n) >> 7
            hist = np.bincount(blk_of * 4 + d, minlength=n_blocks * 4)
            hist = hist.reshape(n_blocks, 4)
            cum = np.zeros((n_blocks, 4), np.int64)
            cum[1:] = np.cumsum(hist, axis=0)[:-1]
            lvl_blocks = blocks[lvl].reshape(n_blocks, WORDS_PER_BLOCK)
            lvl_blocks[:, :4] = cum.astype(np.uint32)
            lvl_blocks[:, 4:] = codes
            # node tables: prefix-grouped starts + their per-digit start ranks
            prefix = seq >> (2 * (digits - lvl))
            counts = np.bincount(prefix, minlength=1 << (2 * lvl))
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            base = heap_base(lvl)
            node_start[base : base + starts.size] = starts
            for v in range(4):
                cum_v = np.concatenate([[0], np.cumsum(d == v)])
                node_cnt[base : base + starts.size, v] = cum_v[starts]
            # next level: stable regroup by (l+1)-digit prefix
            if lvl + 1 < digits:
                order = np.argsort(seq >> (2 * (digits - 1 - lvl)), kind="stable")
                seq = seq[order]

        counts_v = np.zeros(vocab, dtype=np.int32)
        occ = np.asarray(index.occurring_distinct)
        keep = occ < vocab
        counts_v[occ[keep]] = np.asarray(index.occurring_counts, dtype=np.int64)[keep]

        C = np.zeros(sigma_bound + 1, np.int64)
        C[: index.C.size] = index.C
        C[index.C.size :] = index.C[-1]

        return cls(
            blocks=jnp.asarray(blocks),
            node_start=jnp.asarray(node_start, jnp.int32),
            node_cnt=jnp.asarray(node_cnt, jnp.int32),
            C=jnp.asarray(C, jnp.int32),
            beginnings=jnp.asarray(index.beginnings, jnp.int32),
            corpus_counts=jnp.asarray(counts_v),
            n_rows=n,
            digits=digits,
            sigma=sigma,  # validity gate matches the Psi layout exactly
            vocab=int(vocab),
            n_docs=index.n_docs,
        )
