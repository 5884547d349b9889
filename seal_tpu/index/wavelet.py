"""Compact device FM-index: a levelwise wavelet tree over the BWT.

The default ``DeviceFMIndex`` trades memory for speed: Psi (4 B/token) makes
a rank query one binary search, and the explicit BWT (2 B/token) makes
window enumeration one gather -- ~7 B/token.  This module is the capacity
mode: the sdsl-equivalent wavelet-tree representation
(``csa_wt_int<>``, ``/root/reference/seal/cpp_modules/fm_index.cpp:19``)
rebuilt TPU-first as **dense bit-plane arrays with blocked rank tables**:

* ``bits``  -- uint32 [levels, N/32]: level ``l`` holds bit ``L-1-l`` of
  every BWT symbol, stably grouped by ``l``-bit symbol prefix (the classic
  pointerless levelwise layout).
* ``rank128`` -- uint32 [levels, N/128]: cumulative ones every 128 bits;
  an arbitrary rank1 is one table gather + one 4-word slice + popcounts
  (``lax.population_count`` rides the VPU).
* ``node_start`` / ``node_ones`` -- int32 [levels, 2^levels]: start offset
  and start-rank of every prefix node, so the per-level descent needs no
  second rank query.

Total ~``levels/8 * 1.25`` bytes/token (2.7 B at BART's 17-bit alphabet) --
100M tokens fit in 0.27 GiB of HBM, and a 2.5B-token corpus in ~7 GiB.
Queries cost ~3x the Psi layout's sequential gathers; use this mode when
the corpus does not fit, the default otherwise.

Symbol rank descends ``levels`` bit-planes; symbol access walks the same
path using the stored bits; interval bucket counts (for the exact proposal
loop's pruning) come from bisecting the interval to depth 8 -- the wavelet
tree IS the bucket structure, so no auxiliary table is shipped.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from seal_tpu.index.fm_index import FMIndex, SHIFT

BUCKET_DEPTH = 8  # bisection depth for bucket_counts (256 buckets)


@struct.dataclass
class WaveletFMIndex:
    bits: Any  # uint32 [levels, n_words]
    rank128: Any  # uint32 [levels, n_blocks]  ones in bits[0 : 128*i)
    node_start: Any  # int32 [2^levels]  level-l node v at offset (1<<l)-1+v
    node_ones: Any  # int32 [2^levels]   (heap/Eytzinger packing, no padding)
    C: Any  # int32 [sigma+1]
    beginnings: Any  # int32 [n_docs+1]
    corpus_counts: Any  # int32 [vocab]

    n_rows: int = struct.field(pytree_node=False)
    levels: int = struct.field(pytree_node=False)
    sigma: int = struct.field(pytree_node=False)  # true corpus alphabet size
    vocab: int = struct.field(pytree_node=False)
    n_docs: int = struct.field(pytree_node=False)

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
        bwt = np.asarray(index.bwt, np.int64)
        n = bwt.size
        if n >= 2**31:
            # node offsets / ranks are int32 on device; larger corpora must
            # shard (parallel/sharded_index.py) until uint32 plumbing lands
            raise ValueError("corpora >= 2^31 rows need the sharded index")
        sigma = int(index.C.size - 1)
        if vocab is None:
            vocab = max(sigma - SHIFT, 1)
        sigma_bound = max(int(vocab) + SHIFT, sigma, 2)
        levels = max(1, math.ceil(math.log2(sigma_bound)))

        n_words = -(-n // 32)
        n_blocks = -(-n // 128) + 1
        bits = np.zeros((levels, n_words), np.uint32)
        rank128 = np.zeros((levels, n_blocks), np.uint32)
        node_start = np.zeros(1 << levels, np.int64)
        node_ones = np.zeros(1 << levels, np.int64)

        seq = bwt  # level-l sequence: symbols stably grouped by l-bit prefix
        for lvl in range(levels):
            b = ((seq >> (levels - 1 - lvl)) & 1).astype(np.uint8)
            pad = n_words * 32 - n
            b_pad = np.concatenate([b, np.zeros(pad, np.uint8)]) if pad else b
            # word w bit k (mask 1<<k) = element 32w+k
            bits[lvl] = np.packbits(b_pad, bitorder="little").view("<u4")
            # cumulative ones every 128 bits
            ones_per_block = np.add.reduceat(
                b, np.arange(0, n, 128), axis=0
            ) if n else np.zeros(0, np.int64)
            rank128[lvl, 1 : 1 + ones_per_block.size] = np.cumsum(ones_per_block)
            # node tables: prefix-grouped starts + their start ranks
            prefix = seq >> (levels - lvl)
            counts = np.bincount(prefix, minlength=1 << lvl)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            base = (1 << lvl) - 1
            node_start[base : base + starts.size] = starts
            cum_ones = np.concatenate([[0], np.cumsum(b)])
            node_ones[base : base + starts.size] = cum_ones[starts]
            # next level: stable regroup by (l+1)-bit prefix
            if lvl + 1 < levels:
                order = np.argsort(seq >> (levels - 1 - lvl), kind="stable")
                seq = seq[order]

        counts_v = np.zeros(vocab, dtype=np.int32)
        occ = np.asarray(index.occurring_distinct)
        keep = occ < vocab
        counts_v[occ[keep]] = np.asarray(index.occurring_counts, dtype=np.int64)[keep]

        C = np.zeros(sigma_bound + 1, np.int64)
        C[: index.C.size] = index.C
        C[index.C.size :] = index.C[-1]

        return cls(
            bits=jnp.asarray(bits),
            rank128=jnp.asarray(rank128),
            node_start=jnp.asarray(node_start, jnp.int32),
            node_ones=jnp.asarray(node_ones, jnp.int32),
            C=jnp.asarray(C, jnp.int32),
            beginnings=jnp.asarray(index.beginnings, jnp.int32),
            corpus_counts=jnp.asarray(counts_v),
            n_rows=n,
            levels=levels,
            sigma=sigma,  # validity gate matches the Psi layout exactly
            vocab=int(vocab),
            n_docs=index.n_docs,
        )
