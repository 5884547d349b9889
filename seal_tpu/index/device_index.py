"""Device-resident FM-index: the dense arrays as a JAX pytree.

This is the TPU replacement for the reference's C++ ``FMIndex`` object
(``seal/cpp_modules/fm_index.hpp:20-43``).  All query operations become
batched array programs in ``seal_tpu.ops.fm_ops``; there is no per-step host
round-trip (the reference crosses Python->SWIG->sdsl once per beam per token,
``seal/beam_search.py:95-107``).

Memory layout per corpus token: text(4) + sa(4) + psi(4) = 12 bytes, all
int32.  ``sigma`` is the internal (shifted) alphabet size; ``vocab`` is the
model vocabulary the mask/count vectors are sized to.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from seal_tpu.index.fm_index import FMIndex, SHIFT

BUCKET_ROWS = 1024  # BWT rows per bucket-occ block
N_BUCKETS = 256  # symbol buckets (one coarse wavelet level)


def build_bucket_occ(
    bwt: np.ndarray,
    sigma_global: int,
    bucket_rows: int = BUCKET_ROWS,
    n_buckets: int = N_BUCKETS,
) -> tuple[np.ndarray, int]:
    """Blocked per-bucket rank table over the BWT.

    ``occ[i, b]`` = #rows r < i*bucket_rows whose (shifted) BWT symbol falls
    in bucket b (buckets partition the symbol space into ``bucket_size``-wide
    spans).  One coarse wavelet-tree level materialized as a dense rank
    table: together with a partial-block recount it answers "which symbol
    buckets occur in BWT[lo:hi), and how often" *exactly* -- the pruning
    structure behind the exact constrained-decoding masks (the role sdsl's
    ``interval_symbols`` wavelet descent plays in the reference,
    ``fm_index.cpp:78-131``).  Costs ~1 byte/token at the defaults.

    ``sigma_global`` must be the model-level alphabet bound (vocab + SHIFT)
    so every shard of a sharded index uses the same bucket partition.
    """
    bucket_size = max(1, -(-int(sigma_global) // n_buckets))
    n = int(bwt.shape[0])
    n_blocks = -(-n // bucket_rows)
    # symbols >= sigma_global (corpus tokens outside the model vocab) route
    # to the dropped pad column: they are unproposable, and without the
    # clamp their ids would spill into the NEXT block's bucket 0, corrupting
    # the exact-mode support pruning
    ids = np.minimum(bwt.astype(np.int64) // bucket_size, n_buckets)
    pad = n_blocks * bucket_rows - n
    if pad:
        ids = np.concatenate([ids, np.full(pad, n_buckets, np.int64)])
    ids = ids.reshape(n_blocks, bucket_rows)
    flat = ids + np.arange(n_blocks, dtype=np.int64)[:, None] * (n_buckets + 1)
    bc = np.bincount(flat.ravel(), minlength=n_blocks * (n_buckets + 1))
    bc = bc.reshape(n_blocks, n_buckets + 1)[:, :n_buckets]
    occ = np.zeros((n_blocks + 1, n_buckets), np.int32)
    occ[1:] = np.cumsum(bc, axis=0).astype(np.int32)
    return occ, bucket_size


MAX_HEAD_SYMBOLS = 4096  # directory rows safety cap (build-time bound)
DIR_BUDGET_BYTES = 64 << 20  # head directory memory budget; the directory
# is a LATENCY structure (every level it removes is one serialized
# HBM-gather round off every rank query, ~0.37 ms/level at the bench decode
# shape), so it is budgeted in absolute bytes against the 16 GB chip, not
# per token.  8 bytes per (head, block) cell: the device layout stores
# (Occ(c, j<<s), Occ(c, (j+1)<<s)) PAIRS so a rank query fetches both
# bounds with ONE width-2 row gather instead of two scalar gathers.


def build_head_directory(
    psi: np.ndarray,
    C: np.ndarray,
    n_rows: int,
    dir_shift: int | None = None,
    budget_bytes: int = DIR_BUDGET_BYTES,
) -> tuple[np.ndarray | None, np.ndarray | None, int, int]:
    """Position-blocked Occ directory for frequent ("head") symbols.

    Returns (head_id, head_occ, dir_shift, search_iters).  Symbols whose
    psi block exceeds ``2^dir_shift`` rows get a directory row pinning any
    rank query to one position block in O(1); all others keep their
    (already shallow) full-block search.  ``search_iters`` -- the uniform
    binary-search depth, ``max(block cap, largest uncovered symbol)`` --
    is THE rank-query cost on TPU (a serialized chain of HBM gathers), so
    the auto-tuner searches every (dir_shift, head set) pair that fits
    ``budget_bytes`` (the pair layout is H x ((N >> dir_shift) + 1) x 8 bytes)
    and keeps the one with the fewest iterations, ties to less memory.
    Measured on v5e (round 4): depth 12 -> 7 on the 1.2M-token bench
    corpus at 32 MB.  ``dir_shift`` pins the shift explicitly (tests).
    """
    counts = np.diff(C.astype(np.int64))
    max_block = int(counts.max()) if counts.size else 1
    base_iters = max(1, math.ceil(math.log2(max_block + 1)))
    # tiny corpora cannot usefully absorb the full flat budget (and their
    # B/token reporting shouldn't be dominated by it): cap at 64 B/token
    budget_bytes = min(budget_bytes, 64 * n_rows)
    order = np.argsort(counts)[::-1]  # symbols by block size, desc
    sorted_counts = counts[order]

    def plan(shift: int):
        """(iters, mem, h_eff) for a shift, or None when useless."""
        nb = (n_rows >> shift) + 2
        h_fit = int(budget_bytes // (nb * 8))
        h_all = int((sorted_counts > (1 << shift)).sum())
        h_eff = min(h_all, h_fit, MAX_HEAD_SYMBOLS)
        if h_eff == 0:
            return None
        tail_max = int(sorted_counts[h_eff]) if h_eff < sorted_counts.size else 1
        depth = max(min(1 << shift, max_block), tail_max)
        iters = max(1, math.ceil(math.log2(depth + 1)))
        if iters >= base_iters:
            return None
        return iters, h_eff * nb * 8, h_eff

    if dir_shift is not None:
        choice = plan(dir_shift)
        if choice is None:
            return None, None, 0, base_iters
        shift = dir_shift
    else:
        best = None
        shift = 0
        for s in range(4, max(5, math.ceil(math.log2(max(n_rows, 2))))):
            p = plan(s)
            if p is not None and (best is None or p[:2] < best[:2]):
                best, shift = p, s
        if best is None:
            return None, None, 0, base_iters
        choice = best

    iters, _, h_eff = choice
    head = np.sort(order[:h_eff])
    head_id = np.full(counts.size, -1, np.int32)
    head_id[head] = np.arange(head.size, dtype=np.int32)
    nb = (n_rows >> shift) + 2
    bounds = np.arange(nb, dtype=np.int64) << shift
    head_occ = np.empty((head.size, nb), np.int32)
    for h, c in enumerate(head):
        block = psi[C[c] : C[c + 1]]
        head_occ[h] = np.searchsorted(block, bounds, side="left").astype(np.int32)
    return head_id, head_occ, shift, iters


@struct.dataclass
class DeviceFMIndex:
    text: Any  # int32/uint16 [N]   shifted symbols, sentinel (0) last
    sa: Any  # int32 [N] or None (only `locate` needs it on device)
    psi: Any  # int32 [N]
    bwt: Any  # int32/uint16 [N] shifted BWT symbols, or None (derived from
    #   text+sa when absent; storing it explicitly lets `sa` be dropped:
    #   8 bytes/token instead of 10)
    C: Any  # int32 [sigma+1]  C[v] = #symbols < v
    beginnings: Any  # int32 [n_docs+1]  doc start offsets (token space)
    corpus_counts: Any  # int32 [vocab]  step-1 continuation counts by token id
    bucket_occ: Any  # int32 [n_blocks+1, n_buckets]  blocked bucket-rank table
    # Head-symbol rank directory: the rank binary search is a SERIALIZED
    # chain of ``search_iters`` HBM gathers, and its depth is set by the
    # most frequent symbol's psi-block size (Zipf head ~2^18 at 1.2M
    # tokens).  For every symbol whose block exceeds 2^dir_shift rows,
    # ``head_occ[head_id[c], j] = Occ(c, j << dir_shift)`` pins the search
    # to one position-block in O(1), capping the remaining depth at
    # ``dir_shift`` iterations for head and tail symbols alike.
    head_id: Any = None  # int32 [sigma]: slot into the head directory, or -1
    # pair layout: head_pair[h * (nb - 1) + j] = (Occ(c, j<<s), Occ(c, (j+1)<<s))
    # where nb = (N >> dir_shift) + 2 -- ONE width-2 row gather per rank query
    head_pair: Any = None  # int32 [H * (nb - 1), 2]
    # psi again, padded (with n_rows) and reshaped [ceil(N/128)+2, 128]:
    # lets the rank search finish its last 7 levels with TWO whole-row
    # ``jnp.take``s along the block axis -- the embedding-lookup gather
    # shape the TPU streams at full bandwidth -- instead of 7 serialized
    # scalar-gather rounds.  (A vmapped dynamic_slice window was tried
    # first and measured 10x SLOWER than the binary search: XLA lowers
    # per-lane slices to scalar gathers, same finding as wt_ops.py:44-47.)
    # +4 B/token on the fast-mode footprint; None = binary search only.
    psi_blk: Any = None  # int32 [NB + 2, 128]
    # per-symbol directory row: (C[c], C[c+1], head_id[c], 0) -- collapses
    # the three scalar gathers every rank query starts with into ONE
    # width-4 row gather (row fetch cost == one scalar gather round).
    sym_dir: Any = None  # int32 [sigma, 4]

    n_rows: int = struct.field(pytree_node=False, default=0)  # N = tokens + 1
    sigma: int = struct.field(pytree_node=False, default=0)  # shifted alphabet
    vocab: int = struct.field(pytree_node=False, default=0)  # model vocab size
    n_docs: int = struct.field(pytree_node=False, default=0)
    search_iters: int = struct.field(pytree_node=False, default=31)
    bucket_rows: int = struct.field(pytree_node=False, default=BUCKET_ROWS)
    bucket_size: int = struct.field(pytree_node=False, default=1)
    n_buckets: int = struct.field(pytree_node=False, default=N_BUCKETS)
    dir_shift: int = struct.field(pytree_node=False, default=0)  # 0 = off

    @property
    def n_tokens(self) -> int:
        return self.n_rows - 1

    def memory_bytes(self) -> int:
        """Device-memory footprint of the index arrays."""
        import jax

        return sum(
            a.size * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(self)
            if hasattr(a, "dtype")
        )

    @classmethod
    def from_host(
        cls,
        index: FMIndex,
        vocab: int | None = None,
        compact: bool = True,
        keep_sa: bool = False,
        keep_text: bool = False,
        dir_shift: int | None = None,
    ) -> "DeviceFMIndex":
        """Ship a host-built index to device arrays.

        ``vocab`` sizes the step-1 count vector (and dense masks); defaults to
        the corpus alphabet but should be the model's vocab size when used for
        constrained decoding.  ``compact`` stores symbols as uint16 when the
        shifted alphabet fits (BART's 50k vocab does).

        The decode path needs only psi + bwt + bucket_occ (+C/beginnings):
        **7 bytes/token** at the defaults.  ``keep_sa`` adds the suffix array
        (device ``locate``, +4 B/token); ``keep_text`` adds the corpus text
        (device document extraction, +2 B/token).  Host-side ranking keeps
        its own arrays either way (reference keeps everything in RAM too,
        ``seal/retrieval.py:552-559``).
        """
        n_rows = index.size()
        if n_rows >= 2**31:
            raise ValueError("corpora >= 2^31 rows need the sharded index")
        sigma = int(index.C.size - 1)
        if vocab is None:
            vocab = max(sigma - SHIFT, 1)
        counts = np.zeros(vocab, dtype=np.int32)
        occ = np.asarray(index.occurring_distinct)
        keep = occ < vocab
        counts[occ[keep]] = np.asarray(index.occurring_counts, dtype=np.int64)[keep]
        text_dtype = jnp.uint16 if (compact and sigma < 2**16) else jnp.int32
        occ, bucket_size = build_bucket_occ(index.bwt, int(vocab) + SHIFT)
        head_id, head_occ, dshift, iters = build_head_directory(
            np.asarray(index.psi), np.asarray(index.C), n_rows, dir_shift
        )
        psi_np = np.asarray(index.psi, dtype=np.int32)
        nb = -(-n_rows // 128) + 2
        psi_pad = np.full(nb * 128, n_rows, np.int32)
        psi_pad[:n_rows] = psi_np
        C_np = np.asarray(index.C, dtype=np.int32)
        sym_dir = np.zeros((sigma, 4), np.int32)
        sym_dir[:, 0] = C_np[:-1]
        sym_dir[:, 1] = C_np[1:]
        sym_dir[:, 2] = head_id if head_id is not None else -1
        head_pair = None
        if head_occ is not None:
            head_pair = np.stack(
                [head_occ[:, :-1], head_occ[:, 1:]], axis=-1
            ).reshape(-1, 2)
        return cls(
            text=jnp.asarray(index.text, dtype=text_dtype) if keep_text else None,
            sa=jnp.asarray(index.sa, dtype=jnp.int32) if keep_sa else None,
            bwt=jnp.asarray(index.bwt, dtype=text_dtype),
            psi=jnp.asarray(index.psi, dtype=jnp.int32),
            C=jnp.asarray(index.C, dtype=jnp.int32),
            beginnings=jnp.asarray(index.beginnings, dtype=jnp.int32),
            corpus_counts=jnp.asarray(counts),
            bucket_occ=jnp.asarray(occ),
            n_rows=n_rows,
            sigma=sigma,
            vocab=int(vocab),
            n_docs=index.n_docs,
            # every rank query searches within ONE symbol's psi block
            # ([C[c], C[c+1]]); the head directory pins frequent symbols to
            # one position block, so the depth is the max of the block size
            # and the largest tail symbol (each iteration is a serialized
            # HBM gather -- ~19 rounds undirected at 1.2M tokens, ~11 with)
            search_iters=iters,
            bucket_size=bucket_size,
            head_id=jnp.asarray(head_id) if head_id is not None else None,
            head_pair=jnp.asarray(head_pair) if head_pair is not None else None,
            dir_shift=dshift,
            psi_blk=jnp.asarray(psi_pad.reshape(nb, 128)),
            sym_dir=jnp.asarray(sym_dir),
        )

    def full_range(self, shape=()) -> tuple[jax.Array, jax.Array]:
        """The [0, N) row range, broadcast to ``shape``."""
        lo = jnp.zeros(shape, dtype=jnp.int32)
        hi = jnp.full(shape, self.n_rows, dtype=jnp.int32)
        return lo, hi
