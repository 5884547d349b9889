"""Batched FM-index query ops (pure jnp; jit/vmap/shard-friendly).

These replace the reference's per-interval C++ calls:

* ``backward_step``       <- sdsl ``backward_search`` (``fm_index.cpp:67-76``)
* ``count_sequences``     <- ``FMIndex.get_count`` loops (``index.py:102-118``)
* ``window_continuations``/``validate_tokens`` <- ``interval_symbols`` /
  ``distinct_count_multi`` (``fm_index.cpp:78-131``).  Instead of enumerating
  the distinct-symbol *set* of a BWT interval (variable-length, host-only),
  we either (a) gather the interval's BWT window directly when it is small --
  exhaustive -- or (b) *validate* externally proposed candidate tokens with a
  rank query each.  Both are fixed-shape and batch over beams.
* ``locate_rows``         <- SA sampling walk (``fm_index.cpp:163-167``)
* ``dense_counts``        <- full count vector; exact but O(vocab) -- used for
  parity tests and an optional exact decoding mode.

All ops take *unshifted* token ids and shift internally (host SHIFT == 1).
Every op accepts arbitrary leading batch dims on its query operands.

Kernel note: the rank binary search is latency-bound pointer chasing batched
across lanes; XLA lowers the per-iteration ``psi[mid]`` to the TPU's native
gather path.  A Pallas version was evaluated and rejected: Mosaic supports
only 2-D aligned gathers (``operand[idx[i, j], j]``), not the arbitrary
cross-lane indexing a search over a VMEM-resident table needs, so the XLA
gather is the speed-of-light implementation on this hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.index.fm_index import SHIFT
from seal_tpu.ops import _generic


_VEC_LOG = 7  # vector finish takes over once the span is <= 1 << 7 rows


def _searchsorted_impl(index: DeviceFMIndex, lo, hi, pos, want_val: bool):
    """Smallest i in [lo, hi] s.t. psi[i] >= pos (psi[lo:hi] increasing).

    ``lo``/``hi``/``pos`` share a shape; returns (row, val-or-None) where
    ``val = psi[row]`` (clamped in-bounds) when ``want_val``.
    Invariant: the answer lies in [lo, hi]; the span entering is bounded by
    ``2^search_iters`` (head-directory construction, ``device_index.py``).

    Two-stage: binary-search rounds halve the span down to <= 128, then a
    vectorized compare-count over the TWO 128-row psi blocks covering
    [lo, lo+128] finishes.  Each binary round is a serialized random HBM
    gather (~0.37 ms/round at the bench decode shape); the finish reads
    whole rows of the blocked ``psi_blk`` layout with ``jnp.take`` along
    the block axis -- the embedding-lookup shape the TPU gather unit
    streams at full bandwidth (a vmapped dynamic_slice window and a
    scalar-gather loop both measured ~10x slower; cf. wt_ops.py:44-47).
    At bench scale (search_iters == 7) the scalar loop vanishes entirely.
    ``psi[row]`` also falls out of the gathered rows (row <= lo + 128 is
    always inside them), so ``contains_tokens`` needs no second gather.
    """
    psi = index.psi
    vec_log = min(index.search_iters, _VEC_LOG)
    n_pre = (
        index.search_iters - vec_log
        if index.psi_blk is not None
        else index.search_iters
    )

    if n_pre > 0:

        def body(_, state):
            lo, hi = state
            mid = (lo + hi) >> 1
            active = lo < hi
            go_right = psi[mid] < pos
            new_lo = jnp.where(active & go_right, mid + 1, lo)
            new_hi = jnp.where(active & ~go_right, mid, hi)
            return new_lo, new_hi

        lo, hi = lax.fori_loop(0, n_pre, body, (lo, hi))
        if index.psi_blk is None:
            val = psi[jnp.minimum(lo, index.n_rows - 1)] if want_val else None
            return lo, val

    # span <= 128: rows [lo, hi] lie inside blocks b0, b0+1 of psi_blk
    # (padded with n_rows, which never satisfies ``< pos``).
    b0 = lax.shift_right_logical(lo, 7)
    vals = jnp.concatenate(
        [jnp.take(index.psi_blk, b0, axis=0),
         jnp.take(index.psi_blk, b0 + 1, axis=0)],
        axis=-1,
    )  # [..., 256]
    idx = (b0 << 7)[..., None] + jnp.arange(256, dtype=jnp.int32)
    hit = (idx >= lo[..., None]) & (idx < hi[..., None]) & (vals < pos[..., None])
    row = lo + hit.sum(-1).astype(jnp.int32)
    if not want_val:
        return row, None
    # row <= lo + 128 < (b0 << 7) + 256: always inside the gathered rows.
    # Masked sum instead of take_along_axis: the 1-of-256 pick was the
    # single biggest constraint-op gather in the round-4 device trace
    # (0.44 ms/step at the bench decode shape, serialized scalar-gather
    # path); the compare+select+reduce over rows already in registers is
    # VPU work XLA fuses with ``hit``.  Exact: one lane matches.
    val = jnp.where(idx == row[..., None], vals, 0).sum(-1).astype(vals.dtype)
    return row, val


def _searchsorted_psi(index: DeviceFMIndex, lo, hi, pos):
    return _searchsorted_impl(index, lo, hi, pos, want_val=False)[0]


def _symbol_bounds(index: DeviceFMIndex, c, pos):
    """(blo, bhi, dlo, dhi): psi-block and directory-tightened search bounds.

    ``c`` holds shifted symbol ids; ``pos`` may carry extra leading dims
    that broadcast against ``c`` (the stacked lo/hi lanes of a backward
    step).  Every rank query starts here, so the lookups are packed:
    ``sym_dir[c] = (C[c], C[c+1], head_id[c], 0)`` is ONE width-4 row
    gather (vs three scalar gathers), and for head symbols
    ``head_pair[h*(nb-1) + (pos >> dir_shift)]`` yields both Occ bounds of
    the position block in ONE width-2 row gather (vs two scalar gathers)
    -- each gather round is a serialized HBM round trip (~0.37 ms at the
    bench decode shape), so rounds, not bytes, are the cost (round 3/4
    profiles; reference hot loop: ``fm_index.cpp:111-131``).
    """
    if index.sym_dir is not None:
        d = jnp.take(index.sym_dir, c, axis=0)  # [..., 4]
        blo, bhi, hid = d[..., 0], d[..., 1], d[..., 2]
    else:
        blo, bhi = index.C[c], index.C[c + 1]
        hid = index.head_id[c] if index.head_id is not None else None
    shape = jnp.broadcast_shapes(pos.shape, blo.shape)
    blo_b = jnp.broadcast_to(blo, shape)
    bhi_b = jnp.broadcast_to(bhi, shape)
    if hid is None or index.head_pair is None:
        return blo, bhi, blo_b, bhi_b
    pos_b = jnp.broadcast_to(pos, shape)
    hb = jnp.broadcast_to(hid, shape)
    safe_h = jnp.maximum(hb, 0)
    blk = jnp.clip(pos_b, 0, index.n_rows) >> index.dir_shift
    nb1 = (index.n_rows >> index.dir_shift) + 1  # directory blocks per head
    pr = jnp.take(index.head_pair, safe_h * nb1 + blk, axis=0)  # [..., 2]
    is_head = hb >= 0
    dlo = jnp.where(is_head, blo_b + pr[..., 0], blo_b)
    dhi = jnp.where(is_head, blo_b + pr[..., 1], bhi_b)
    return blo, bhi, dlo, dhi


def rank(index: DeviceFMIndex, symbol, pos):
    """Occ(symbol, pos): #occurrences of *shifted* symbol in bwt[0:pos).

    Equals ``searchsorted(psi[C[c]:C[c+1]], pos)`` because psi restricted to
    a symbol's row block is strictly increasing.
    """
    symbol = jnp.asarray(symbol, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    valid = (symbol >= 0) & (symbol < index.sigma)
    c = jnp.where(valid, symbol, 0)
    pos_b = jnp.broadcast_to(pos, c.shape)
    blo, bhi, dlo, dhi = _symbol_bounds(index, c, pos_b)
    row = _searchsorted_psi(index, dlo, dhi, pos_b)
    return jnp.where(valid, row - blo, 0)


def backward_step(index: DeviceFMIndex, token, lo, hi):
    """One backward-search step on half-open [lo, hi) with *unshifted* token.

    Appending ``token`` to a generated sequence == prepending it in the
    reversed corpus == one LF step (reference ``index.py:102-111``).
    Empty in, empty out.  Both interval bounds search in ONE fused binary
    search (stacked lanes) -- halves the sequential gather chain, which is
    the latency-bound part of the constraint step.
    """
    token = jnp.asarray(token, jnp.int32)
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    c = token + SHIFT
    valid = (c >= 1) & (c < index.sigma)
    safe_c = jnp.where(valid, c, 0)
    pos = jnp.stack([jnp.broadcast_to(lo, safe_c.shape),
                     jnp.broadcast_to(hi, safe_c.shape)], 0)
    blo, bhi, bounds_lo, bounds_hi = _symbol_bounds(index, safe_c, pos)
    row = _searchsorted_psi(index, bounds_lo, bounds_hi, pos)
    # new row range = block base + rank within the block; base == blo
    new_lo = row[0]
    new_hi = row[1]
    new_lo = jnp.where(valid, new_lo, 0)
    new_hi = jnp.where(valid, new_hi, 0)
    new_hi = jnp.maximum(new_lo, new_hi)
    return new_lo.astype(jnp.int32), new_hi.astype(jnp.int32)


def range_for_sequences(index: DeviceFMIndex, tokens, lengths):
    """Row ranges for padded token sequences (see ``ops._generic``)."""
    return _generic.range_for_sequences(backward_step, index, tokens, lengths)


def count_sequences(index: DeviceFMIndex, tokens, lengths):
    """Corpus occurrence counts for padded sequences (``get_count`` parity)."""
    lo, hi = range_for_sequences(index, tokens, lengths)
    return hi - lo


def bwt_at(index: DeviceFMIndex, rows):
    """BWT symbols at the given rows, *unshifted* (sentinel -> -1).

    Uses the explicit BWT array when present (one gather; lets the index
    drop ``sa``), else bwt[r] = text[(sa[r] - 1) mod N] with two gathers.
    """
    rows = jnp.asarray(rows, jnp.int32)
    if getattr(index, "bwt", None) is not None:
        return index.bwt[rows].astype(jnp.int32) - SHIFT
    prev = index.sa[rows] - 1
    prev = jnp.where(prev < 0, index.n_rows - 1, prev)
    return index.text[prev].astype(jnp.int32) - SHIFT


def window_continuations(index: DeviceFMIndex, lo, hi, window: int):
    """Strided/exhaustive interval enumeration (see ``ops._generic``)."""
    return _generic.window_continuations(bwt_at, index, lo, hi, window)


def _bwt_shifted(index: DeviceFMIndex, rows):
    """Shifted BWT symbols at the given rows (sentinel stays 0)."""
    if getattr(index, "bwt", None) is not None:
        return index.bwt[rows].astype(jnp.int32)
    prev = index.sa[rows] - 1
    prev = jnp.where(prev < 0, index.n_rows - 1, prev)
    return index.text[prev].astype(jnp.int32)


def bucket_counts_width(index: DeviceFMIndex) -> int:
    """Static width of ``bucket_counts`` output (for loop-carried buffers)."""
    return int(index.bucket_occ.shape[-1])


def bucket_counts(index: DeviceFMIndex, lo, hi):
    """Exact per-bucket symbol counts of BWT[lo:hi).

    Returns int32 [..., n_buckets]: for every span of ``bucket_size``
    adjacent (shifted) symbol ids, how many interval rows carry a symbol in
    that span.  Blocked-rank lookup (one gather into ``bucket_occ``) plus a
    partial-block recount of at most ``bucket_rows`` BWT rows per bound.
    A zero bucket proves *no* symbol in that span continues the range --
    the pruning fact the exact proposal loop needs (the dense analogue of
    descending one level of sdsl's wavelet tree, ``fm_index.cpp:78-131``).
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    pos = jnp.stack([jnp.clip(lo, 0, index.n_rows), jnp.clip(hi, 0, index.n_rows)], 0)
    R, nb = index.bucket_rows, index.n_buckets
    blk = pos // R
    base = index.bucket_occ[blk]  # [2, ..., nb]
    iota_nb = jnp.arange(nb, dtype=jnp.int32)

    chunk = min(R, 256)

    def body(acc, r0):
        offs = r0 + jnp.arange(chunk, dtype=jnp.int32)
        rows = blk[..., None] * R + offs  # [2, ..., chunk]
        valid = rows < pos[..., None]
        sym = _bwt_shifted(index, jnp.where(valid, rows, 0))
        bid = sym // index.bucket_size
        onehot = (bid[..., :, None] == iota_nb) & valid[..., None]
        return acc + onehot.sum(-2).astype(jnp.int32), None

    # derive the zero init from pos so its shard-varying type matches the
    # in-loop accumulator under shard_map (plain zeros would be invariant)
    acc0 = jnp.zeros(pos.shape + (nb,), jnp.int32) + (pos * 0)[..., None]
    starts = jnp.arange(0, R, chunk, dtype=jnp.int32)
    partial, _ = lax.scan(body, acc0, starts)
    pre = base + partial
    return pre[1] - pre[0]


def validate_tokens(index: DeviceFMIndex, tokens, lo, hi):
    """Counts of each candidate continuation token of ranges [lo, hi).

    tokens: int32 [..., M] unshifted; lo/hi: [...].  Returns int32 [..., M]:
    the occurrence count of range+token (0 = not a valid continuation).
    Replaces the reference's per-beam ``distinct_count_multi`` fan-out with
    2*M rank queries per range.
    """
    return _generic.validate_tokens(backward_step, index, tokens, lo, hi)


def contains_tokens(index: DeviceFMIndex, tokens, lo, hi):
    """Membership: does each candidate token continue range [lo, hi)?

    tokens: int32 [..., M] unshifted; lo/hi: [...].  Returns bool [..., M],
    identical to ``validate_tokens(...) > 0`` -- but at HALF the gather
    traffic: token c occurs in BWT[lo:hi) iff its first occurrence at
    position >= lo exists and is < hi, i.e. ONE binary search over the
    symbol's (strictly increasing) psi block plus one final psi read,
    instead of rank chains at both bounds.  Rank gathers are
    throughput-bound on v5e (~5 ns/lane, profiled round 3), so lanes x
    depth is the cost -- this is the decode proposal loop's validation
    primitive (the loop only ever consumes count > 0).
    """
    tokens = jnp.asarray(tokens, jnp.int32)
    lo = jnp.asarray(lo, jnp.int32)[..., None]
    hi = jnp.asarray(hi, jnp.int32)[..., None]
    c = tokens + SHIFT
    valid = (c >= 1) & (c < index.sigma)
    safe_c = jnp.where(valid, c, 0)
    pos = jnp.broadcast_to(lo, safe_c.shape)
    blo, bhi, dlo, dhi = _symbol_bounds(index, safe_c, pos)
    # row < bhi  ==>  psi[row] is the first occurrence >= lo (the directory
    # bounds preserve the searchsorted invariant; see _symbol_bounds);
    # the fused search returns psi[row] out of its own window gather.
    row, first = _searchsorted_impl(index, dlo, dhi, pos, want_val=True)
    in_block = row < bhi
    return valid & in_block & (first < jnp.broadcast_to(hi, safe_c.shape))


def extend_ranges(index: DeviceFMIndex, tokens, lo, hi):
    """Ranges after appending one token per batch element (shapes match)."""
    return backward_step(index, tokens, lo, hi)


def locate_rows(index: DeviceFMIndex, rows):
    """Corpus positions (reversed-text coordinates) of index rows; single
    gather (reference walks the sampled SA, ``fm_index.cpp:163-167``)."""
    rows = jnp.asarray(rows, jnp.int32)
    ok = (rows >= 0) & (rows < index.n_rows)
    return jnp.where(ok, index.sa[jnp.where(ok, rows, 0)], -1)


def doc_index_of(index: DeviceFMIndex, positions):
    """Document index containing each corpus position (bisect_right - 1,
    parity with reference ``index.py:77-82``)."""
    positions = jnp.asarray(positions, jnp.int32)
    return (
        jnp.searchsorted(index.beginnings, positions, side="right").astype(jnp.int32) - 1
    )


def dense_counts(index: DeviceFMIndex, lo, hi, chunk: int = 4096):
    """Exact continuation-count vector over the whole model vocab.

    Returns int32 [..., vocab]: count of every possible next token for each
    range.  Cost O(vocab * log N) rank queries per range -- use for parity
    tests / exact mode on small problems; production decoding uses
    window+validate.
    """
    return _generic.dense_counts(validate_tokens, index, lo, hi, chunk)
