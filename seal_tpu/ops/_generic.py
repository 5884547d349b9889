"""Layout-generic FM-index query ops.

The Psi layout (``fm_ops``) and the wavelet layout (``wt_ops``) differ only
in their primitive ``backward_step`` / ``bwt_at``; everything built on top
-- scanned range extension, strided window enumeration, candidate
validation, dense count sweeps -- is layout-independent and lives here once.
Each public module wraps these with its own primitives so callers (and the
``SingleIndexOps`` dispatcher) keep the per-layout module surface.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def range_for_sequences(backward_step, index, tokens, lengths):
    """Row ranges for a batch of padded token sequences.

    tokens: int32 [..., L] (unshifted); lengths: int32 [...].
    Positions >= length are ignored.  Returns (lo, hi) of shape [...].
    """
    tokens = jnp.asarray(tokens, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)
    lo, hi = index.full_range(tokens.shape[:-1])

    def body(carry, tok_t):
        lo, hi, t = carry
        new_lo, new_hi = backward_step(index, tok_t, lo, hi)
        keep = t < lengths
        lo = jnp.where(keep, new_lo, lo)
        hi = jnp.where(keep, new_hi, hi)
        return (lo, hi, t + 1), None

    (lo, hi, _), _ = lax.scan(
        body, (lo, hi, jnp.int32(0)), jnp.moveaxis(tokens, -1, 0)
    )
    return lo, hi


def window_continuations(bwt_at, index, lo, hi, window: int):
    """Continuation tokens sampled from rows of [lo, hi).

    Returns (tokens [..., window], valid [..., window]).  Exhaustive when
    ``hi - lo <= window``; otherwise a *strided* deterministic sample
    spanning the whole interval (suffix-array order interleaves contexts, so
    a stride covers far more distinct continuations than a prefix window).
    Invalid/sentinel slots are -1.
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    size = jnp.maximum(hi - lo, 0)
    stride = jnp.maximum(size // window, 1)[..., None]
    offs = jnp.arange(window, dtype=jnp.int32)
    rows = lo[..., None] + offs * stride
    valid = rows < hi[..., None]
    toks = bwt_at(index, jnp.where(valid, rows, 0))
    # Corpus symbols outside the model vocab (index built with vocab <
    # corpus alphabet) must be filtered here at the source: downstream
    # take_along_axis(logprobs, tok) on such a token reads out of bounds
    # and can yield NaN, which lax.top_k ranks first and poisons beams.
    valid = valid & (toks >= 0) & (toks < index.vocab)
    return jnp.where(valid, toks, -1), valid


def validate_tokens(backward_step, index, tokens, lo, hi):
    """Continuation counts for candidate tokens: [..., N] given [...] ranges."""
    tokens = jnp.asarray(tokens, jnp.int32)
    lo_b = jnp.broadcast_to(jnp.asarray(lo, jnp.int32)[..., None], tokens.shape)
    hi_b = jnp.broadcast_to(jnp.asarray(hi, jnp.int32)[..., None], tokens.shape)
    new_lo, new_hi = backward_step(index, tokens, lo_b, hi_b)
    return new_hi - new_lo


def dense_counts(validate_fn, index, lo, hi, chunk: int):
    """Exact continuation-count vector over the whole model vocab.

    Returns int32 [..., vocab]: count of every possible next token for each
    range.  Cost O(vocab) rank queries per range -- parity tests and the
    optional exact-mask mode; production decoding uses the proposal loop.
    """
    lo = jnp.asarray(lo, jnp.int32)
    hi = jnp.asarray(hi, jnp.int32)
    vocab = index.vocab
    pad = (-vocab) % chunk
    n_chunks = (vocab + pad) // chunk

    def body(start, _):
        toks = start + jnp.arange(chunk, dtype=jnp.int32)
        toks_b = jnp.broadcast_to(toks, lo.shape + (chunk,))
        cnt = validate_fn(index, toks_b, lo, hi)
        return start + chunk, cnt

    _, chunks = lax.scan(body, jnp.int32(0), None, length=n_chunks)
    counts = jnp.moveaxis(chunks, 0, -2).reshape(lo.shape + (n_chunks * chunk,))
    return counts[..., :vocab]
