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

    n_rows: int = struct.field(pytree_node=False)  # N = tokens + 1
    sigma: int = struct.field(pytree_node=False)  # shifted alphabet size
    vocab: int = struct.field(pytree_node=False)  # model vocab size
    n_docs: int = struct.field(pytree_node=False)
    search_iters: int = struct.field(pytree_node=False)  # ceil(log2(N+1))

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
        keep_sa: bool = True,
    ) -> "DeviceFMIndex":
        """Ship a host-built index to device arrays.

        ``vocab`` sizes the step-1 count vector (and dense masks); defaults to
        the corpus alphabet but should be the model's vocab size when used for
        constrained decoding.  ``compact`` stores the text as uint16 when the
        shifted alphabet fits (BART's 50k vocab does), cutting the footprint
        from 12 to 10 bytes/token.
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
        return cls(
            text=jnp.asarray(index.text, dtype=text_dtype),
            sa=jnp.asarray(index.sa, dtype=jnp.int32) if keep_sa else None,
            bwt=jnp.asarray(index.bwt, dtype=text_dtype),
            psi=jnp.asarray(index.psi, dtype=jnp.int32),
            C=jnp.asarray(index.C, dtype=jnp.int32),
            beginnings=jnp.asarray(index.beginnings, dtype=jnp.int32),
            corpus_counts=jnp.asarray(counts),
            n_rows=n_rows,
            sigma=sigma,
            vocab=int(vocab),
            n_docs=index.n_docs,
            search_iters=max(1, math.ceil(math.log2(n_rows + 1))),
        )

    def full_range(self, shape=()) -> tuple[jax.Array, jax.Array]:
        """The [0, N) row range, broadcast to ``shape``."""
        lo = jnp.zeros(shape, dtype=jnp.int32)
        hi = jnp.full(shape, self.n_rows, dtype=jnp.int32)
        return lo, hi
