"""seal_tpu: a TPU-native generative-retrieval framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/SEAL ("Autoregressive Search Engines: Generating Substrings
as Document Identifiers", arXiv 2204.10628): a seq2seq LM generates
corpus-grounded ngrams ("keys") under FM-index-constrained beam search, and
documents are ranked by aggregating the scores of the keys they contain.

Key architectural departures from the reference (see SURVEY.md):

* The succinct wavelet-tree FM-index (sdsl-lite ``csa_wt_int<>``) is replaced
  by a dense Psi-array layout stored as JAX arrays: ``Occ(c, pos)`` is a
  batched, branchless binary search (pure gathers), ``locate`` is a single
  suffix-array gather, and document text is a plain corpus slice.
* The per-decode-step host<->C++ round trip (reference
  ``seal/beam_search.py:62-140`` -> ``seal/cpp_modules/fm_index.cpp``) is
  fused away: constrained beam search is one jitted ``lax.scan`` in which
  constraints are enforced by *validating* candidate tokens with batched
  backward-search steps and by exhaustively enumerating continuations of
  small FM-index ranges.
* Queries/beams shard over a ``data`` mesh axis and the index shards over a
  ``shard`` mesh axis with collective merging, instead of CPU
  multiprocessing + std::async threads.
"""

__version__ = "0.1.0"

from seal_tpu.index.fm_index import FMIndex

__all__ = ["FMIndex", "__version__"]
