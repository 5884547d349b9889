"""Fused FM-index-constrained beam search: one jitted scan, no host round-trips.

Semantics replicate the reference decode stack
(``/root/reference/seal/beam_search.py``):

* **Dual scoring** (``beam_search.py:301-307``): candidates are *selected* by
  the constrained scores (log-softmax + FM mask + beam scores) but the scores
  that *accumulate* are the unconstrained ones, so generated ngrams are
  corpus-grounded yet scored by the raw LM.
* **History** (``BeamSearchScorerWithMemory``, ``beam_search.py:559-758``):
  every candidate at every step is recorded; hypotheses are extracted on host
  afterwards (``generate.py``).
* **Processor branches** (``IndexBasedLogitsProcessor.__call__``,
  ``beam_search.py:62-140``): step-1 allows the corpus-wide token set;
  EOS/PAD-terminated beams allow only PAD; ``stop_at_count`` forces EOS when
  the previous prefix's corpus count drops to the threshold;
  ``always_allow_eos`` un-masks EOS; ``force_decoding_from`` prefixes the
  constraint sequence (but, like the reference, does *not* constrain step 1).

The TPU-native departure: instead of materializing the distinct-symbol set of
each beam's FM-interval (the wavelet-tree ``interval_symbols`` fan-out,
``fm_index.cpp:111-131``), constraints are enforced **exactly** without ever
enumerating the full set.  Selection only ever takes the global top ``2K``
candidates by constrained score, so per beam it suffices to know the ``2K``
best *allowed* tokens by LM log-prob.  The default path finds them with an
iterative proposal loop (``_candidates_exact_loop``):

1. take the exact top-``top_m`` LM tokens not yet examined and *validate*
   each with one batched backward-search step (2 binary searches);
2. stop as soon as every beam has ``2K`` validated continuations (provably
   exact: every unexamined token scores below all accepted ones), is
   *window-exhaustive* (interval <= ``window`` rows, so the gathered BWT
   window enumerates its distinct set completely), is finished/stop-forced
   (allowed set is just PAD/EOS), or the vocab is exhausted.

Natural LM distributions satisfy nearly every beam in the first iteration,
so the steady-state cost equals one speculative round -- but the result is
bit-identical to the dense reference semantics.  ``speculative=True``
restores the round-1 approximate mode (single approx-top-M round, no loop);
``exact_mask=True`` keeps the dense O(vocab) rank sweep used by parity tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import api as model_api
from seal_tpu.models.config import BartConfig
from seal_tpu.ops import fm_ops

NEG_INF = float(np.finfo(np.float32).min) / 2  # large-negative, -inf-safe

# Dense parity mode (exact_mask=True) materializes several [B, K, V]
# tensors plus a packed sort over B x (K*V) keys per decode step.  Past
# ~2^24 candidate slots this has been observed to hard-crash the TPU
# worker (kernel fault) rather than fail cleanly -- e.g. batch 32 x beam
# 15 x 50k vocab = 24.1M slots.  Refuse before dispatch instead; the
# default exact proposal loop is bit-identical to dense semantics at any
# shape and is the production path.
DENSE_MASK_BUDGET = 1 << 24
# the kernel fault is TPU-specific; CPU handles these shapes (slowly), and
# the large-shape dense-parity differentials run there
DENSE_GUARD_BACKENDS = frozenset({"tpu", "axon"})


def check_dense_budget(cfg: "DecodeConfig", batch: int, vocab: int) -> None:
    """Raise before dispatch when the dense parity mask would be too large.

    Fires only on ``DENSE_GUARD_BACKENDS`` (TPU): the kernel fault it
    guards against is TPU-specific, and CPU is where the large-shape
    dense-parity differentials run.
    """
    if not cfg.exact_mask or cfg.disable_fm_index:
        return
    if jax.default_backend() not in DENSE_GUARD_BACKENDS:
        return
    slots = batch * cfg.num_beams * vocab
    if slots > DENSE_MASK_BUDGET:
        raise ValueError(
            f"exact_mask=True would materialize a dense constraint mask of "
            f"{batch} (batch) x {cfg.num_beams} (beams) x {vocab} (vocab) = "
            f"{slots} slots, over the budget of {DENSE_MASK_BUDGET}; shapes "
            f"this large crash the TPU worker. Use the default exact "
            f"proposal loop (exact_mask=False -- bit-identical results), or "
            f"reduce the batch size."
        )


class SingleIndexOps:
    """Constraint-op adapter over one device index.

    The fused decoder talks to the index only through this interface, so a
    corpus-sharded index can drop in (``seal_tpu.parallel.sharded_decode``:
    per-shard local ranges + psum/all_gather merges inside shard_map), and
    the compact wavelet-tree layout (``seal_tpu.index.wavelet``) swaps in by
    module dispatch.
    """

    def __init__(self, index):
        from seal_tpu.index.wavelet import WaveletFMIndex
        from seal_tpu.ops import wt_ops

        self.index = index
        self._wt = isinstance(index, WaveletFMIndex)
        self._ops = wt_ops if self._wt else fm_ops

    def full_range(self, shape):
        return self.index.full_range(shape)

    def range_for(self, tokens, lengths):
        return self._ops.range_for_sequences(self.index, tokens, lengths)

    def corpus_mask(self):
        return self.index.corpus_counts > 0

    def validate(self, tokens, lo, hi):
        return self._ops.validate_tokens(self.index, tokens, lo, hi)

    def contains(self, tokens, lo, hi):
        """Membership (== validate > 0) at half the gather traffic on the
        Psi layout; the decode proposal loop only consumes count > 0."""
        return self._ops.contains_tokens(self.index, tokens, lo, hi)

    def window(self, lo, hi, w):
        return self._ops.window_continuations(self.index, lo, hi, w)

    def extend(self, tokens, lo, hi):
        return self._ops.extend_ranges(self.index, tokens, lo, hi)

    def range_size(self, lo, hi):
        return hi - lo

    def window_exhaustive(self, lo, hi, w):
        """True where the w-row window enumerates the whole interval."""
        return (hi - lo) <= w

    def interval_covered(self, lo, hi, rows_done):
        """True where the first ``rows_done`` rows enumerate all of [lo, hi)."""
        return (hi - lo) <= rows_done

    def bucket_counts(self, lo, hi):
        return self._ops.bucket_counts(self.index, lo, hi)

    def bucket_size(self):
        if self._wt:
            from seal_tpu.ops.wt_ops import bucket_size_of

            return bucket_size_of(self.index)
        return self.index.bucket_size

    def n_buckets(self):
        return self._ops.bucket_counts_width(self.index)

    def dense_counts(self, lo, hi, chunk):
        return self._ops.dense_counts(self.index, lo, hi, chunk=chunk)


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Static generation knobs (hashable -> part of the jit signature)."""

    num_beams: int = 5
    max_length: int = 25  # total decoder length incl. decoder_start
    min_length: int = 3
    eos_token_id: int = 2
    pad_token_id: int = 1
    decoder_start_token_id: int = 2
    forced_bos_token_id: Optional[int] = None
    force_decoding_from: Optional[Tuple[int, ...]] = None
    stop_at_count: int = 0
    always_allow_eos: bool = False
    disable_fm_index: bool = False
    top_m: int = 256  # speculative-mode candidates / sample-mode buffer size
    window: int = 128  # BWT rows enumerated per beam per step
    exact_chunk: int = 64  # LM candidates validated in exact proposal round 0
    # (64 again: the post-selection soundness proof (_fast_exact_select)
    # makes a failed per-beam round-0 proof harmless unless the beam's
    # missed-token bound reaches the selection cutoff, so round 0 no longer
    # needs to over-sweep; v5e A/B (scripts/bench_tune.py, round 3):
    # 64 -> 144.6 q/s sync vs 128 -> 100.1 at the bench config)
    exact_topk_blk: int = 0  # _exact_topk block width for the round-0
    #   exact top-chunk; 0 = auto (128 for B*K <= 1024, else 32).  128 is
    #   the f32 lane width, so the [rows, nb, blk] block view of lp
    #   re-tiles with no lane padding -- v5e A/B (scripts/bench_tune.py,
    #   round 5) at the bench shape (480 rows): pipelined 268-330 q/s at
    #   blk 128 vs 236-277 at the round-4 blk 32, identical outputs.  At
    #   the config5 shape (2048 rows) the preference INVERTS (sync 83 vs
    #   68 q/s): the wider one-hot gather operand stops fitting the
    #   fusion budget, so wide-row programs keep 32.
    exact_loop_chunk: int = 0  # LM candidates per straggler round (0 = auto).
    # Rounds past 0 exist only for beams whose round-0 proof failed (fewer
    # than 2K allowed tokens among the top-exact_chunk LM candidates, with
    # the interval not yet slab-covered); one straggler beam costs a whole
    # extra round, so these rounds sweep a much wider chunk to finish in
    # one shot -- the per-lane cost is small (the validate chain is
    # depth-bound) next to the cost of an additional round.
    speculative: bool = False  # single approx round (round-1 mode); default
    #   is the exact proposal loop, which matches dense semantics bit-for-bit
    exact_mask: bool = False  # dense O(vocab) mask (parity mode)
    dense_chunk: int = 2048
    exact_ties: bool = False  # resolve equal-score ties (beam, token)-asc
    #   like the token-indexed dense candidate axis; costs a two-key sort
    #   per selection (~15% at the bench config).  Ties are measure-zero
    #   for real models -- the torch reference's own tie order is whatever
    #   its unstable topk returns -- so the fast path is the default.
    sample: bool = False  # num_beams independent constrained samplers
    topk: int = 0  # TopKLogitsWarper on the raw logits (0 = off)
    adjust_logits_fn: Optional[Callable] = None  # model-specific raw-logit
    #   hook (reference beam_search.py:248 calls
    #   `model.adjust_logits_during_generation(logits, cur_len)` -- Marian
    #   pins pad to -inf / forces EOS at max length; BART/T5 are no-ops).
    #   Must be a PURE jax function of (logits [rows, V], cur_len) -- it is
    #   traced into the step, and cur_len is a traced int32 inside the scan.
    #   Compared/hashed by identity (part of the jit signature), so pass a
    #   module-level function, not a fresh lambda per call.
    num_groups: int = 1  # diverse beam groups
    diversity_penalty: float = 0.0  # Hamming diversity between groups
    force_full: bool = False  # run every step through the proven-exact
    #   proposal loop instead of the round-0 fast path.  The production
    #   flow never sets this directly: the fast scan reports unsound steps
    #   via ``fallback_steps``, and the HOST redispatches with
    #   force_full=True only then (generate.py) -- an in-program per-step
    #   lax.cond stalled the pipeline ~2 ms/step and a whole-scan cond
    #   cost ~10% even when never taken (round-4 device measurements)

    def __post_init__(self):
        if self.num_groups > 1 and self.num_beams % self.num_groups:
            raise ValueError("num_beams must be divisible by num_groups")
        if self.sample and self.num_groups > 1:
            raise ValueError("sample and diverse groups are mutually exclusive")

    @property
    def num_steps(self) -> int:
        n = self.max_length - 1
        if self.forced_bos_token_id is not None:
            n -= 1
        return max(n, 0)

    @property
    def group_size(self) -> int:
        return self.num_beams // self.num_groups


@struct.dataclass
class BeamSearchOutput:
    """Device outputs of the fused scan (host arrays after jit)."""

    cand_tokens: Any  # int32 [S, B, 2K]   all candidates per step
    cand_parents: Any  # int32 [S, B, 2K]  parent beam of each candidate
    cand_scores: Any  # f32  [S, B, 2K]    cumulative unconstrained scores
    cand_finite: Any  # bool [S, B, 2K]    constrained score was finite
    sel_tokens: Any  # int32 [S, B, K]     continuing-beam tokens
    sel_parents: Any  # int32 [S, B, K]
    final_scores: Any  # f32 [B, K]        cumulative scores of final beams
    final_tokens: Any  # int32 [B, K, L]   final beam token buffers
    final_valid: Any  # bool [B, K]        beam never back-filled from a
    #   masked candidate (when every legal continuation is EOS, the
    #   first-K-non-EOS rule back-fills beams from -inf candidates; the
    #   reference emits those too and relies on the searcher's count filter,
    #   retrieval.py:91 -- we drop them at extraction)
    fallback_steps: Any = None  # int32 []  decode steps whose fast round-0
    #   soundness proof failed and ran the full proposal loop
    #   (constrained.py::_fast_exact_select); 0 outside the fast-exact mode.
    #   Pure diagnostics -- a corpus shape that falls back every step shows
    #   up as a throughput regression with no other signal (round-3 review).


def _log_softmax(logits):
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _adjust_logits(logits, cur_len, cfg: DecodeConfig):
    """``model.adjust_logits_during_generation`` hook point (reference
    beam_search.py:248; HF semantics: cur_len = the column the sampled
    token will occupy).  Runs on RAW logits before warpers/log-softmax."""
    if cfg.adjust_logits_fn is None:
        return logits
    return cfg.adjust_logits_fn(logits, cur_len)


def _apply_topk_warper(logits, cfg: DecodeConfig):
    """HF TopKLogitsWarper on the raw logits (reference beam_search.py:249-250)."""
    if cfg.topk <= 0:
        return logits
    kth = lax.top_k(logits, cfg.topk)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _apply_min_length(lp, cur_len, cfg: DecodeConfig):
    """HF MinLengthLogitsProcessor: ban EOS while cur_len < min_length."""
    ban = cur_len < cfg.min_length
    eos_col = lp[:, cfg.eos_token_id]
    lp = lp.at[:, cfg.eos_token_id].set(jnp.where(ban, NEG_INF, eos_col))
    return lp


def _candidates_general(
    ops,
    cfg: DecodeConfig,
    lp,  # [B*K, V] processed logprobs
    lo,  # [B, K]
    hi,  # [B, K]
    prev_count,  # [B, K]
    finished,  # [B, K] bool: last token was EOS or PAD
):
    """Build the per-beam candidate set for steps >= 1.

    Returns (tokens, allowed, cand_lp): each [B, K, Ncand].
    """
    B, K = lo.shape
    V = lp.shape[-1]

    if cfg.exact_mask and not cfg.disable_fm_index:
        # dense parity mode: the candidate set is the whole vocab
        counts = ops.dense_counts(lo, hi, cfg.dense_chunk)  # [B,K,V]
        tokens = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, K, V))
        fm_valid = counts > 0
        cand_lp = lp.reshape(B, K, V)
        return _apply_branches(cfg, tokens, fm_valid, cand_lp, prev_count, finished)

    if cfg.disable_fm_index:
        # free generation must reproduce exact beam search: use exact top-k
        # (block-decomposed; bit-identical to lax.top_k, see _exact_topk)
        top_lp, top_tok = _exact_topk(lp, cfg.top_m, blk=32, assume_finite=True)
        tokens = top_tok.reshape(B, K, -1).astype(jnp.int32)
        top_lp = top_lp.reshape(B, K, -1)
        fm_valid = jnp.ones(tokens.shape, bool)
        return _apply_branches(cfg, tokens, fm_valid, top_lp, prev_count, finished)

    # --- loop-invariant candidate slots (lp stays FLAT [B*K, V]) -----------
    (win_tok, win_valid, win_lp, eos_tok, eos_lp, pad_tok, pad_lp) = _exact_slots(
        ops, cfg, lp, lo, hi
    )

    if cfg.speculative:
        # round-1 mode: one approximate proposal round.  approx_max_k rides
        # the TPU's hardware top-k path; a missed candidate only shrinks the
        # proposal set, never produces an invalid key.
        eos_ok = ops.contains(eos_tok, lo, hi)
        top_lp, top_tok = lax.approx_max_k(lp, cfg.top_m, recall_target=0.95)
        top_tok = top_tok.reshape(B, K, -1).astype(jnp.int32)
        top_lp = top_lp.reshape(B, K, -1)
        top_valid = ops.contains(top_tok, lo, hi)
    else:
        # the EOS column rides the hoisted first proposal round's rank call
        # (one serialized binary-search chain per step instead of two)
        top_tok, top_lp, top_valid, eos_ok = _exact_proposals(
            ops, cfg, lp, lo, hi, prev_count, finished, pad_lp, eos_tok
        )

    tokens = jnp.concatenate([top_tok, win_tok, eos_tok, pad_tok], -1)
    fm_valid = jnp.concatenate(
        [top_valid, win_valid, eos_ok, jnp.zeros((B, K, 1), bool)], -1
    )
    cand_lp = jnp.concatenate([top_lp, win_lp, eos_lp, pad_lp], -1)
    # candidate ORDER is free here: selection tie-breaks on (score, token)
    # via the packed sort key (_pack_desc), matching dense mode's
    # token-indexed candidate axis whichever slot discovered a token
    return _apply_branches(cfg, tokens, fm_valid, cand_lp, prev_count, finished)


def _exact_slots(ops, cfg: DecodeConfig, lp, lo, hi):
    """Loop-invariant candidate slots shared by every proposal path:
    the exhaustive small-interval window plus explicit EOS/PAD slots
    (PAD is in no corpus; EOS is handled by the branch logic).

    ``lp`` is FLAT [B*K, V]: a [B, K, V] view forces XLA to re-tile the
    whole matrix ([15, 50265] trailing dims tile-pad 15 -> 16 -- a 96 MB
    physical copy per step in the round-4 device trace), so every V-wide
    read here indexes the natural 2-D layout and only the narrow outputs
    reshape to [B, K, ...].
    """
    B, K = lo.shape
    win_tok, win_valid = ops.window(lo, hi, cfg.window)
    win_tok = jnp.where(win_valid, win_tok, cfg.pad_token_id).astype(jnp.int32)
    w = win_tok.shape[-1]
    win_lp = jnp.take_along_axis(lp, win_tok.reshape(B * K, w), axis=-1).reshape(
        B, K, w
    )
    eos_tok = jnp.full((B, K, 1), cfg.eos_token_id, jnp.int32)
    eos_lp = lp[:, cfg.eos_token_id].reshape(B, K, 1)
    pad_tok = jnp.full((B, K, 1), cfg.pad_token_id, jnp.int32)
    pad_lp = lp[:, cfg.pad_token_id].reshape(B, K, 1)
    return win_tok, win_valid, win_lp, eos_tok, eos_lp, pad_tok, pad_lp


def _exact_topk(x, k: int, blk: int = 64, assume_finite: bool = False):
    """``lax.top_k(x, k)`` with identical (value desc, index asc) tie
    semantics via exact block-max pre-selection: every block containing a
    true top-k element has block-max >= the k-th value, so the k best
    blocks by (max desc, block asc) -- lax.top_k's own tie order -- cover
    the exact top-k set, and gathering the chosen blocks in ascending
    index order preserves the global tie-break.  ``x`` must be NaN-free.

    The chosen blocks are gathered with a one-hot f32 matmul (exact: one
    unit coefficient per output row, and adding zeros never rounds), which
    rides the MXU instead of the scalar-gather path -- measured on v5e at
    the bench shape [480, 50265] k=64: 2.7 ms vs 6.3 ms for the TPU TopK
    custom call (an earlier take_along_axis column gather was SLOWER than
    TopK, which is why round 3 shelved this primitive).  ``assume_finite``
    skips the -inf restore pass for callers whose input provably contains
    no -inf (log-softmax outputs): -inf entries are clamped to
    ``float32.min`` for the matmul (0 * -inf would poison sums with NaN)
    and mapped back afterwards.
    """
    V = x.shape[-1]
    nb = -(-V // blk)
    if k * blk * 2 >= V or x.ndim != 2:
        return lax.top_k(x, k)
    rows = x.shape[0]
    fmin = float(np.finfo(np.float32).min)
    xs = x if assume_finite else jnp.maximum(x, fmin)
    pad = nb * blk - V
    mm = rows * k * nb * 4 <= (1 << 30)
    if mm and pad and blk % 128 == 0:
        # lane-aligned tail split (see the gather below): the [rows, nfull,
        # blk] view of the leading full blocks is a BITCAST of x's native
        # T(8,128) tiling, so block maxes are a minor-dim reduce on the view
        # plus one tiny tail max -- no reduce_window, whose window/stride
        # formulation made XLA feed it a COLUMN-MAJOR copy of the whole
        # matrix (round-5 optimized HLO: copy {0,1} of f32[480,50265])
        nfull = V // blk
        xv = xs[:, : nfull * blk].reshape(rows, nfull, blk)
        bm = jnp.concatenate(
            [xv.max(-1), xs[:, nfull * blk :].max(-1, keepdims=True)], -1
        )
    else:
        # reduce_window pads virtually (the earlier pad+reshape+max
        # formulation materialized a physical pad copy, round-4 trace)
        bm = lax.reduce_window(
            xs, fmin, lax.max, (1, blk), (1, blk), ((0, 0), (0, nb * blk - V))
        )
    _, bidx = lax.top_k(bm, k)
    bidx = jnp.sort(bidx, axis=-1)
    # one-hot matmul gather wins at BOTH operating shapes (v5e, round 4
    # selparts A/B): [480, 50265] k=64 1.53 ms vs 1.81 take_along /
    # 3.00 flat-take / 5.83 TopK; [2048, 50265] 7.3 ms vs 11.7
    # take_along.  The old 256 MB guard routed the beam-32/batch-64
    # class to take_along and cost config5 ~4.4 ms/step; the one-hot
    # operand there is 824 MB of transient HBM -- fine on a 16 GB chip,
    # so the guard now only protects truly degenerate shapes.
    # Contraction order: xblk's nb axis is its SECOND-minor -- the
    # natural row-major rhs of a matmul -- so contracting (xblk, onehot)
    # and transposing the small [rows, blk, k] result keeps the big
    # operand in x's native layout instead of re-tiling 96 MB
    if mm and pad:
        # tail-block split: padding x physically costs a SECOND full-matrix
        # materialization on top of the unavoidable block-view re-tile
        # (round-5 device trace: pad.0 + reshape copy, each ~0.11 ms/step at
        # the bench shape).  Gather only the nfull FULL blocks (a slice whose
        # reshape is the one re-tile) and append the tail columns -- padded
        # to one lane-width block, a [rows, blk] copy -- as an always-present
        # final slab segment.  A chosen TAIL block's gathered row is dead
        # (its one-hot column is out of range -> all-zero coefficients) and
        # is masked to fmin; dead rows can never reach the top-k: the slab
        # positions before them hold (k-1)*blk >= k genuine entries, each of
        # which beats a dead fmin slot on value or (at fmin ties) on lower
        # position, so every dead slot is dominated k times over.  Slab
        # column order stays ascending-original-column (bidx sorted asc,
        # tail = the largest block id = last), preserving tie order.
        nfull = V // blk
        xblk = xs[:, : nfull * blk].reshape(rows, nfull, blk)
        tail = jnp.pad(
            xs[:, nfull * blk :], ((0, 0), (0, pad)), constant_values=fmin
        )
        onehot = (bidx[:, :, None] == jnp.arange(nfull, dtype=jnp.int32)).astype(
            jnp.float32
        )
        gt = lax.dot_general(
            xblk,
            onehot,
            (((1,), (2,)), ((0,), (0,))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        g = jnp.swapaxes(gt, 1, 2)  # [rows, k, blk]
        g = jnp.where((bidx == nfull)[..., None], fmin, g)
        slab = jnp.concatenate([g.reshape(rows, k * blk), tail], -1)
    else:
        xp = jnp.pad(xs, ((0, 0), (0, pad)), constant_values=fmin) if pad else xs
        xblk = xp.reshape(-1, nb, blk)
        if mm:
            onehot = (bidx[:, :, None] == jnp.arange(nb, dtype=jnp.int32)).astype(
                jnp.float32
            )
            gt = lax.dot_general(
                xblk,
                onehot,
                (((1,), (2,)), ((0,), (0,))),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [rows, blk, k]; gt[r, :, j] == xblk[r, bidx[r, j], :], exactly
            g = jnp.swapaxes(gt, 1, 2)
        else:
            g = jnp.take_along_axis(xblk, bidx[:, :, None], axis=1)
        slab = g.reshape(rows, k * blk)
    # second-stage selection: the slab's column order IS ascending
    # original-column order (bidx sorted asc, within-block offsets asc), so
    # any exact (value desc, index asc) top-k of the slab tie-breaks
    # identically to the original -- including a RECURSIVE block-decomposed
    # pass.  Recurse with blk=32 where legal (the k*blk*2 >= V guard above
    # makes this a no-op for blk <= 64): at the bench shape the slab is
    # [480, 16384] and the TPU TopK custom call there was the largest single
    # op in the round-5 device trace (6.7 ms standalone; recursion 3.2 ms)
    v, i = _exact_topk(slab, k, blk=32, assume_finite=True)
    # original column ids arithmetically: i = j * blk + off addresses the
    # j-th chosen block -- a [rows, k]-from-[rows, k] selection (_sel1)
    # replaces the round-4-trace 0.31 ms/step scalar gather of a
    # precomputed [rows, k*blk] cols table; slab positions past k*blk are
    # the appended tail segment, whose columns start at nfull*blk
    j = jnp.minimum(i // blk, k - 1)
    idx = _sel1(bidx, j) * blk + (i - j * blk)
    if mm and pad:
        idx = jnp.where(i >= k * blk, (V // blk) * blk + (i - k * blk), idx)
    if not assume_finite:
        # clamped -inf entries sort identically (nothing is below fmin) but
        # must report their true value.  Exact because a genuine x value can
        # never EQUAL float32.min here: callers feed log-prob-derived scores
        # (bounded far above fmin) or NEG_INF (= fmin/2) sentinels
        v = jnp.where(v == fmin, -jnp.inf, v)
    return v, idx


def _exact_proposals(
    ops, cfg: DecodeConfig, lp, lo, hi, prev_count, finished, pad_lp, eos_tok,
    round0_only: bool = False,
):
    """Per beam, the ``n_buf`` best *allowed* tokens by LM log-prob -- exact.

    Round 0 is HOISTED out of the while loop (it skips the consumed-prefix
    masking -- nothing is consumed yet), and the WHOLE proposal machinery
    (round 0 + loop) sits under ``lax.cond(any(~exempt))``: once every
    beam is finished / stop-forced / window-exhaustive -- the steady state
    after the first few steps, when intervals have shrunk below the window
    -- the TopK custom call and the validate rank chain (together ~45% of
    a decode step, profiled round 3) are skipped entirely, bit-exactly:
    exempt beams' proposals can only duplicate window slots.  The EOS
    column rides round 0's membership query when proposals run, and gets
    its own short single-chain query in the skip branch.  Returns
    (buf_tok, buf_lp, buf_valid, eos_ok).

    Each round does two sweeps in parallel: an exact top-``chunk`` slice of
    the not-yet-examined LM distribution (validated with rank queries) and a
    ``chunk``-row slab of the interval's own BWT rows (allowed by
    construction).  A beam terminates as soon as ANY of these hold:

    * ``n_buf`` validated tokens -- all unexamined tokens score lower, so
      the buffer is provably the top-``n_buf`` allowed set;
    * its interval is fully slab-enumerated -- the buffer holds every
      distinct continuation (top-``n_buf`` of them by lp);
    * it is window-exhaustive / finished / stop-forced (no enumeration
      needed);
    * the pruned LM support is exhausted (``dead``).

    Worst-case rounds per step = min(support/chunk, interval/chunk); on
    natural LM distributions the LM sweep satisfies everything in one round.
    This is the device equivalent of the reference's exact
    ``interval_symbols`` masks (``fm_index.cpp:78-131``).

    ``lp`` is FLAT [B*K, V] (see _exact_slots on why).
    """
    B, K = lo.shape
    V = lp.shape[-1]
    two_k = 2 * cfg.num_beams
    # sampling draws from the whole allowed distribution, so give it the
    # full top_m budget; beam modes only ever select 2K candidates
    n_buf = max(two_k, cfg.top_m) if cfg.sample else two_k
    # a chunk must be able to fill the buffer in one round at realistic
    # validation rates; n_buf == chunk would demand a perfect round
    chunk = min(V, max(cfg.exact_chunk, 2 * n_buf))
    # straggler rounds sweep wider: the proof they need (n_buf allowed
    # tokens above the consumed threshold, or a covered interval) is far
    # likelier per round, and lane cost is cheap next to round count
    chunk_l = min(V, max(cfg.exact_loop_chunk or 4 * chunk, chunk))

    count_eff = jnp.where(finished, 0, prev_count)
    stop_trig = (cfg.stop_at_count > 0) & (count_eff <= cfg.stop_at_count)
    exempt = finished | stop_trig | ops.window_exhaustive(lo, hi, cfg.window)

    from seal_tpu.index.fm_index import SHIFT

    v_idx = jnp.arange(V, dtype=jnp.int32)

    v_bucket = (v_idx + SHIFT) // ops.bucket_size()

    def proposal_lp(it, bcounts):
        # Bucket-level support pruning, deferred to the moment a second
        # proposal round is actually needed: a token whose symbol bucket has
        # zero occurrences in [lo, hi) cannot continue the range, so masking
        # it bounds the sweep by the interval's *bucket footprint* instead
        # of the vocab -- collapsing the adversarial case (large interval,
        # few distinct continuations, all unlikely under the LM).  The first
        # round runs on the raw distribution (its exact top-chunk is a
        # superset of the pruned one), so satisfied steps never pay for it.
        # ``bcounts`` is computed once (round 1) and loop-carried.
        def pruned(bc):
            support = (
                jnp.take(bc.reshape(B * K, -1), v_bucket, axis=-1) > 0
            )  # [B*K, V]
            return jnp.where(support, lp, NEG_INF)

        return lax.cond(it >= 1, pruned, lambda _: lp, bcounts)

    def merge_round(buf_tok, buf_lp, buf_valid, top_tok, top_lp, valid, rows_prev, width):
        # Interval slab: each round also enumerates ``width`` of the
        # interval's own BWT rows [lo + rows_prev, lo + rows_prev + width)
        # directly (every symbol there IS an allowed continuation -- no
        # validation needed).  A beam whose interval has fewer than n_buf
        # distinct continuations can never fill the buffer from the LM
        # sweep; the slab guarantees it terminates once the interval is
        # fully enumerated, with the provably complete distinct set,
        # instead of grinding through its whole bucket-support footprint
        # (the beam-32 pathological case: many rows, few distinct symbols,
        # none of them LM-likely).
        s_lo = jnp.minimum(lo + rows_prev, hi)
        s_hi = jnp.minimum(s_lo + width, hi)
        slab_tok, slab_ok = ops.window(s_lo, s_hi, width)
        # sharded ops return the psum-union of n_shards * width columns
        # (sharded_decode.ShardedIndexOps.window); use the ACTUAL returned
        # width, not the per-shard request width (round-4 regression:
        # reshape(B*K, width) crashed every n_shards >= 2 decode at trace)
        w_out = slab_tok.shape[-1]
        slab_tok = jnp.where(slab_ok, slab_tok, 0).astype(jnp.int32)
        slab_lp = jnp.take_along_axis(
            lp, slab_tok.reshape(B * K, w_out), axis=-1
        ).reshape(B, K, w_out)
        slab_ok = slab_ok & (slab_lp > NEG_INF / 2)

        # merge: back-fill the buffer with this round's validated tokens.
        # lp is globally descending across chunks and lax.top_k breaks score
        # ties by lower index, so buffer order stays (lp desc, token asc) --
        # the same candidate ordering the dense parity mode produces.  Slabs
        # may repeat a token (several rows, or one the LM sweep already
        # holds): collapse duplicates, uniquifying invalid slots out of the
        # way first so a dead slot's arbitrary token id cannot shadow a
        # genuinely valid copy.
        all_tok = jnp.concatenate([buf_tok, top_tok, slab_tok], -1)
        all_lp = jnp.concatenate([buf_lp, top_lp, slab_lp], -1)
        all_valid = jnp.concatenate([buf_valid, valid, slab_ok], -1)
        uniq = jnp.where(
            all_valid,
            all_tok,
            V + jnp.arange(all_tok.shape[-1], dtype=jnp.int32),
        )
        fresh = _dedup_mask(uniq)
        rank_score = jnp.where(all_valid & fresh, all_lp, NEG_INF)
        # retention by (lp desc[, token asc under exact_ties]) -- invalid
        # slots carry unique ids >= V and NEG_INF scores: they sort last.
        # _sel1: masked reductions instead of three scalar-gather streams
        keep = _top_idx(cfg, rank_score, uniq, n_buf)
        return (
            _sel1(all_tok, keep),
            _sel1(all_lp, keep),
            _sel1(all_valid & fresh, keep),
        )

    def round0_state():
        # ---- hoisted round 0: raw distribution, EOS column piggybacked --
        # (membership, not counts: ops.contains is ONE binary-search chain
        # on the Psi layout -- half the rank-gather traffic, the dominant
        # constraint-op cost at the bench config, profiled round 3)
        buf_tok = jnp.full((B, K, n_buf), 0, jnp.int32)
        buf_lp = jnp.full((B, K, n_buf), NEG_INF, jnp.float32)
        buf_valid = jnp.zeros((B, K, n_buf), bool)
        # block-decomposed exact top-k (bit-identical to lax.top_k, ~2.6x
        # faster at vocab scale on v5e); lp is a log-softmax output, hence
        # -inf-free
        blk0 = cfg.exact_topk_blk or (128 if B * K <= 1024 else 32)
        top_lp0, top_tok0 = _exact_topk(lp, chunk, blk=blk0, assume_finite=True)
        top_tok0 = top_tok0.reshape(B, K, chunk).astype(jnp.int32)
        top_lp0 = top_lp0.reshape(B, K, chunk)
        ok0 = ops.contains(jnp.concatenate([top_tok0, eos_tok], -1), lo, hi)
        eos_ok = ok0[..., chunk:]
        valid0 = ok0[..., :chunk] & (top_lp0 > NEG_INF / 2)
        buf_tok, buf_lp, buf_valid = merge_round(
            buf_tok, buf_lp, buf_valid, top_tok0, top_lp0, valid0, 0, chunk
        )
        # Consumed-prefix threshold: every round consumes a further prefix of
        # the per-beam (lp desc, token asc) order -- lax.top_k's exact
        # tie-break -- so "already examined" is one (lp, token) pair per beam.
        # Masking by comparison against it replaces the round-1 design's
        # scatter of consumed slots into a carried [B, K, V] tensor: no
        # scatter op (slow on TPU) and ~400 MB less loop-carried HBM traffic
        # at the beam-32/batch-64 config.
        th_lp0 = top_lp0[..., -1]
        th_ix0 = top_tok0[..., -1]
        dead0 = top_lp0[..., 0] <= NEG_INF / 2  # proposal space exhausted
        covered0 = ops.interval_covered(lo, hi, chunk)
        bc0 = jnp.zeros((B, K, ops.n_buckets()), jnp.int32)
        state = (
            th_lp0, th_ix0, buf_tok, buf_lp, buf_valid, dead0, covered0, bc0,
            jnp.int32(1),
        )
        return state, eos_ok

    def run_proposals(_):
        state, eos_ok = round0_state()

        def cond(state):
            th_lp, th_ix, buf_tok, buf_lp, buf_valid, dead, covered, bcounts, it = state
            n_valid = buf_valid.sum(-1)
            # A full buffer proves top-n_buf completeness ONLY if its minimum
            # retained lp dominates every unexamined token (all <= th_lp, the
            # consumed-prefix threshold).  The interval slab can fill the
            # buffer with valid-but-low-lp tokens the LM sweep never reached;
            # without the threshold check a higher-lp allowed token past the
            # examined prefix would be silently dropped (found by review,
            # round 3 -- see tests/test_exact_proposals.py::
            # test_slab_filled_buffer_does_not_stop_lm_sweep).  An unexamined
            # token tying buf-min exactly falls under the documented
            # equal-score tie semantics (PARITY.md), so >= is sufficient.
            complete = (n_valid >= n_buf) & (buf_lp[..., -1] >= th_lp)
            need = ~exempt & ~dead & ~covered & ~complete
            # backstop: stop once the LM sweep has examined the whole vocab
            # (the dead flag normally fires first)
            return jnp.any(need) & (chunk + (it - 1) * chunk_l < V)

        def body(state):
            th_lp, th_ix, buf_tok, buf_lp, buf_valid, dead, covered, bcounts, it = state
            bcounts = lax.cond(
                it == 1, lambda _: ops.bucket_counts(lo, hi), lambda _: bcounts, None
            )
            base = proposal_lp(it, bcounts)  # [B*K, V]
            th_lp_f = th_lp.reshape(B * K, 1)
            th_ix_f = th_ix.reshape(B * K, 1)
            consumed = (base > th_lp_f) | ((base == th_lp_f) & (v_idx <= th_ix_f))
            work = jnp.where(consumed, NEG_INF, base)
            top_lp, top_tok = lax.top_k(work, chunk_l)
            top_tok = top_tok.reshape(B, K, chunk_l).astype(jnp.int32)
            top_lp = top_lp.reshape(B, K, chunk_l)
            ok = ops.contains(top_tok, lo, hi)
            # exhausted slots carry NEG_INF; exclude them (and true -inf logits)
            valid = ok & (top_lp > NEG_INF / 2)
            rows_prev = chunk + (it - 1) * chunk_l  # slab rows already enumerated
            buf_tok, buf_lp, buf_valid = merge_round(
                buf_tok, buf_lp, buf_valid, top_tok, top_lp, valid, rows_prev, chunk_l
            )
            th_lp = top_lp[..., -1]
            th_ix = top_tok[..., -1]
            # nothing proposable remains once the chunk's best slot is exhausted
            dead = top_lp[..., 0] <= NEG_INF / 2
            covered = ops.interval_covered(lo, hi, rows_prev + chunk_l)
            return th_lp, th_ix, buf_tok, buf_lp, buf_valid, dead, covered, bcounts, it + 1

        _, _, buf_tok, buf_lp, buf_valid, _, _, _, _ = lax.while_loop(cond, body, state)
        return buf_tok, buf_lp, buf_valid, eos_ok

    def skip_proposals(_):
        # Every beam is exempt (finished / stop-forced / window-exhaustive):
        # the window slots already enumerate each live interval exactly, so
        # LM proposals could only duplicate them (identical scores; dedup
        # keeps one copy) -- dropping them is bit-exact.  Profiled round 3:
        # the round-0 TopK custom call + validate rank chain are ~45% of a
        # decode step, and past step ~3 intervals are window-small, so this
        # skip is the single largest step-cost saving.  EOS membership
        # still matters for exempt-but-unfinished beams, so it keeps its
        # own (short, single-chain) membership query in this branch.
        return (
            jnp.full((B, K, n_buf), cfg.pad_token_id, jnp.int32),
            jnp.broadcast_to(pad_lp, (B, K, n_buf)),
            jnp.zeros((B, K, n_buf), bool),
            ops.contains(eos_tok, lo, hi),
        )

    if round0_only:
        # One proposal round, no proof loop.  Returns (buf, eos_ok, need,
        # th_lp): ``need`` marks beams whose buffer is NOT proven complete
        # -- every token such a beam might still be missing has
        # lp <= th_lp, so the caller can check post-selection whether any
        # missed token could have reached the global top-2K cutoff and
        # fall back to the full loop only then (_fast_exact_select).
        def fast0(_):
            state, eos_ok = round0_state()
            th_lp, _, buf_tok, buf_lp, buf_valid, dead, covered, _, _ = state
            complete = (buf_valid.sum(-1) >= n_buf) & (buf_lp[..., -1] >= th_lp)
            need = ~exempt & ~dead & ~covered & ~complete
            return buf_tok, buf_lp, buf_valid, eos_ok, need, th_lp

        def skip0(_):
            bt, bl, bv, eo = skip_proposals(None)
            return (
                bt, bl, bv, eo,
                jnp.zeros((B, K), bool),
                jnp.full((B, K), NEG_INF, jnp.float32),
            )

        buf_tok, buf_lp, buf_valid, eos_ok, need, th_lp = lax.cond(
            jnp.any(~exempt), fast0, skip0, None
        )
        buf_tok = jnp.where(buf_valid, buf_tok, cfg.pad_token_id)
        buf_lp = jnp.where(buf_valid, buf_lp, pad_lp)
        return buf_tok, buf_lp, buf_valid, eos_ok, need, th_lp

    buf_tok, buf_lp, buf_valid, eos_ok = lax.cond(
        jnp.any(~exempt), run_proposals, skip_proposals, None
    )

    # unfilled slots become PAD candidates at PAD's true log-prob, matching
    # what the dense mode scores for the finished->PAD branch
    buf_tok = jnp.where(buf_valid, buf_tok, cfg.pad_token_id)
    buf_lp = jnp.where(buf_valid, buf_lp, pad_lp)
    return buf_tok, buf_lp, buf_valid, eos_ok


def _fast_exact_select(ops, cfg: DecodeConfig, lp, lo, hi, prev_count, finished, beam_scores, K, V, force_full: bool = False):
    """One proposal round + selection, with a post-selection soundness proof.

    The full exact loop proves per-beam buffer completeness BEFORE
    selection, which forces extra sweep rounds whenever fewer than 2K of a
    beam's top-``exact_chunk`` LM tokens are allowed -- measured 40% of
    the decode step at the bench config (round 3).  But per-beam
    completeness is stronger than what selection needs: a beam's missed
    tokens all score ``<= beam_score + th_lp`` (every unexamined or
    evicted token sits at or below the consumed-prefix threshold), so if
    that bound falls strictly below the global 2K-th selected constrained
    score, the missed tokens could never have been selected and the
    round-0 candidate set was sufficient.  Only when some unproven beam's
    bound reaches the cutoff (or ties it -- tie order must match the
    dense mode's) does the full proof loop run, under ``lax.cond``.

    Bit-identical to the dense reference semantics: the fast result is
    used only when provably equal; everything else re-runs through the
    proven-exact loop.  Replaces the reference's per-step
    ``interval_symbols`` masks (``fm_index.cpp:78-131``).

    Returns ``(result8, any_unsound)`` WITHOUT branching: a per-step
    ``lax.cond`` fallback was measured at ~2 ms/step of pipeline-stall
    overhead even when never taken (round-4 device trace), so the caller
    defers the fallback -- it runs the whole fast scan, and only if some
    step was unsound re-runs the scan with ``force_full=True`` (always the
    proven loop, no soundness bookkeeping).  Step sequences are identical
    either way: fast == full whenever sound (the proof), and an unsound
    step re-runs full in both designs.
    """
    B = lo.shape[0]
    # lp stays FLAT [B*K, V] through the whole proposal machinery: a
    # [B, K, V] view costs a 96 MB re-tiling copy per step (_exact_slots)
    (win_tok, win_valid, win_lp, eos_tok, eos_lp, pad_tok, pad_lp) = _exact_slots(
        ops, cfg, lp, lo, hi
    )

    def build_and_select(buf_tok, buf_lp, buf_valid, eos_ok):
        tokens = jnp.concatenate([buf_tok, win_tok, eos_tok, pad_tok], -1)
        fm_valid = jnp.concatenate(
            [buf_valid, win_valid, eos_ok, jnp.zeros((B, K, 1), bool)], -1
        )
        cand_lp = jnp.concatenate([buf_lp, win_lp, eos_lp, pad_lp], -1)
        tokens, allowed, cand_lp = _apply_branches(
            cfg, tokens, fm_valid, cand_lp, prev_count, finished
        )
        cons = jnp.where(allowed, cand_lp, NEG_INF)
        # proposal slots can repeat a window token; duplicates carry
        # identical scores, keep one per token id
        keep = _dedup_mask(tokens)
        cons = jnp.where(keep, cons, NEG_INF)
        return _select(
            cfg,
            cons + beam_scores[..., None],
            cand_lp + beam_scores[..., None],
            tokens,
            K,
            V,
        )

    if force_full:
        # The full proof loop runs round 0 from scratch: its
        # consumed-prefix threshold state must come from ITS OWN exact
        # sweep, and seeding it with the fast branch's buffers would couple
        # the two proposal schedules for a path that fires on a small
        # minority of decodes (see ``fallback_steps`` in BeamSearchOutput
        # -- the observability for exactly this).
        bt, bl, bv, eo = _exact_proposals(
            ops, cfg, lp, lo, hi, prev_count, finished, pad_lp, eos_tok
        )
        return build_and_select(bt, bl, bv, eo)[:8], jnp.zeros((), bool)

    buf_tok, buf_lp, buf_valid, eos_ok, need, th_lp = _exact_proposals(
        ops, cfg, lp, lo, hi, prev_count, finished, pad_lp, eos_tok,
        round0_only=True,
    )
    fast = build_and_select(buf_tok, buf_lp, buf_valid, eos_ok)
    s_star = fast[8][:, -1]  # global 2K-th selected constrained score
    # ``>=``: an exact tie between a missed token and the cutoff would make
    # tie resolution depend on the sweep schedule -- fall back instead
    unsound = need & (beam_scores + th_lp >= s_star[:, None])
    return fast[:8], jnp.any(unsound)


def _apply_branches(cfg: DecodeConfig, tokens, fm_valid, cand_lp, prev_count, finished):
    """Reference branch logic (beam_search.py:114-138) on candidate level."""
    if cfg.disable_fm_index:
        return tokens, jnp.ones(tokens.shape, bool), cand_lp
    is_eos = tokens == cfg.eos_token_id
    is_pad = tokens == cfg.pad_token_id
    count_eff = jnp.where(finished, 0, prev_count)  # beam_search.py:90-93
    stop_trig = (cfg.stop_at_count > 0) & (count_eff <= cfg.stop_at_count)
    allowed = jnp.where(
        stop_trig[..., None],
        is_eos,
        jnp.where(finished[..., None], is_pad, fm_valid),
    )
    if cfg.always_allow_eos:
        allowed = allowed | is_eos
    return tokens, allowed, cand_lp


def resolve_window(window: int, num_beams: int, speculative: bool) -> int:
    """0/None = auto.  Measured on v5e (BASELINE.md): small beams prefer a
    narrow window (the exempt short-circuit rarely pays; slot width is pure
    overhead -- beam 15: 102 vs 97 q/s at 32 vs 128), large beams prefer a
    wide one (2K-sized buffers are hard to fill, so exempting mid-size
    intervals avoids proposal rounds -- beam 32: 30.5 vs 29.2 q/s at 128 vs
    32).  Speculative mode keeps 128: there the window is a FIDELITY budget
    (round-1 measurements are at 256/128), not just a fast path.
    """
    if window:
        return window
    if speculative:
        return 128
    return 32 if num_beams <= 16 else 128


TOK_BITS = 17  # minimum token-id field width in selection tie-break ids


def _top_by_score_then_id(score, tie_id, k: int):
    """Indices of the ``k`` best entries by (score desc, tie_id asc).

    Dense parity mode indexes candidates by (beam, token id), so every
    equal-score tie must resolve to that order whichever slot discovered a
    token.  Floats map monotonically to uint32 (sign-flip trick) and a
    two-key ``lax.sort`` implements the lexicographic order -- int64 key
    packing is unavailable without the x64 flag.  Scores are never NaN here;
    masked slots carry NEG_INF.
    """
    u = lax.bitcast_convert_type(jnp.asarray(score, jnp.float32), jnp.uint32)
    mono = jnp.where(u >= jnp.uint32(2**31), ~u, u | jnp.uint32(2**31))
    idx = jnp.broadcast_to(
        jnp.arange(score.shape[-1], dtype=jnp.int32), score.shape
    )
    _, _, out = lax.sort(
        (~mono, jnp.asarray(tie_id, jnp.int32), idx),
        dimension=-1,
        num_keys=2,
        is_stable=False,
    )
    return out[..., :k]


def _beam_tok_tie(flat_tok, ncand: int, vocab: int):
    """Tie-break ids for a [B, K*ncand] candidate axis: (parent beam, token)
    in dense mode's beam-major flat order.

    The token field widens with the vocabulary (mT5/NLLB-class vocabs
    exceed the 2^17 minimum; clipping there would collapse all high ids to
    one tie id and silently corrupt the exact_ties order).  The packed key
    must stay int32: beams x vocab beyond that range cannot be tie-packed.
    """
    bits = max(TOK_BITS, int(vocab - 1).bit_length())
    n_parents = -(-flat_tok.shape[-1] // ncand)
    if (n_parents << bits) > 2**31 - 1:
        raise ValueError(
            f"exact_ties tie ids need {bits} token bits x {n_parents} beams "
            f"-- exceeds int32; reduce beams or disable exact_ties"
        )
    parent = jnp.arange(flat_tok.shape[-1], dtype=jnp.int32) // ncand
    tok = jnp.clip(flat_tok, 0, (1 << bits) - 1)
    return (parent << bits) + tok


def _top_idx(cfg: DecodeConfig, score, tie_id, k: int):
    """Top-k indices by score; ``exact_ties`` adds the (beam, token) order."""
    if cfg.exact_ties:
        return _top_by_score_then_id(score, tie_id, k)
    _, idx = lax.top_k(score, k)
    return idx


def _sel1(arr, idx):
    """``jnp.take_along_axis(arr, idx, axis=-1)`` for NARROW last dims, as a
    masked reduction instead of a gather.

    A take_along_axis of m elements per row lowers to the TPU's serialized
    scalar-gather path (~14 ns/element regardless of operand size -- round-4
    device trace: the [B,K,158] merge keeps and [B,2K] selection reads were
    each ~0.2-0.4 ms/step).  For small n the same selection is a compare +
    select + reduce over ``[..., m, n]`` -- pure VPU work that XLA fuses into
    one loop.  Exact: one lane matches per output (callers guarantee
    in-range indices), every other lane holds the reduction identity, so
    integers sum to the selected value and floats max against -inf (which
    preserves -0.0 and -inf payloads bit-for-bit -- a masked SUM would turn
    -0.0 into +0.0 and break the sign-sensitive tie bitcast in
    ``_top_by_score_then_id``).  Only worth it for n up to a few thousand:
    the mask is [..., m, n].
    """
    n = arr.shape[-1]
    mask = idx[..., None] == jnp.arange(n, dtype=jnp.int32)
    row = arr[..., None, :]
    if arr.dtype == jnp.bool_:
        return jnp.any(mask & row, axis=-1)
    if jnp.issubdtype(arr.dtype, jnp.integer):
        return jnp.where(mask, row, 0).sum(axis=-1).astype(arr.dtype)
    return jnp.where(mask, row, -jnp.inf).max(axis=-1)


def _dedup_mask(tokens):
    """Within each beam's candidate list, keep one instance per token id.

    Duplicate instances of a token carry identical scores, so dropping all
    but one is exact (the FIRST instance survives, preserving candidate
    order).  Returns a bool keep-mask aligned with ``tokens``.

    At decode candidate widths (~100-320 slots) the O(n^2) pairwise
    compare is one VPU-friendly broadcast, far cheaper than the two
    ``lax.sort``s of the sort-based scheme (each multi-ms on v5e at
    [480, 160]); the sort path remains for wide inputs where n^2 blows up.
    """
    n = tokens.shape[-1]
    if n <= 1024:
        j_lt_i = jnp.tril(jnp.ones((n, n), bool), k=-1)
        dup = ((tokens[..., :, None] == tokens[..., None, :]) & j_lt_i).any(-1)
        return ~dup
    order = jnp.argsort(tokens, axis=-1)
    sorted_tok = jnp.take_along_axis(tokens, order, axis=-1)
    dup_sorted = jnp.concatenate(
        [
            jnp.zeros(sorted_tok.shape[:-1] + (1,), bool),
            sorted_tok[..., 1:] == sorted_tok[..., :-1],
        ],
        -1,
    )
    # scatter back to original order
    inv = jnp.argsort(order, axis=-1)
    dup = jnp.take_along_axis(dup_sorted, inv, axis=-1)
    return ~dup


def _select(cfg: DecodeConfig, cons_scores, uncons_scores, tokens, K, vocab: int):
    """topk(2K) by constrained score + first-K-non-EOS continuation rule
    (``beam_search.py:301-320`` + scorer ``process`` at ``:658-695``)."""
    B = cons_scores.shape[0]
    ncand = cons_scores.shape[-1]
    # candidate-beam axis can be NARROWER than K (step 0 runs with one live
    # beam per query); K only sizes the selection outputs (2K + K picks)
    n_par = cons_scores.shape[1]
    flat_cons = cons_scores.reshape(B, n_par * ncand)
    flat_uncons = uncons_scores.reshape(B, n_par * ncand)
    flat_tok = tokens.reshape(B, n_par * ncand)

    # under exact_ties equal scores tie-break (beam, token)-ascending, the
    # dense mode's flat candidate order
    top_idx = _top_idx(
        cfg, flat_cons, _beam_tok_tie(flat_tok, ncand, vocab), 2 * K
    )  # [B, 2K]
    # _sel1 masked reductions: the candidate axis is narrow (K * ~100)
    top_cons = _sel1(flat_cons, top_idx)
    top_tok = _sel1(flat_tok, top_idx)
    top_uncons = _sel1(flat_uncons, top_idx)
    top_parent = (top_idx // ncand).astype(jnp.int32)

    # continuing beams: first K candidates whose token != EOS, in order
    non_eos = top_tok != cfg.eos_token_id
    order = jnp.argsort(~non_eos, axis=-1, stable=True)
    cont = order[:, :K]
    finite = top_cons > NEG_INF / 4
    sel_tok = _sel1(top_tok, cont)
    sel_parent = _sel1(top_parent, cont)
    sel_uncons = _sel1(top_uncons, cont)
    sel_finite = _sel1(finite, cont)
    return (
        top_tok,
        top_parent,
        top_uncons,
        finite,
        sel_tok,
        sel_parent,
        sel_uncons,
        sel_finite,
        top_cons,  # [B, 2K] constrained scores of the selected set, desc;
        #   top_cons[:, -1] is the selection cutoff the fast step checks
    )


def _select_sample(cfg: DecodeConfig, cons_noprev, uncons_cum, tokens, eos_lp, key):
    """Constrained sampling: each beam is an independent sampler chain
    (reference ``beam_search.py:290-300`` with inputs replicated num_beams
    times at beam size 1, ``:420-424``).

    cons_noprev: [B,K,N] constrained logprobs WITHOUT beam accumulation (the
    sampling distribution); uncons_cum: [B,K,N] unconstrained + beam scores
    (what accumulates); eos_lp: [B,K] cumulative uncons score of EOS (the
    nan->EOS fallback when a beam has no valid continuation).
    """
    B, K, N = cons_noprev.shape
    finite = cons_noprev > NEG_INF / 4
    gumbel = jax.random.gumbel(key, cons_noprev.shape, jnp.float32)
    scored = jnp.where(finite, cons_noprev + gumbel, NEG_INF)
    idx = jnp.argmax(scored, axis=-1)  # [B, K]
    all_dead = ~jnp.any(finite, axis=-1)

    sel_tok = jnp.take_along_axis(tokens, idx[..., None], -1)[..., 0]
    sel_tok = jnp.where(all_dead, cfg.eos_token_id, sel_tok).astype(jnp.int32)
    sel_sco = jnp.take_along_axis(uncons_cum, idx[..., None], -1)[..., 0]
    sel_sco = jnp.where(all_dead, eos_lp, sel_sco)
    sel_parent = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (B, K))
    sel_fin = jnp.ones((B, K), bool)

    # history layout: 2K slots, first K hold the samples
    pad_tok = jnp.full((B, K), cfg.pad_token_id, jnp.int32)
    c_tok = jnp.concatenate([sel_tok, pad_tok], -1)
    c_par = jnp.concatenate([sel_parent, sel_parent], -1)
    c_sco = jnp.concatenate([sel_sco, jnp.full((B, K), NEG_INF)], -1)
    c_fin = jnp.concatenate([sel_fin, jnp.zeros((B, K), bool)], -1)
    return c_tok, c_par, c_sco, c_fin, sel_tok, sel_parent, sel_sco, sel_fin


def _select_diverse(cfg: DecodeConfig, cons_cum, tokens, K, vocab: int):
    """Group beam search with Hamming diversity (reference routes through HF
    ``group_beam_search`` with the FM processor appended,
    ``beam_search.py:447-454,523-532``).  No dual scoring in this mode: the
    penalized constrained score both selects and accumulates."""
    G, gs = cfg.num_groups, cfg.group_size
    B = cons_cum.shape[0]
    ncand = cons_cum.shape[-1]
    chosen = []
    cs_tok, cs_par, cs_sco, cs_fin = [], [], [], []
    sel_toks, sel_pars, sel_scos, sel_fins = [], [], [], []
    for g in range(G):
        sl = slice(g * gs, (g + 1) * gs)
        sc = cons_cum[:, sl]
        tk = tokens[:, sl]
        if g > 0 and cfg.diversity_penalty > 0.0:
            prev = jnp.concatenate(chosen, -1)  # [B, g*gs]
            freq = (tk[..., None] == prev[:, None, None, :]).sum(-1)
            sc = sc - cfg.diversity_penalty * freq.astype(sc.dtype)

        flat = sc.reshape(B, gs * ncand)
        flat_tok = tk.reshape(B, gs * ncand)
        top_idx = _top_idx(cfg, flat, _beam_tok_tie(flat_tok, ncand, vocab), 2 * gs)
        top_sc = jnp.take_along_axis(flat, top_idx, -1)
        top_tok = jnp.take_along_axis(flat_tok, top_idx, -1)
        top_par = (top_idx // ncand).astype(jnp.int32) + g * gs
        finite = top_sc > NEG_INF / 4

        non_eos = top_tok != cfg.eos_token_id
        order = jnp.argsort(~non_eos, axis=-1, stable=True)
        cont = order[:, :gs]
        sel_tok = jnp.take_along_axis(top_tok, cont, -1)
        sel_par = jnp.take_along_axis(top_par, cont, -1)
        sel_sco = jnp.take_along_axis(top_sc, cont, -1)
        sel_fin = jnp.take_along_axis(finite, cont, -1)

        chosen.append(sel_tok)
        cs_tok.append(top_tok); cs_par.append(top_par)
        cs_sco.append(top_sc); cs_fin.append(finite)
        sel_toks.append(sel_tok); sel_pars.append(sel_par)
        sel_scos.append(sel_sco); sel_fins.append(sel_fin)

    cat = lambda xs: jnp.concatenate(xs, -1)
    return (
        cat(cs_tok), cat(cs_par), cat(cs_sco), cat(cs_fin),
        cat(sel_toks), cat(sel_pars), cat(sel_scos), cat(sel_fins),
    )


def constrained_beam_search(
    model_cfg: BartConfig,
    params,
    index: DeviceFMIndex,
    cfg: DecodeConfig,
    enc_out,  # [B, Lsrc, D]  encoder output (NOT beam-tiled)
    enc_mask,  # [B, Lsrc]
    rng_key=None,  # PRNG key (sampling mode only)
    index_ops=None,  # constraint-op adapter (defaults to SingleIndexOps)
) -> BeamSearchOutput:
    """Run the fused constrained beam search for a batch of queries."""
    B = enc_out.shape[0]
    K = cfg.num_beams
    L = cfg.max_length
    S = cfg.num_steps
    V = model_cfg.vocab_size
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    bart = model_api.module_for(model_cfg)  # family dispatch (bart / t5)
    ops = index_ops if index_ops is not None else SingleIndexOps(index)

    # ---- per-query encoder state (NEVER beam-tiled) ----------------------
    # cross-K/V is per-QUERY state (identical across beams): project on the
    # [B] rows and keep it that way -- decode_step's grouped cross-attention
    # (models/bart._cross_attention_step) attends the beam-tiled decoder
    # rows against per-query K/V, so the dominant per-step HBM read (330 MB
    # beam-tiled at the bench shape, 1.4 GB at beam 32 x batch 64) streams
    # once per query instead of once per beam.
    cross_kv_q = bart.precompute_cross_kv(model_cfg, params, enc_out)
    enc_bias_q = bart.encoder_bias(enc_mask)
    cross_kv = cross_kv_q
    enc_bias = enc_bias_q

    # Step 0 (and the optional forced-BOS step) has ONE live beam per query
    # in beam-search modes (beam_scores init: only beam 0 at 0.0, the rest
    # at NEG_INF never win) and identical model state across beams -- run
    # the peeled prefix on [B] rows and fan out to [B*K] at the first beam
    # selection.  At the bench point this removes a 96 MB lp re-tile, the
    # [B*K, V] step-0 log-softmax/top-k, and K x the step-0 decode FLOPs
    # (round-4 trace: reshape.2412 + reduce_max/sum + top_k custom-call,
    # ~5 ms of the 95 ms device step).  Sampling (all chains live) and
    # diverse groups (one live beam PER GROUP) keep the beam-tiled prefix.
    # (V >= 2K so the one-beam candidate pool still yields 2K selections --
    # only sub-50-token toy vocabs with wide beams ever fail this)
    slim0 = not cfg.sample and cfg.num_groups == 1 and V >= 2 * K
    rows0 = B if slim0 else B * K
    K0 = 1 if slim0 else K
    # grouped cross-attention serves any rows0 that is a multiple of B
    cross_kv0, enc_bias0 = cross_kv_q, enc_bias_q
    self_cache = bart.empty_self_cache(model_cfg, rows0, L)

    tokens = jnp.full((B * K, L), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    if cfg.sample:
        # independent sampler chains: every beam starts live at score 0
        beam_scores = jnp.zeros((B, K), jnp.float32)
    elif cfg.num_groups > 1:
        # one live beam per group (HF group_beam_search init)
        beam_scores = jnp.full((B, K), NEG_INF, jnp.float32)
        starts = jnp.arange(K) % cfg.group_size == 0
        beam_scores = jnp.where(starts[None, :], 0.0, beam_scores)
    else:
        beam_scores = jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0)

    # ---- constraint state ------------------------------------------------
    if cfg.force_decoding_from:
        fseq = np.asarray(cfg.force_decoding_from, np.int32)
        flo, fhi = ops.range_for(
            jnp.asarray(fseq)[None, :], jnp.asarray([len(fseq)], jnp.int32)
        )
        lo0 = jnp.broadcast_to(flo[0], (B, K)).astype(jnp.int32)
        hi0 = jnp.broadcast_to(fhi[0], (B, K)).astype(jnp.int32)
    else:
        lo0, hi0 = ops.full_range((B, K))
    pos0 = jnp.int32(0)

    # ---- optional forced BOS step ---------------------------------------
    if cfg.forced_bos_token_id is not None:
        bos = cfg.forced_bos_token_id
        logits, self_cache = bart.decode_step(
            model_cfg,
            params,
            jnp.full((rows0,), cfg.decoder_start_token_id, jnp.int32),
            pos0,
            self_cache,
            cross_kv0,
            enc_bias0,
        )
        logits = _adjust_logits(logits, jnp.int32(1), cfg)
        lp = _log_softmax(logits).reshape(B, K0, V)
        beam_scores = beam_scores + lp[:, :, bos]  # [B,K0] broadcasts over K
        tokens = tokens.at[:, 1].set(bos)
        pos0 = jnp.int32(1)

    def dispatch_select(cons_noprev, uncons_noprev, tokens_c, beam_scores, key):
        """Mode-dispatched candidate selection; shared by step 0 and the scan."""
        if cfg.sample:
            # uncons score of the EOS candidate slot (nan->EOS fallback);
            # argmax finds the slot, falling back to slot 0 if absent
            eos_slot = jnp.argmax(tokens_c == cfg.eos_token_id, axis=-1)
            eos_lp = jnp.take_along_axis(uncons_noprev, eos_slot[..., None], -1)[..., 0]
            return _select_sample(
                cfg,
                cons_noprev,
                uncons_noprev + beam_scores[..., None],
                tokens_c,
                eos_lp + beam_scores,
                key,
            )
        if cfg.num_groups > 1:
            return _select_diverse(
                cfg, cons_noprev + beam_scores[..., None], tokens_c, K, V
            )
        return _select(
            cfg,
            cons_noprev + beam_scores[..., None],
            uncons_noprev + beam_scores[..., None],
            tokens_c,
            K,
            V,
        )[:8]

    # ---- step 0: first constrained token (dense corpus mask) ------------
    start_col = 1 if cfg.forced_bos_token_id is None else 2
    tok0 = (
        cfg.decoder_start_token_id
        if cfg.forced_bos_token_id is None
        else cfg.forced_bos_token_id
    )
    logits, self_cache = bart.decode_step(
        model_cfg,
        params,
        jnp.full((rows0,), tok0, jnp.int32),
        pos0,
        self_cache,
        cross_kv0,
        enc_bias0,
    )
    logits = _adjust_logits(logits, jnp.int32(start_col), cfg)
    logits = _apply_topk_warper(logits, cfg)
    lp = _apply_min_length(_log_softmax(logits), start_col, cfg)
    lp = lp.reshape(B, K0, V)
    if cfg.disable_fm_index:
        cons0 = lp
    else:
        corpus_mask = ops.corpus_mask()  # occurring_distinct parity
        if cfg.always_allow_eos:
            # reference unmasks EOS after every branch (beam_search.py:137-138)
            corpus_mask = corpus_mask.at[cfg.eos_token_id].set(True)
        cons0 = jnp.where(corpus_mask[None, None, :], lp, NEG_INF)
    tokens_all = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B, K0, V))
    rng_key, key0 = jax.random.split(rng_key)
    (
        c_tok0,
        c_par0,
        c_sco0,
        c_fin0,
        sel_tok,
        sel_par,
        beam_scores,
        sel_fin0,
    ) = dispatch_select(cons0, lp, tokens_all, beam_scores[:, :K0], key0)
    tainted = ~sel_fin0

    # fan out: tokens live in [B*K] rows (identical per query so any parent
    # works); the cache lives in [rows0] rows -- gather with the K0 stride
    flat_sel = (jnp.arange(B)[:, None] * K + sel_par).reshape(-1)
    tokens = tokens[flat_sel].at[:, start_col].set(sel_tok.reshape(-1))
    flat_sel0 = (jnp.arange(B)[:, None] * K0 + sel_par).reshape(-1)
    self_cache = bart.reorder_cache(self_cache, flat_sel0)
    prev_count = ops.range_size(lo0, hi0)[jnp.arange(B)[:, None], sel_par]
    lo, hi = ops.extend(
        sel_tok,
        lo0[jnp.arange(B)[:, None], sel_par],
        hi0[jnp.arange(B)[:, None], sel_par],
    )

    # step 0 uses the dense corpus mask -- no proposal round, never falls back
    hist0 = (c_tok0, c_par0, c_sco0, c_fin0, sel_tok, sel_par, jnp.zeros((), bool))

    # ---- steps 1..S-1 inside one scan ------------------------------------
    fast_exact = not (
        cfg.exact_mask
        or cfg.disable_fm_index
        or cfg.speculative
        or cfg.sample
        or cfg.num_groups > 1
    )

    def step(carry, t, force_full=False):
        tokens, beam_scores, self_cache, lo, hi, prev_count, tainted, key = carry
        key, step_key = jax.random.split(key)
        cur_col = start_col + t  # column holding the last written token
        last = lax.dynamic_index_in_dim(tokens, cur_col, axis=1, keepdims=False)
        logits, new_cache = bart.decode_step(
            model_cfg, params, last, pos0 + 1 + t, self_cache, cross_kv, enc_bias
        )
        logits = _adjust_logits(logits, cur_col + 1, cfg)
        logits = _apply_topk_warper(logits, cfg)
        lp = _apply_min_length(_log_softmax(logits), cur_col + 1, cfg)

        finished = (last == cfg.eos_token_id) | (last == cfg.pad_token_id)
        finished = finished.reshape(B, K)
        fellback = jnp.zeros((), bool)
        if fast_exact:
            # the production path: round-0 proposals + post-selection
            # soundness proof; unsound steps are detected here and the
            # WHOLE scan re-runs with force_full outside (a per-step
            # lax.cond stalled the pipeline ~2 ms/step even when sound)
            (
                (c_tok, c_par, c_sco, c_fin, sel_tok, sel_par, new_beam_scores, sel_fin),
                fellback,
            ) = _fast_exact_select(
                ops, cfg, lp, lo, hi, prev_count, finished, beam_scores, K, V,
                force_full=force_full,
            )
        else:
            cand_tok, allowed, cand_lp = _candidates_general(
                ops, cfg, lp, lo, hi, prev_count, finished
            )
            cons = jnp.where(allowed, cand_lp, NEG_INF)
            if not (cfg.exact_mask or cfg.disable_fm_index):
                # speculative candidates can repeat a token (top-M vs window);
                # duplicates carry identical scores, keep one per token id
                keep = _dedup_mask(cand_tok)
                cons = jnp.where(keep, cons, NEG_INF)

            (c_tok, c_par, c_sco, c_fin, sel_tok, sel_par, new_beam_scores, sel_fin) = (
                dispatch_select(cons, cand_lp, cand_tok, beam_scores, step_key)
            )
        # candidates of tainted (back-filled) parents are ungrounded noise:
        # the reference records them and relies on the searcher's count
        # filter (retrieval.py:91); we drop them at the source
        c_fin = c_fin & ~jnp.take_along_axis(tainted, c_par, axis=-1)

        flat_sel = (jnp.arange(B)[:, None] * K + sel_par).reshape(-1)
        new_tokens = tokens[flat_sel]
        new_tokens = lax.dynamic_update_slice_in_dim(
            new_tokens, sel_tok.reshape(-1, 1), cur_col + 1, axis=1
        )
        new_cache = bart.reorder_cache(new_cache, flat_sel)

        par_rows = jnp.arange(B)[:, None]
        sizes = ops.range_size(lo, hi)
        plo = lo[par_rows, sel_par]
        phi = hi[par_rows, sel_par]
        new_prev_count = sizes[par_rows, sel_par]
        # EOS/PAD selections terminate the constraint sequence (rows (0,0),
        # beam_search.py:90-93); real tokens extend the parent range.
        sel_finished = (sel_tok == cfg.eos_token_id) | (sel_tok == cfg.pad_token_id)
        elo, ehi = ops.extend(sel_tok, plo, phi)
        new_lo = jnp.where(sel_finished, 0, elo)
        new_hi = jnp.where(sel_finished, 0, ehi)
        # carry parent's finished state forward: once finished, stay at (0,0)
        par_finished = finished[par_rows, sel_par]
        new_lo = jnp.where(par_finished, 0, new_lo)
        new_hi = jnp.where(par_finished, 0, new_hi)

        new_tainted = tainted[par_rows, sel_par] | ~sel_fin
        carry = (
            new_tokens, new_beam_scores, new_cache, new_lo, new_hi, new_prev_count,
            new_tainted, key,
        )
        ys = (c_tok, c_par, c_sco, c_fin, sel_tok, sel_par, fellback)
        return carry, ys

    if S > 1:
        carry0 = (tokens, beam_scores, self_cache, lo, hi, prev_count, tainted, rng_key)
        ts = jnp.arange(S - 1, dtype=jnp.int32)
        # Deferred exactness fallback: the fast scan flags any step whose
        # round-0 candidate set could not be proven sufficient (the FIRST
        # such flag is always computed on an exact prefix, so detection is
        # sound); the HOST then redispatches this same program with
        # cfg.force_full=True (generate.py reads ``fallback_steps``).  The
        # flags never fire for cfg.force_full because every step runs the
        # proven loop.
        carry, ys = lax.scan(
            lambda c, t: step(c, t, cfg.force_full), carry0, ts
        )
        tokens, beam_scores, tainted = carry[0], carry[1], carry[6]
        hist = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), hist0, ys
        )
    else:
        hist = jax.tree_util.tree_map(lambda a: a[None], hist0)

    c_tok, c_par, c_sco, c_fin, s_tok, s_par, fellback = hist
    return BeamSearchOutput(
        cand_tokens=c_tok,
        cand_parents=c_par,
        cand_scores=c_sco,
        cand_finite=c_fin,
        sel_tokens=s_tok,
        sel_parents=s_par,
        final_scores=beam_scores,
        final_tokens=tokens.reshape(B, K, L),
        final_valid=~tainted,
        fallback_steps=fellback.sum().astype(jnp.int32),
    )
