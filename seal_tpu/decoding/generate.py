"""Host-facing generation entry point (reference ``fm_index_generate``,
``/root/reference/seal/beam_search.py:391-557``).

Runs the jitted fused scan and extracts the key hypotheses on host: every
candidate recorded at every step plus the final beams -- the
``BeamSearchScorerWithMemory`` semantics (``beam_search.py:549-557``: scores
reported are cumulative unconstrained log-probs; the length-penalty applied
at ``add`` time cancels at extraction).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seal_tpu.decoding.constrained import (
    BeamSearchOutput,
    DecodeConfig,
    check_dense_budget,
    constrained_beam_search,
    resolve_window,
)
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.models import api as model_api
from seal_tpu.models.config import BartConfig


def _fetch_local(outputs):
    """``jax.device_get`` that works under multi-process SPMD serving.

    Single-process: fetch the whole pytree.  Multi-process (DCN data
    parallelism, ``parallel/multihost.py``): global output arrays are not
    fully addressable, so fetch only this process's shards and reassemble
    its LOCAL batch rows -- each process then extracts hypotheses for
    exactly the queries it contributed via ``host_batch_to_global``.
    """
    if jax.process_count() == 1:
        return jax.device_get(outputs)

    def leaf(x):
        shards = sorted(
            x.addressable_shards,
            key=lambda s: tuple((sl.start or 0) for sl in s.index),
        )
        # drop replicas (same offset on several local devices)
        seen = {}
        for s in shards:
            off = tuple((sl.start or 0) for sl in s.index)
            if off not in seen:
                seen[off] = np.asarray(s.data)
        offs = sorted(seen)
        if len(offs) == 1:
            return seen[offs[0]]
        axis = next(
            i for i, (a, b) in enumerate(zip(offs[0], offs[1])) if a != b
        )
        return np.concatenate([seen[o] for o in offs], axis=axis)

    return jax.tree_util.tree_map(leaf, outputs)


def pad_batch(seqs: Sequence[Sequence[int]], pad_id: int, multiple: int = 8):
    """Right-pad token lists into [B, L] arrays + attention mask."""
    maxlen = max(len(s) for s in seqs)
    maxlen = ((maxlen + multiple - 1) // multiple) * multiple
    ids = np.full((len(seqs), maxlen), pad_id, np.int32)
    mask = np.zeros((len(seqs), maxlen), np.int32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    return ids, mask


@lru_cache(maxsize=64)
def _jitted_search(model_cfg: BartConfig, dcfg: DecodeConfig, mesh=None):
    """Jitted encoder + fused beam search.

    With a mesh, queries shard over the ``data`` axis: XLA partitions the
    whole scan along the batch dim, so a multi-chip slice serves one large
    batch -- the TPU-native replacement for the reference's ``synced_gpus``
    data parallelism (``beam_search.py:221-229``).  When the mesh has a
    ``model`` axis of size > 1, params take the Megatron tensor-parallel
    layout (``parallel/mesh.py::param_pspecs``) and GSPMD propagates the
    head/FFN sharding through every decode step -- serving and training
    share one param layout, so no resharding between them.
    """

    bart = model_api.module_for(model_cfg)

    def run(params, index, ids, mask, key):
        enc = bart.encode(model_cfg, params, ids, mask)
        return constrained_beam_search(model_cfg, params, index, dcfg, enc, mask, key)

    if mesh is None:
        return jax.jit(run)
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    params_sh = None
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        from seal_tpu.parallel.mesh import param_pspecs

        params_sh = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s),
            param_pspecs(model_cfg),
            is_leaf=lambda x: isinstance(x, P),
        )
    return jax.jit(
        run,
        in_shardings=(params_sh, None, data, data, repl),
        out_shardings=None,
    )


def extract_hypotheses(
    out: BeamSearchOutput, dcfg: DecodeConfig
) -> List[List[Tuple[float, List[int]]]]:
    """Backtrack the candidate history into (score, token_list) hypotheses.

    Token lists include the decoder-start (and forced-BOS) prefix, exactly
    like the reference's ``beam_hyp`` contents -- the searcher strips them.
    """
    c_tok = np.asarray(out.cand_tokens)
    c_par = np.asarray(out.cand_parents)
    c_sco = np.asarray(out.cand_scores)
    c_fin = np.asarray(out.cand_finite)
    s_tok = np.asarray(out.sel_tokens)
    s_par = np.asarray(out.sel_parents)
    f_sco = np.asarray(out.final_scores)
    f_tok = np.asarray(out.final_tokens)
    f_ok = np.asarray(out.final_valid)

    S, B, twoK = c_tok.shape
    K = s_tok.shape[-1]
    prefix = [dcfg.decoder_start_token_id]
    if dcfg.forced_bos_token_id is not None:
        prefix = prefix + [dcfg.forced_bos_token_id]

    # Selected-beam token paths rebuilt forward in bulk: paths[s] is
    # [B, K, s] = the tokens of beam k after s steps.  One vectorized
    # gather+append per step replaces the per-(batch, beam) Python list
    # copies (O(S*B*2K) at beam 32 x batch 64 otherwise).
    paths = [np.zeros((B, K, 0), dtype=c_tok.dtype)]
    for s in range(S):
        parent_paths = np.take_along_axis(paths[s], s_par[s][:, :, None], axis=1)
        paths.append(
            np.concatenate([parent_paths, s_tok[s][:, :, None]], axis=2)
        )

    results: List[List[Tuple[float, List[int]]]] = [[] for _ in range(B)]
    for s in range(S):
        step_fin = c_fin[s]
        if not step_fin.any():
            continue
        base = np.take_along_axis(paths[s], c_par[s][:, :, None], axis=1)
        seqs = np.concatenate([base, c_tok[s][:, :, None]], axis=2).tolist()
        scores = c_sco[s].tolist()
        finite = step_fin.tolist()
        for b in range(B):
            row_seq, row_sco, row_fin = seqs[b], scores[b], finite[b]
            hyps = results[b]
            for j in range(twoK):
                if row_fin[j]:
                    hyps.append((row_sco[j], prefix + row_seq[j]))
    # finalize: add the K final beams
    final_ok = f_ok & np.isfinite(f_sco) & (f_sco > -1e30)
    f_sco_l = f_sco.tolist()
    f_tok_l = f_tok.tolist()
    for b, k in zip(*np.nonzero(final_ok)):
        results[b].append((f_sco_l[b][k], list(f_tok_l[b][k])))
    return results


def fm_index_generate_async(
    model_cfg: BartConfig,
    params,
    index: DeviceFMIndex,
    input_ids,  # [B, L] np/jnp int or list of token lists
    attention_mask=None,
    min_length: int = 3,
    max_length: int = 25,
    length_penalty: float = 1.0,  # accepted for parity; cancels in history mode
    num_beams: int = 3,
    eos_token_id: Optional[int] = None,
    force_decoding_from: Optional[Sequence[int]] = None,
    always_allow_eos: bool = False,
    keep_history: bool = True,
    disable_fm_index: bool = False,
    stop_at_count: int = 0,
    forced_bos_token_id: Optional[int] = "default",
    top_m: int = 256,
    window: int = 0,  # 0 = auto (constrained.resolve_window)
    exact_chunk: int = 64,
    exact_topk_blk: int = 0,  # 0 = auto (see DecodeConfig)
    exact_loop_chunk: int = 0,  # 0 = auto (see DecodeConfig)
    dense_chunk: int = 2048,
    speculative: bool = False,
    exact_mask: bool = False,
    exact_ties: bool = False,
    sample: bool = False,
    topk: int = 0,
    adjust_logits_fn=None,  # model-specific raw-logit hook, see DecodeConfig
    diverse_bs_groups: int = 1,
    diverse_bs_penalty: float = 0.0,
    seed: int = 0,
    mesh=None,
):
    """Dispatch constrained generation; returns a zero-arg ``finalize``.

    The jitted program is enqueued asynchronously (JAX dispatch returns
    device arrays immediately); calling the returned closure blocks on the
    device result, transfers it, and extracts hypotheses on host.  Callers
    that dispatch batch N+1 before finalizing batch N overlap the host
    transfer + backtrack (~30% of batch wall time through the TPU tunnel)
    with device compute -- the serving pipeline the searcher and benches
    use.  ``fm_index_generate`` is the synchronous wrapper.
    """
    del length_penalty, keep_history  # history extraction makes both no-ops
    if isinstance(input_ids, (list, tuple)):
        input_ids, attention_mask = pad_batch(input_ids, model_cfg.pad_token_id)
    if attention_mask is None:
        attention_mask = (np.asarray(input_ids) != model_cfg.pad_token_id).astype(np.int32)
    if forced_bos_token_id == "default":
        forced_bos_token_id = model_cfg.forced_bos_token_id

    dcfg = DecodeConfig(
        num_beams=num_beams,
        max_length=max_length,
        min_length=min_length,
        eos_token_id=int(eos_token_id if eos_token_id is not None else model_cfg.eos_token_id),
        pad_token_id=model_cfg.pad_token_id,
        decoder_start_token_id=model_cfg.decoder_start_token_id,
        forced_bos_token_id=forced_bos_token_id,
        force_decoding_from=tuple(force_decoding_from) if force_decoding_from else None,
        stop_at_count=stop_at_count,
        always_allow_eos=always_allow_eos,
        disable_fm_index=disable_fm_index,
        top_m=min(top_m, model_cfg.vocab_size),
        window=resolve_window(window, num_beams, speculative),
        exact_chunk=exact_chunk,
        exact_topk_blk=exact_topk_blk,
        exact_loop_chunk=exact_loop_chunk,
        dense_chunk=dense_chunk,
        speculative=speculative,
        exact_mask=exact_mask,
        exact_ties=exact_ties,
        sample=sample,
        topk=topk,
        adjust_logits_fn=adjust_logits_fn,
        num_groups=diverse_bs_groups,
        diversity_penalty=diverse_bs_penalty,
    )
    # np.shape: never materializes (input may be a multi-process global array)
    check_dense_budget(dcfg, int(np.shape(input_ids)[0]), model_cfg.vocab_size)
    run = _jitted_search(model_cfg, dcfg, mesh)
    out = run(
        params,
        index,
        jnp.asarray(input_ids),
        jnp.asarray(attention_mask),
        jax.random.PRNGKey(seed),
    )

    def finalize() -> List[List[Tuple[float, List[int]]]]:
        # one transfer; local rows under multi-process
        fetched = _fetch_local(out)
        n_fallback = (
            int(fetched.fallback_steps)
            if fetched.fallback_steps is not None
            else 0
        )
        if fetched.fallback_steps is not None:
            # diagnostics for the fast-path soundness fallback (a corpus
            # that trips it every step would otherwise present as a silent
            # ~40% regression); read by bench.py as `fallback_rate`
            LAST_DECODE_STATS["fallback_steps"] = n_fallback
            LAST_DECODE_STATS["num_steps"] = dcfg.num_steps
        if n_fallback and not dcfg.force_full:
            # Deferred exactness fallback: some step's round-0 candidate
            # set could not be proven sufficient, so this batch redecodes
            # with every step through the proven-exact loop.  Branching
            # here (host, per batch) instead of in-program keeps the
            # common-case device program free of data-dependent control
            # flow; ``fallback_steps`` is a replicated global scalar, so
            # every process of a multi-process mesh takes the same branch.
            import dataclasses as _dc

            full = _jitted_search(
                model_cfg, _dc.replace(dcfg, force_full=True), mesh
            )
            fetched = _fetch_local(
                full(
                    params,
                    index,
                    jnp.asarray(input_ids),
                    jnp.asarray(attention_mask),
                    jax.random.PRNGKey(seed),
                )
            )
        return extract_hypotheses(fetched, dcfg)

    return finalize


#: Most recent decode's fast-path fallback counters (single-dispatch
#: diagnostics; see BeamSearchOutput.fallback_steps).
LAST_DECODE_STATS = {"fallback_steps": 0, "num_steps": 0}


def fm_index_generate(*args, **kwargs) -> List[List[Tuple[float, List[int]]]]:
    """Constrained generation; returns per-query [(score, token_list), ...].

    Signature parity with reference ``beam_search.py:392-413`` (sample /
    diverse-beam-group modes are handled by the searcher-level fallbacks).
    """
    return fm_index_generate_async(*args, **kwargs)()
