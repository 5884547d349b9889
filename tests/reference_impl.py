"""A deliberately slow, obviously-correct Python mirror of the reference's
constrained beam search semantics (seal/beam_search.py), used only to verify
the fused device implementation.

Logits come from our own BART (full teacher-forced recompute each step -- no
cache, no jit); constraints come from the host FMIndex.  Structure follows
the reference spec: dual scoring, memory scorer recording every candidate,
processor branch order, first-K-non-EOS continuation rule.
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from seal_tpu.models import bart

BIG_NEG = -1e9


@lru_cache(maxsize=8)
def _jit_encode(model_cfg):
    return jax.jit(lambda p, i, m: bart.encode(model_cfg, p, i, m))


@lru_cache(maxsize=8)
def _jit_decode_full(model_cfg):
    return jax.jit(lambda p, e, m, d: bart.decode_full(model_cfg, p, e, m, d))


def log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def reference_generate(
    model_cfg,
    params,
    host_index,
    input_ids,  # [B, L] np
    attention_mask,
    num_beams,
    max_length,
    min_length=0,
    eos_token_id=None,
    force_decoding_from=None,
    stop_at_count=0,
    always_allow_eos=False,
    disable_fm_index=False,
):
    eos = eos_token_id if eos_token_id is not None else model_cfg.eos_token_id
    pad = model_cfg.pad_token_id
    start = model_cfg.decoder_start_token_id
    K = num_beams
    B = input_ids.shape[0]
    V = model_cfg.vocab_size
    force = list(force_decoding_from) if force_decoding_from else []

    enc = _jit_encode(model_cfg)(
        params, jnp.asarray(input_ids), jnp.asarray(attention_mask)
    )

    beams = [[([start], 0.0 if k == 0 else BIG_NEG) for k in range(K)] for _ in range(B)]
    # taint mirrors the device implementation: a beam back-filled from a
    # cons-masked candidate is excluded at finalize (the searcher's count
    # filter would drop it anyway)
    taints = [[k != 0 and False for k in range(K)] for _ in range(B)]
    hyps = [[] for _ in range(B)]

    cur_len = 1
    while cur_len < max_length:
        # --- logits for every beam (teacher-forced, recomputed) ----------
        all_tokens = np.array(
            [beams[b][k][0] for b in range(B) for k in range(K)], dtype=np.int32
        )
        enc_rep = jnp.repeat(enc, K, axis=0)
        mask_rep = np.repeat(attention_mask, K, axis=0)
        logits = _jit_decode_full(model_cfg)(
            params, enc_rep, jnp.asarray(mask_rep), jnp.asarray(all_tokens)
        )
        lp = log_softmax(np.asarray(logits[:, -1, :], dtype=np.float64))

        # --- standard processors (min_length) ----------------------------
        if cur_len < min_length:
            lp[:, eos] = -np.inf

        for b in range(B):
            cons_flat = np.empty(K * V)
            uncons_flat = np.empty(K * V)
            for k in range(K):
                row = b * K + k
                sent, bscore = beams[b][k]
                mask = np.full(V, -np.inf)
                if not disable_fm_index:
                    if cur_len == 1:
                        mask[host_index.occurring_distinct] = 0.0
                    else:
                        seq = sent[1:]
                        if seq[-1] in (eos, pad):
                            count = 0
                            distinct = None
                        else:
                            lo, hi = host_index.get_range(force + seq)
                            count = host_index.get_count(force + seq[:-1])
                            distinct = host_index.get_distinct(lo, hi)
                        if stop_at_count > 0 and count <= stop_at_count:
                            allowed = [eos]
                        elif seq[-1] == eos:
                            allowed = [pad]
                        elif seq[-1] == pad:
                            allowed = [pad]
                        else:
                            allowed = distinct
                        mask[allowed] = 0.0
                    if always_allow_eos:
                        mask[eos] = 0.0
                else:
                    mask[:] = 0.0
                cons_flat[k * V : (k + 1) * V] = lp[row] + mask + bscore
                uncons_flat[k * V : (k + 1) * V] = lp[row] + bscore

            order = np.argsort(-cons_flat, kind="stable")[: 2 * K]
            new_beams = []
            new_taints = []
            for idx in order:
                k, tok = divmod(int(idx), V)
                score = uncons_flat[idx]
                hyp_tokens = beams[b][k][0] + [tok]
                finite = bool(np.isfinite(cons_flat[idx]) and cons_flat[idx] > BIG_NEG / 2)
                # like the device implementation, candidates of tainted
                # (back-filled) parents are suppressed at the source
                if finite and not (cur_len > 1 and taints[b][k]):
                    hyps[b].append((float(score), hyp_tokens))
                if tok != eos and len(new_beams) < K:
                    new_beams.append((hyp_tokens, float(score)))
                    new_taints.append(taints[b][k] or not finite)
            while len(new_beams) < K:  # degenerate: not enough non-eos
                new_beams.append((beams[b][0][0] + [pad], -np.inf))
                new_taints.append(True)
            beams[b] = new_beams
            taints[b] = new_taints
        cur_len += 1

    for b in range(B):  # finalize
        for (sent, score), tainted in zip(beams[b], taints[b]):
            if not tainted and np.isfinite(score) and score > BIG_NEG / 2:
                hyps[b].append((float(score), sent))
    return hyps
