"""SEALSearcher: the retrieval orchestrator.

Parity with the reference facade (``/root/reference/seal/retrieval.py:399``):
the same 45 ``DEFAULTS`` knobs (names preserved so the auto-generated CLI is
flag-compatible), the same key-generation pipeline (body / title / code
decodes with conditioning markers, query decomposition, rescoring,
deduplication, unigram scores -- ``retrieval.py:49-312``) and the same
two-stage evidence aggregation.

TPU-native differences: generation is the fused scan in
``seal_tpu.decoding``; the model is our JAX BART; decoding/rescoring batch
over queries on device, while evidence aggregation runs on host against the
dense index arrays (no multiprocessing smuggling -- the index is shared
read-only NumPy).
"""

from __future__ import annotations

import logging
import time
from itertools import islice
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from seal_tpu.decoding.generate import fm_index_generate, pad_batch
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.index.fm_index import FMIndex
from seal_tpu.models import bart, convert
from seal_tpu.models.config import BartConfig, bart_large
from seal_tpu.models.tokenizer import load_tokenizer
from seal_tpu.retrieval.document import SEALDocument
from seal_tpu.scoring import keys as rk

logger = logging.getLogger(__name__)

# parity: reference module-level debug switch printing scored ngrams
# (retrieval.py:37,751-753)
DEBUG = False

# searcher registry for forked aggregation workers (the reference smuggles
# the searcher through a __main__ global, retrieval.py:762-775)
_MP_REGISTRY: Dict[int, "SEALSearcher"] = {}


def _retrieve_from_keys_mp_aux(args):
    idx, keys = args
    # forked workers must not touch the JAX runtime: host-only index queries
    return _MP_REGISTRY[idx].retrieve_from_keys(keys, use_device=False)


def _detokenize_mp_aux(args):
    # reference detokenization strips surrounding whitespace
    # (retrieval.py:778,823); the lazy SEALDocument.text() path does not
    idx, title_tokens, body_tokens = args
    tok = _MP_REGISTRY[idx].tokenizer
    title = (
        tok.decode(title_tokens, skip_special_tokens=True).strip()
        if title_tokens
        else ""
    )
    return title, tok.decode(body_tokens, skip_special_tokens=True).strip()


class SEALSearcher:
    # Parity: reference retrieval.py:401-446 (same names, same defaults).
    DEFAULTS = {
        "backbone": "facebook/bart-large",
        "fairseq_checkpoint": True,
        "length": 10,
        "min_length": 0,
        "length_penalty": 0.0,
        "scoring_length_penalty": 0.0,
        "repetition_penalty": 0.8,
        "score_exponent": 2.0,
        "beam": 15,
        "max_hits": 1500,
        "fully_score": 1500,
        "skip_frequent_keys": 10_000_000,
        "add_query_to_keys": True,
        "batch_size": 20,
        "jobs": 1,
        "progress": False,
        "free_generation": False,
        "use_fm_index_frequency": True,
        "unigram_scores": True,
        "add_best_unigrams_to_ngrams": True,
        "use_top_k_ngrams": 5000,
        "sort_by_length": False,
        "sort_by_freq": False,
        "print_n_doc": False,
        "allow_overlaps": False,
        "diverse_bs_groups": 1,
        "diverse_bs_penalty": 0.0,
        "rescore": True,
        "detokenize": True,
        "include_keys": False,
        "single_key": 0.0,
        "unigrams_ignore_free_places": False,
        "use_markers": True,
        "value_conditioning": True,
        "decode_body": True,
        "decode_titles": True,
        "decode_code": False,
        "partial_code": False,
        "partial_titles": False,
        "smoothing": 5.0,
        "stop_at_count": 0,
        "topk": 0,
        "force_decoding_second_token": -1,
        # --- TPU-build extensions (not in the reference) ------------------
        "top_m": 256,  # LM candidates validated per beam per proposal round
        "window": 0,  # enumerated BWT rows per beam per step (0 = auto by beam)
        "speculative": False,  # opt-in: single approximate proposal round
        #   (default is the exact proposal loop: dense-mask semantics)
        "exact_mask": False,  # dense O(vocab) constraint mask (parity mode)
        "exact_ties": False,  # (beam, token)-ordered equal-score tie breaks
        "compact_index": False,  # wavelet-tree device index (~3.0 B/token)
        "hybrid_index": False,  # compact + raw BWT (~5.0 B/token): wavelet
        #   rank ops with one-gather window enumeration -- the capacity
        #   mode's speed tier (implies compact_index)
        "pipeline": True,  # overlap device generation with host aggregation
        "index_shards": 0,  # >1: partition the index over the device mesh
    }

    def __init__(
        self,
        fm_index: FMIndex,
        tokenizer,
        model_cfg: BartConfig,
        params,
        scorer_params=None,
        title_params=None,
        code_params=None,
        device_index: Optional[DeviceFMIndex] = None,
        sharded_index=None,  # ShardedFMIndex placed on `mesh` (serving mode)
        mesh=None,
        **kwargs,
    ):
        self.fm_index = fm_index
        self.tokenizer = tokenizer
        self.model_cfg = model_cfg
        # bfloat16 configs serve from compute-dtype weight copies: float32
        # masters would stream 2x the HBM bytes per decode step (no-op for
        # float32 configs; deduped so shared param trees are cast once)
        from seal_tpu.models.api import cast_params

        _cast_memo: Dict[int, object] = {}

        def _cast(p):
            if p is None:
                return None
            if id(p) not in _cast_memo:
                _cast_memo[id(p)] = cast_params(model_cfg, p)
            return _cast_memo[id(p)]

        self.params = _cast(params)
        self.scorer_params = _cast(scorer_params) if scorer_params is not None else self.params
        self.title_params = _cast(title_params) if title_params is not None else self.params
        self.code_params = _cast(code_params) if code_params is not None else self.params
        self.sharded_index = sharded_index
        self.mesh = mesh
        if sharded_index is not None:
            self.device_index = device_index  # unused in sharded mode
        elif device_index is not None:
            self.device_index = device_index
        elif kwargs.get("compact_index", self.DEFAULTS["compact_index"]) or kwargs.get(
            "hybrid_index", self.DEFAULTS["hybrid_index"]
        ):
            # capacity mode: ~3.0 B/token wavelet-tree layout (vs ~7.6 for
            # Psi+BWT); hybrid adds the raw BWT back (~5.0 B/token) for
            # one-gather window enumeration
            from seal_tpu.index.wavelet import WaveletFMIndex

            self.device_index = WaveletFMIndex.from_host(
                fm_index,
                vocab=model_cfg.vocab_size,
                keep_bwt=bool(
                    kwargs.get("hybrid_index", self.DEFAULTS["hybrid_index"])
                ),
            )
        else:
            # decode never locates on device; SA/text stay host-side
            self.device_index = DeviceFMIndex.from_host(
                fm_index, vocab=model_cfg.vocab_size
            )
        self.docid2idx = (
            {k: i for i, k in enumerate(fm_index.labels)} if fm_index.labels else {}
        )
        self.num_docs = fm_index.n_docs
        self.docids = fm_index.labels
        from seal_tpu.utils.profiling import PhaseTimer, ServingMetrics

        self.metrics = ServingMetrics()
        # fine-grained phase attribution (decode/rescore/unigram/aggregate/
        # detokenize); disabled by default -- benchmarks flip .enabled on.
        # Phases overlap under pipelining, so shares, not a wall-clock sum.
        self.phase_timer = PhaseTimer(enabled=False)
        self.set_params(kwargs)
        if self.index_shards > 1 and sharded_index is None:
            raise ValueError(
                "index_shards>1 requires the sharded build path: use "
                "SEALSearcher.load(..., index_shards=N) or build_sharded()"
            )

        backbone = self.backbone
        if "bart" in backbone:
            # reference retrieval.py:482-493
            self.title_bos_token_id = 2
            self.title_eos_token_id = 49314  # '@@'
            self.code_bos_token_id = 49314
            self.code_eos_token_id = 45056  # '||'
            self.prepend_space = True
            self.strip_token_ids = (0, 2)
        elif "t5" in backbone:
            # reference retrieval.py:494-504
            self.title_bos_token_id = 1
            self.title_eos_token_id = 32000
            self.code_bos_token_id = 32000
            self.code_eos_token_id = 32001
            self.prepend_space = False
            self.strip_token_ids = (0, 1)
        else:
            # generic backbone: derive the '@@' / '||' marker ids from the
            # tokenizer so word-vocab/test backbones work out of the box
            def _marker(text, fallback):
                ids = tokenizer.encode_plain(text)
                return ids[-1] if ids else fallback

            self.title_bos_token_id = model_cfg.eos_token_id
            self.title_eos_token_id = _marker(" @@", model_cfg.eos_token_id)
            self.code_bos_token_id = self.title_eos_token_id
            self.code_eos_token_id = _marker(" ||", model_cfg.eos_token_id)
            self.prepend_space = True
            self.strip_token_ids = (model_cfg.bos_token_id, model_cfg.eos_token_id)
        for key in (
            "title_bos_token_id", "title_eos_token_id",
            "code_bos_token_id", "code_eos_token_id",
        ):
            if key in kwargs:
                setattr(self, key, kwargs[key])

    # ------------------------------------------------------------- params/CLI

    def set_params(self, params: Dict):
        for key, val in self.DEFAULTS.items():
            setattr(self, key, params.get(key, val))

    @classmethod
    def add_args(cls, parser):
        """Auto-generate CLI flags from DEFAULTS (reference retrieval.py:521-535)."""
        parser.add_argument("--fm_index", required=True, type=str)
        parser.add_argument("--checkpoint", required=False, type=str)
        parser.add_argument("--checkpoint_scorer", required=False, type=str, default=None)
        parser.add_argument("--checkpoint_title", required=False, type=str, default=None)
        parser.add_argument("--checkpoint_code", required=False, type=str, default=None)
        parser.add_argument("--tokenizer", required=False, type=str, default=None)
        parser.add_argument("--device", default="auto", type=str)
        for name, value in cls.DEFAULTS.items():
            if value is True:
                parser.add_argument(f"--dont_{name}", action="store_false", dest=name)
            elif value is False:
                parser.add_argument(f"--{name}", action="store_true")
            else:
                parser.add_argument(f"--{name}", required=False, type=type(value), default=value)

    @classmethod
    def from_args(cls, args):
        params = {name: getattr(args, name) for name in cls.DEFAULTS}
        return cls.load(
            args.fm_index,
            args.checkpoint,
            scorer_checkpoint=args.checkpoint_scorer,
            title_checkpoint=args.checkpoint_title,
            code_checkpoint=args.checkpoint_code,
            tokenizer_path=args.tokenizer,
            **params,
        )

    # ---------------------------------------------------------------- loading

    @staticmethod
    def load_fm_index(path: str) -> FMIndex:
        logger.warning("initializing FM-index from %s", path)
        index = FMIndex.load(path)
        logger.warning(
            "FM-index initialized (%d docs, %d tokens)", index.n_docs, len(index)
        )
        return index

    @classmethod
    def load(
        cls,
        fm_index_path: str,
        checkpoint: Optional[str] = None,
        scorer_checkpoint: Optional[str] = None,
        title_checkpoint: Optional[str] = None,
        code_checkpoint: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        model_cfg: Optional[BartConfig] = None,
        **params,
    ) -> "SEALSearcher":
        """Load index + model(s) + tokenizer.

        ``checkpoint`` may be a fairseq ``.pt`` (default, reference parity), an
        HF model dir, or ``None``/``"random"`` for randomly initialized weights
        (benchmarks without network access).

        When ``fm_index_path`` has a shard manifest (``build_fm_index
        --shards N``), the per-shard indexes load directly -- the monolithic
        host index is never materialized (no monolithic suffix sort, no
        25-bytes/token host arrays).
        """
        import os

        import jax

        if os.path.exists(fm_index_path + ".manifest.json"):
            return cls._load_sharded_manifest(
                fm_index_path,
                checkpoint,
                scorer_checkpoint=scorer_checkpoint,
                title_checkpoint=title_checkpoint,
                code_checkpoint=code_checkpoint,
                tokenizer_path=tokenizer_path,
                model_cfg=model_cfg,
                **params,
            )
        fm_index = cls.load_fm_index(fm_index_path)
        tokenizer, model_cfg, main, extra = cls._load_models(
            checkpoint, scorer_checkpoint, title_checkpoint, code_checkpoint,
            tokenizer_path, model_cfg, params,
        )
        n_shards = int(params.pop("index_shards", 0) or 0)
        if n_shards > 1:
            # re-split the loaded corpus into per-device shards (config 5):
            # one-time cost at load, bit-identical decode vs monolithic.
            # numpy slice views, not .tolist() -- per-doc Python int lists
            # would cost ~7x the corpus bytes in transient RAM
            flat, off = fm_index.get_docs_flat(list(range(fm_index.n_docs)))
            docs = [
                flat[off[i] : off[i + 1]] for i in range(fm_index.n_docs)
            ]
            labels = fm_index.labels or [str(i) for i in range(fm_index.n_docs)]
            return cls.build_sharded(
                docs, labels, tokenizer, model_cfg, main,
                n_shards=n_shards, **extra, **params,
            )
        return cls(fm_index, tokenizer, model_cfg, main, **extra, **params)

    @classmethod
    def _load_models(
        cls, checkpoint, scorer_checkpoint, title_checkpoint, code_checkpoint,
        tokenizer_path, model_cfg, params,
    ):
        import jax

        tokenizer = load_tokenizer(tokenizer_path or params.get("backbone", "facebook/bart-large"))
        if model_cfg is None:
            backbone = params.get("backbone", "facebook/bart-large")
            if "t5" in backbone:
                from seal_tpu.models.t5 import T5Config, t5_tiny

                model_cfg = (
                    t5_tiny(vocab_size=tokenizer.vocab_size)
                    if "tiny" in backbone
                    else T5Config(vocab_size=max(32128, tokenizer.vocab_size))
                )
            elif "tiny" in backbone:
                from seal_tpu.models.config import bart_tiny

                model_cfg = bart_tiny(vocab_size=tokenizer.vocab_size)
            else:
                model_cfg = bart_large()
        if model_cfg.vocab_size < tokenizer.vocab_size:
            import dataclasses

            model_cfg = dataclasses.replace(model_cfg, vocab_size=tokenizer.vocab_size)

        from seal_tpu.models import api as model_api

        model_mod = model_api.module_for(model_cfg)

        def load_params(path):
            if path in (None, "random"):
                p = model_mod.init_params(jax.random.PRNGKey(0), model_cfg)
            elif getattr(model_cfg, "family", "bart") == "t5":
                import torch

                sd = torch.load(path, map_location="cpu", weights_only=False)
                p = convert.from_hf_t5_state_dict(sd.get("model", sd), model_cfg)
            elif path.endswith(".pt"):
                if params.get("fairseq_checkpoint", True):
                    p = convert.load_fairseq_checkpoint(path, model_cfg)
                else:
                    p = convert.load_hf_checkpoint(path, model_cfg)
            else:
                p = convert.load_hf_checkpoint(path, model_cfg)
            return convert.apply_seal_logits_bias(p, model_cfg)

        main = load_params(checkpoint)
        extra = dict(
            scorer_params=load_params(scorer_checkpoint) if scorer_checkpoint else None,
            title_params=load_params(title_checkpoint) if title_checkpoint else None,
            code_params=load_params(code_checkpoint) if code_checkpoint else None,
        )
        return tokenizer, model_cfg, main, extra

    @classmethod
    def _load_sharded_manifest(
        cls,
        fm_index_path: str,
        checkpoint=None,
        scorer_checkpoint=None,
        title_checkpoint=None,
        code_checkpoint=None,
        tokenizer_path=None,
        model_cfg=None,
        mesh=None,
        **params,
    ) -> "SEALSearcher":
        """Assemble sharded serving straight from per-shard index files."""
        from seal_tpu.parallel import mesh as mesh_lib
        from seal_tpu.parallel.sharded_index import (
            ShardedFMIndex,
            UnionHostIndex,
            load_sharded_hosts,
        )

        hosts, assignments, labels = load_sharded_hosts(fm_index_path)
        n_shards = len(hosts)
        want = int(params.pop("index_shards", 0) or 0)
        if want and want != n_shards:
            raise ValueError(
                f"index at {fm_index_path} was built with {n_shards} shards; "
                f"index_shards={want} cannot re-split a shard-wise build"
            )
        logger.warning(
            "sharded FM-index from %s: %d shards, %d docs",
            fm_index_path, n_shards, sum(h.n_docs for h in hosts),
        )
        tokenizer, model_cfg, main, extra = cls._load_models(
            checkpoint, scorer_checkpoint, title_checkpoint, code_checkpoint,
            tokenizer_path, model_cfg, params,
        )
        if mesh is None:
            import jax

            mesh = mesh_lib.make_mesh(
                n_data=n_shards, n_model=1, devices=jax.devices()[:n_shards]
            )
        si = ShardedFMIndex.from_hosts(hosts, vocab=model_cfg.vocab_size).place(mesh)
        union = UnionHostIndex(hosts, assignments, labels=labels)
        return cls(
            union, tokenizer, model_cfg, main,
            sharded_index=si, mesh=mesh, **extra, **params,
        )

    # ---------------------------------------------------------- key generation

    @classmethod
    def build_sharded(
        cls,
        docs: Sequence[Sequence[int]],
        labels: Sequence[str],
        tokenizer,
        model_cfg: BartConfig,
        params,
        n_shards: int,
        mesh=None,
        **kwargs,
    ) -> "SEALSearcher":
        """Serving mode with the FM-index partitioned over the mesh
        (BASELINE config 5): generation runs the sharded fused decoder;
        ranking runs against the union host view."""
        from seal_tpu.parallel import mesh as mesh_lib
        from seal_tpu.parallel.sharded_index import ShardedFMIndex, UnionHostIndex

        if mesh is None:
            import jax

            mesh = mesh_lib.make_mesh(
                n_data=n_shards, n_model=1, devices=jax.devices()[:n_shards]
            )
        si, hosts, assignments = ShardedFMIndex.build(
            docs, n_shards=n_shards, vocab=model_cfg.vocab_size, labels=labels
        )
        si = si.place(mesh)
        union = UnionHostIndex(hosts, assignments, labels=labels)
        return cls(
            union, tokenizer, model_cfg, params,
            sharded_index=si, mesh=mesh, **kwargs,
        )

    def _generate(self, params, toks, **kw):
        with self.phase_timer.phase("decode"):
            if self.sharded_index is not None:
                from seal_tpu.parallel.sharded_decode import sharded_fm_index_generate

                return sharded_fm_index_generate(
                    self.model_cfg, params, self.sharded_index, self.mesh, toks, **kw
                )
            return fm_index_generate(
                self.model_cfg, params, self.device_index, toks, **kw
            )

    def _rescore_keys(self, *args, **kw):
        with self.phase_timer.phase("rescore"):
            return rk.rescore_keys(*args, **kw)

    def _tokenize_batch(self, texts: Sequence[str]) -> List[List[int]]:
        limit = self.model_cfg.max_position_embeddings
        return [self.tokenizer.encode(t)[:limit] for t in texts]

    # ------------------------------------------------- batched index queries

    def _device_ranges(self, seqs: Sequence[Sequence[int]]):
        """Batched get_range on device (one call for any number of keys).

        The TPU host VM is frequently single-core; per-key host searchsorted
        chains dominate end-to-end latency otherwise.  Shapes are bucketed
        (pow2 batch, multiple-of-8 length) to bound recompiles.
        """
        import jax

        from seal_tpu.ops import fm_ops

        seqs = list(seqs)
        if not seqs:
            return []
        n = len(seqs)
        np_b = 1 << max(5, (n - 1).bit_length())
        L = max(len(s) for s in seqs)
        L = ((L + 7) // 8) * 8
        toks = np.zeros((np_b, L), np.int32)
        lens = np.zeros(np_b, np.int32)
        for i, s in enumerate(seqs):
            toks[i, : len(s)] = s
            lens[i] = len(s)
        if self.sharded_index is not None:
            from seal_tpu.parallel.sharded_index import sharded_count_sequences

            counts = np.asarray(
                sharded_count_sequences(self.sharded_index, self.mesh, toks, lens)
            )[:n]
            # (0, count) surrogate ranges: only the difference is meaningful
            return [(0, int(c)) for c in counts]
        if getattr(self.fm_index, "psi", None) is not None:
            # in-process native batch (sub-ms) beats a device dispatch at
            # these batch sizes -- especially through a remote-TPU tunnel
            return self.fm_index.get_ranges_batch(seqs)
        if not hasattr(self, "_jit_ranges"):
            # dispatch by device-index layout (wavelet layouts need wt_ops)
            from seal_tpu.index.wavelet import WaveletFMIndex
            from seal_tpu.ops import wt_ops

            mod = wt_ops if isinstance(self.device_index, WaveletFMIndex) else fm_ops
            self._jit_ranges = jax.jit(
                lambda idx, t, l: mod.range_for_sequences(idx, t, l)
            )
        lo, hi = self._jit_ranges(self.device_index, toks, lens)
        lo = np.asarray(lo)[:n]
        hi = np.asarray(hi)[:n]
        return list(zip(lo.tolist(), hi.tolist()))

    def _device_counts(self, seqs: Sequence[Sequence[int]]) -> List[int]:
        return [hi - lo for lo, hi in self._device_ranges(seqs)]

    def _count_filter(self, fk):
        """Drop (score, key) pairs whose key does not occur in the corpus
        (reference retrieval.py:91) -- one batched device call."""
        fk = [(sc, k) for sc, k in fk if k]
        if not fk:
            return fk
        counts = self._device_counts([k for _, k in fk])
        return [(sc, k) for (sc, k), c in zip(fk, counts) if c > 0]

    def _marked(self, inputs: Sequence[str], marker: str) -> List[str]:
        batch = list(inputs)
        if self.use_markers:
            batch = [i + f" || {marker}" for i in batch]
        if self.value_conditioning:
            batch = [i + " || +" for i in batch]
        return batch

    def _strip_body_keys(self, fk):
        """Reference retrieval.py:85-91."""
        s = self.strip_token_ids
        fk = [(sc, k[1:] if k[0] in s else k) for sc, k in fk if k]
        fk = [(sc, k[1:] if k[0] in s else k) for sc, k in fk if k]
        fk = [(sc, k[:-1] if k[-1] in s else k) for sc, k in fk if k]
        if self.min_length > 0:
            fk = [(sc, k) for sc, k in fk if len(k) == self.min_length]
        return self._count_filter(fk)

    def process_batch(self, inputs: Sequence[str], constrained_generation: bool = True):
        """Key generation for one query batch (reference retrieval.py:54-305)."""
        n_real = len(inputs)
        if n_real == 0:
            return
        if n_real < self.batch_size:
            # pad ragged final batches to the full batch shape so the jitted
            # decode/rescore programs keep one compiled signature
            inputs = list(inputs) + [inputs[-1]] * (self.batch_size - n_real)
        inputs = [
            (" " + q.strip()) if self.prepend_space else q.strip() for q in inputs
        ]
        gen_common = dict(
            num_beams=self.beam,
            disable_fm_index=not constrained_generation,
            forced_bos_token_id=None,
            top_m=self.top_m,
            window=self.window,
            speculative=self.speculative,
            exact_mask=self.exact_mask,
            exact_ties=self.exact_ties,
            topk=self.topk,
            diverse_bs_groups=self.diverse_bs_groups,
            diverse_bs_penalty=self.diverse_bs_penalty,
        )
        rescore_strip = dict(
            strip_from_bos=[
                self.title_bos_token_id,
                self.code_bos_token_id,
                self.model_cfg.decoder_start_token_id,
            ],
            strip_from_eos=[
                self.title_eos_token_id,
                self.code_eos_token_id,
                self.model_cfg.eos_token_id,
            ],
        )

        found_keys: List[List] = [[] for _ in inputs]

        if self.decode_body:
            batch_str = self._marked(inputs, "body")
            toks = self._tokenize_batch(batch_str)
            raw = self._generate(
                self.params,
                toks,
                min_length=self.length,
                max_length=self.length,
                stop_at_count=self.stop_at_count,
                **gen_common,
            )
            found_keys = [self._strip_body_keys(fk) for fk in raw]
            if self.rescore and self.use_markers:
                plain = self._tokenize_batch(inputs)
                found_keys = self._rescore_keys(
                    self.model_cfg, self.params, plain, found_keys, **rescore_strip
                )

        if self.add_query_to_keys:
            decomposed = []
            for inp in inputs:
                new_fk = [
                    self.tokenizer.encode_plain(s)
                    for s in rk.decompose_query_into_keys(inp, 3)
                ]
                s = self.strip_token_ids
                new_fk = [k[:-1] if k and k[-1] in s else k for k in new_fk if k]
                new_fk = [k[1:] if k and k[0] in s else k for k in new_fk if k]
                new_fk = [k[1:] if k and k[0] in s else k for k in new_fk if k]
                if self.min_length > 0:
                    new_fk = [k for k in new_fk if len(k) == self.min_length]
                new_fk = [k for k in new_fk if k]
                counts = self._device_counts(new_fk)
                new_fk = [k for k, c in zip(new_fk, counts) if c > 0]
                decomposed.append(new_fk)
            marked = self._tokenize_batch(self._marked(inputs, "body"))
            scored = self._rescore_keys(self.model_cfg, self.params, marked, decomposed)
            for fk, nfk in zip(found_keys, scored):
                fk += nfk

        if self.decode_titles:
            batch_str = self._marked(inputs, "title")
            toks = self._tokenize_batch(batch_str)
            raw = self._generate(
                self.title_params,
                toks,
                min_length=1,
                max_length=15,
                eos_token_id=self.title_eos_token_id,
                force_decoding_from=[self.title_bos_token_id],
                **gen_common,
            )
            new_keys = []
            for fk in raw:
                s = self.strip_token_ids
                if self.force_decoding_second_token >= 0:
                    fk = [(sc, k[:1] + k[2:]) for sc, k in fk if len(k) >= 3]
                fk = [(sc, k[:-1] if k and k[-1] in s else k) for sc, k in fk]
                if not self.partial_titles:
                    fk = [(sc, k) for sc, k in fk if k and k[-1] == self.title_eos_token_id]
                    if self.min_length > 0:
                        fk = [(sc, k) for sc, k in fk if len(k) == self.min_length + 1]
                fk = [
                    (sc, [self.title_bos_token_id] + k if k[0] != self.title_bos_token_id else k)
                    for sc, k in fk if k
                ]
                fk = self._count_filter(fk)
                new_keys.append(fk)
            if self.rescore and self.use_markers:
                new_keys = self._rescore_keys(
                    self.model_cfg,
                    self.title_params,
                    self._tokenize_batch(batch_str),
                    new_keys,
                    strip_from_bos=rescore_strip["strip_from_bos"],
                    strip_from_eos=[self.model_cfg.eos_token_id],
                )
            for fk, nfk in zip(found_keys, new_keys):
                fk += nfk

        if self.decode_code:
            batch_str = self._marked(inputs, "code")
            toks = self._tokenize_batch(batch_str)
            raw = self._generate(
                self.code_params,
                toks,
                min_length=1,
                max_length=15,
                eos_token_id=self.code_eos_token_id,
                force_decoding_from=[self.code_bos_token_id],
                **gen_common,
            )
            new_keys = []
            for fk in raw:
                s = self.strip_token_ids
                if self.force_decoding_second_token >= 0:
                    fk = [(sc, k[:1] + k[2:]) for sc, k in fk if len(k) >= 2]
                fk = [(sc, k[1:-1] if k[-1] in s else k[1:]) for sc, k in fk if k]
                if not self.partial_code:
                    fk = [(sc, k) for sc, k in fk if k and k[-1] == self.code_eos_token_id]
                fk = [
                    (sc, [self.code_bos_token_id] + k if k[0] != self.code_bos_token_id else k)
                    for sc, k in fk if k
                ]
                fk = self._count_filter(fk)
                new_keys.append(fk)
            if self.rescore and self.use_markers:
                new_keys = self._rescore_keys(
                    self.model_cfg,
                    self.code_params,
                    self._tokenize_batch(batch_str),
                    new_keys,
                    strip_from_bos=rescore_strip["strip_from_bos"],
                    strip_from_eos=[self.model_cfg.eos_token_id],
                )
            for fk, nfk in zip(found_keys, new_keys):
                fk += nfk

        if self.rescore and not self.use_markers:
            found_keys = self._rescore_keys(
                self.model_cfg,
                self.scorer_params,
                self._tokenize_batch(inputs),
                found_keys,
                **rescore_strip,
            )

        found_keys = [rk.deduplicate(fk) for fk in found_keys]
        found_keys = [[(n, s) for s, n in fk] for fk in found_keys]

        if self.unigram_scores:
            marked = self._tokenize_batch(self._marked(inputs, "body"))
            prefix = (
                [self.force_decoding_second_token]
                if self.force_decoding_second_token >= 0
                else []
            )
            with self.phase_timer.phase("unigram"):
                us = rk.compute_unigram_scores(
                    self.model_cfg, self.scorer_params, marked, prefix=prefix
                )
            return list(zip(found_keys, us))[:n_real]
        return found_keys[:n_real]

    def batch_generate_keys(self, queries: Sequence[str]):
        for off in range(0, len(queries), self.batch_size):
            yield from self.process_batch(
                queries[off : off + self.batch_size],
                constrained_generation=not self.free_generation,
            )

    def _pipelined_keys(self, queries: Sequence[str]):
        """Run key generation in a producer thread so device decode of batch
        N+1 overlaps host evidence aggregation of batch N."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=4 * self.batch_size)
        sentinel = object()

        def producer():
            try:
                for item in self.batch_generate_keys(queries):
                    q.put(item)
                q.put(sentinel)
            except BaseException as e:  # surfaced in the consumer
                q.put(e)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def generate_keys(self, query: str):
        return next(iter(self.batch_generate_keys([query])))

    # ------------------------------------------------------------- retrieval

    def retrieve_from_keys(self, keys, use_device: bool = True):
        unigram_scores = None
        if isinstance(keys, tuple) and len(keys) == 2:
            keys, unigram_scores = keys
        with self.phase_timer.phase("aggregate"):
            return self._retrieve_from_keys_inner(keys, unigram_scores, use_device)

    def _retrieve_from_keys_inner(self, keys, unigram_scores, use_device):
        results, ngrams = rk.aggregate_evidence(
            ngrams_and_scores=keys,
            unigram_scores=unigram_scores,
            range_fn=self._device_ranges if use_device else None,
            # matched-ngram lists are only read downstream under
            # include_keys (batch_search) or DEBUG printing; skipping
            # their construction cuts ~30% of aggregate wall time
            collect_found=self.include_keys or DEBUG,
            index=self.fm_index,
            max_occurrences_1=self.max_hits,
            n_docs_complete_score=self.fully_score,
            alpha=self.score_exponent,
            beta=self.repetition_penalty,
            length_penalty=self.scoring_length_penalty,
            use_fm_index_frequency=self.use_fm_index_frequency,
            add_best_unigrams_to_ngrams=self.add_best_unigrams_to_ngrams,
            use_top_k_unigrams=self.use_top_k_ngrams,
            sort_by_length=self.sort_by_length,
            sort_by_freq=self.sort_by_freq,
            smoothing=self.smoothing,
            allow_overlaps=self.allow_overlaps,
            single_key=self.single_key,
            unigrams_ignore_free_places=self.unigrams_ignore_free_places,
        )
        if DEBUG:
            for n, sc in ngrams.items():
                print(sc, self.tokenizer.decode(list(n)))
        return results, ngrams

    def batch_retrieve_from_keys(self, keys):
        if self.jobs >= 2:
            yield from self._mp_batch_retrieve_from_keys(keys)
        else:
            for i, kk in enumerate(keys):
                if self.print_n_doc:
                    print(i)
                yield self.retrieve_from_keys(kk)

    def _mp_batch_retrieve_from_keys(self, keys):
        """Process-parallel evidence aggregation (reference
        ``retrieval.py:762-775``).  Workers fork and see the host index's
        NumPy arrays copy-on-write; they never touch JAX state."""
        import multiprocessing

        idx = id(self)
        _MP_REGISTRY[idx] = self
        ctx = multiprocessing.get_context("fork")
        try:
            with ctx.Pool(self.jobs) as pool:
                yield from pool.imap(_retrieve_from_keys_mp_aux, ((idx, kk) for kk in keys))
        finally:
            _MP_REGISTRY.pop(idx, None)

    def _mp_detokenize(self, docs):
        """Process-parallel detokenization (reference ``retrieval.py:693-712``,
        the jobs>2 path).  Token splitting stays on the parent (cheap, needs
        the index); only BPE decoding fans out to forked workers."""
        import multiprocessing

        idx = id(self)
        _MP_REGISTRY[idx] = self
        splits = [d.split_tokens(d.raw_tokens()) for d in docs]
        ctx = multiprocessing.get_context("fork")
        try:
            with ctx.Pool(min(self.jobs, len(docs))) as pool:
                texts = pool.map(
                    _detokenize_mp_aux,
                    [(idx, t, b) for t, b in splits],
                    chunksize=max(1, len(docs) // (4 * self.jobs)),
                )
        finally:
            _MP_REGISTRY.pop(idx, None)
        for d, (title, body) in zip(docs, texts):
            d._title, d._body = title, body

    # ----------------------------------------------------------------- search

    def search(self, query: str, k: int = 10) -> List[SEALDocument]:
        return self.batch_search([query], k=k)[0]

    def batch_search(self, queries: Sequence[str], k: int = 10, detokenize=None):
        from seal_tpu.utils.profiling import PhaseTimer

        if detokenize is None:
            detokenize = self.detokenize
        queries = list(queries)
        if not queries:
            return []
        batch_t0 = time.time()
        timer = PhaseTimer(enabled=True)
        timer_log = self.progress
        with timer.phase("generate+aggregate"):
            keys_it = (
                self._pipelined_keys(queries) if self.pipeline
                else self.batch_generate_keys(queries)
            )
            results, keysets = zip(*self.batch_retrieve_from_keys(keys_it))

        key_texts: Dict[tuple, Tuple[str, int]] = {}
        if self.include_keys:
            # (the reference decodes+counts every key unconditionally,
            # retrieval.py:662-664; only include_keys consumers read them)
            uniq_keys = list({key for kk in keysets for key in kk})
            if uniq_keys:
                key_counts = self._device_counts([list(k) for k in uniq_keys])
                for key, cnt in zip(uniq_keys, key_counts):
                    key_texts[key] = (self.tokenizer.decode(list(key)), cnt)

        retrieved = []
        for query, res in zip(queries, results):
            docs = []
            for idx, (score, kk, _, full, _) in islice(res.items(), k):
                doc = SEALDocument(
                    idx,
                    score,
                    self.fm_index,
                    self.tokenizer,
                    delim1=self.title_eos_token_id,
                    delim2=self.code_eos_token_id,
                    query=query,
                )
                if self.include_keys:
                    for key, _s in kk:
                        if key not in key_texts:
                            key_texts[key] = (
                                self.tokenizer.decode(list(key)),
                                self.fm_index.get_count(list(key)),
                            )
                    doc.keys = [(*key_texts[key], s) for key, s in kk]
                # entry[3] is an np view in the native ranker path; document
                # helpers (.index / decode) expect a Python list
                doc._raw_tokens = full.tolist() if hasattr(full, "tolist") else full
                docs.append(doc)
            retrieved.append(docs)
        if detokenize:
            with timer.phase("detokenize"):
                flat = [d for docs in retrieved for d in docs]
                if self.jobs > 2 and len(flat) > 1:
                    self._mp_detokenize(flat)
                else:
                    # reference detokenize_retrieved strips surrounding
                    # whitespace (retrieval.py:777-778), unlike lazy .text()
                    for d in flat:
                        tt, bt = d.split_tokens(d.raw_tokens())
                        d._title = (
                            self.tokenizer.decode(tt, skip_special_tokens=True).strip()
                            if tt
                            else ""
                        )
                        d._body = self.tokenizer.decode(
                            bt, skip_special_tokens=True
                        ).strip()
        if timer_log:
            timer.log_summary()
        self.metrics.observe_batch(
            n_queries=len(queries),
            n_keys=sum(len(kk) for kk in keysets),
            n_docs=sum(len(docs) for docs in retrieved),
            elapsed_s=time.time() - batch_t0,
            timer=timer,
        )
        return retrieved

    def doc(self, docid) -> Optional[SEALDocument]:
        idx = self.docid2idx[docid] if isinstance(docid, str) else docid
        return SEALDocument(
            idx,
            None,
            self.fm_index,
            self.tokenizer,
            delim1=self.title_eos_token_id,
            delim2=self.code_eos_token_id,
        )
