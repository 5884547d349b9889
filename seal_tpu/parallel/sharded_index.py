"""Corpus-sharded FM-index over a device mesh.

The TPU-native answer to corpus scale (SURVEY.md section 2, "TPU-native
equivalents"): documents are partitioned into per-shard sub-corpora, each
with its own text/SA/Psi/C arrays.  A backward-search step runs on every
shard in parallel (``shard_map`` over the ``data`` axis); global counts are
``psum``s of per-shard counts, candidate validation merges with a logical
OR, and document scores merge by global top-k.  No inter-shard state is
needed because an FM-index over a sub-corpus is a complete FM-index.

Shard assignment is round-robin by document so shard sizes stay balanced.
Each shard's arrays are zero-padded to the max shard size (static shapes);
the sentinel-terminated layout makes padding harmless (padded rows hold an
empty second sentinel corpus).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seal_tpu.index.fm_index import FMIndex, SHIFT
from seal_tpu.index.device_index import DeviceFMIndex
from seal_tpu.ops import fm_ops


def round_robin_assignments(n_docs: int, n_shards: int) -> List[List[int]]:
    """Global doc ids per shard: doc i lives on shard ``i % n_shards``.

    The single source of truth for shard assignment -- build, disk
    manifests, and load must all agree on it.
    """
    assignments: List[List[int]] = [[] for _ in range(n_shards)]
    for i in range(n_docs):
        assignments[i % n_shards].append(i)
    return assignments


def shard_path(base: str, s: int) -> str:
    return f"{base}.shard{s:03d}"


def save_shard_manifest(base: str, n_shards: int, n_docs: int) -> None:
    """Write ``<base>.manifest.json`` describing a shard-wise index build."""
    import json

    with open(base + ".manifest.json", "w") as f:
        json.dump(
            {
                "format": "seal_tpu-sharded-fm-index",
                "version": 1,
                "n_shards": n_shards,
                "n_docs": n_docs,
                "assignment": "round_robin",
            },
            f,
        )


def load_sharded_hosts(base: str):
    """Load per-shard host FMIndexes written by ``build_fm_index --shards``.

    Returns (hosts, assignments, global_labels).  Never materializes the
    monolithic index -- each shard's arrays load independently (the
    reference-scale fix for corpora whose monolithic build would need
    80+ min of suffix sort and ~25 bytes/token of host RAM).
    """
    import json

    with open(base + ".manifest.json") as f:
        manifest = json.load(f)
    if manifest.get("assignment") != "round_robin":
        raise ValueError(f"unknown shard assignment {manifest.get('assignment')!r}")
    n_shards = int(manifest["n_shards"])
    hosts = [FMIndex.load(shard_path(base, s)) for s in range(n_shards)]
    n_docs = sum(h.n_docs for h in hosts)
    if n_docs != int(manifest["n_docs"]):
        raise ValueError(
            f"manifest says {manifest['n_docs']} docs, shards hold {n_docs}"
        )
    assignments = round_robin_assignments(n_docs, n_shards)
    for s, h in enumerate(hosts):
        if h.n_docs != len(assignments[s]):
            raise ValueError(f"shard {s}: {h.n_docs} docs != {len(assignments[s])}")
    labels: List[str] | None = [None] * n_docs  # type: ignore[list-item]
    for s, h in enumerate(hosts):
        if h.labels is None:
            labels = None
            break
        for local, g in enumerate(assignments[s]):
            labels[g] = h.labels[local]
    return hosts, assignments, labels


@struct.dataclass
class ShardedFMIndex:
    """Stacked per-shard index arrays; leading axis = shard.

    All arrays carry a leading ``n_shards`` dim and are placed with
    ``PartitionSpec('data', ...)`` so each device holds exactly its shard.
    """

    bwt: Any  # uint16/int32 [S, N_max]  shifted BWT symbols per shard
    psi: Any  # int32 [S, N_max]
    C: Any  # int32 [S, sigma_max+1]
    n_rows: Any  # int32 [S]  true rows per shard
    doc_offset: Any  # int32 [S]  global doc-index base per shard
    beginnings: Any  # int32 [S, D_max+1]
    n_docs_shard: Any  # int32 [S]
    corpus_counts: Any  # int32 [vocab]  global step-1 counts (replicated)
    bucket_occ: Any  # int32 [S, n_blocks_max+1, n_buckets]  per-shard tables

    n_shards: int = struct.field(pytree_node=False)
    vocab: int = struct.field(pytree_node=False)
    search_iters: int = struct.field(pytree_node=False)
    n_docs: int = struct.field(pytree_node=False)
    bucket_size: int = struct.field(pytree_node=False, default=1)

    @classmethod
    def build(
        cls,
        docs: Sequence[Sequence[int]],
        n_shards: int,
        vocab: int,
        labels: Sequence[str] | None = None,
    ) -> Tuple["ShardedFMIndex", List[FMIndex], List[List[int]]]:
        """Build per-shard host indexes (round-robin docs) and stack them.

        Returns (sharded_index, per-shard host FMIndex list, per-shard
        global-doc-id lists).
        """
        assignments = round_robin_assignments(len(docs), n_shards)
        hosts: List[FMIndex] = []
        for s in range(n_shards):
            idx = FMIndex()
            idx.initialize(
                [docs[i] for i in assignments[s]],
                labels=[labels[i] for i in assignments[s]] if labels else None,
            )
            hosts.append(idx)
        return cls.from_hosts(hosts, vocab), hosts, assignments

    @classmethod
    def from_hosts(
        cls, hosts: List[FMIndex], vocab: int
    ) -> "ShardedFMIndex":
        """Stack already-built per-shard host indexes into the device form.

        This is the shard-wise LOAD path (VERDICT r2 #4): per-shard
        ``.fmi.npz`` files built independently (``build_fm_index --shards``)
        assemble here without ever materializing the monolithic index.
        """
        n_shards = len(hosts)
        import math

        n_max = max(h.size() for h in hosts)
        sig_max = max(h.C.size for h in hosts)
        d_max = max(h.n_docs for h in hosts)

        def pad1(a, n, fill=0):
            out = np.full(n, fill, a.dtype if hasattr(a, "dtype") else np.int32)
            out[: len(a)] = a
            return out

        # decode needs only bwt (window/bucket symbols) + psi (rank) per
        # shard -- 6 bytes/token; host FMIndexes keep text/SA for ranking
        sym_dtype = np.uint16 if (vocab + SHIFT) < 2**16 else np.int32
        bwt = np.stack([pad1(h.bwt.astype(sym_dtype), n_max) for h in hosts])
        psi = np.stack([pad1(h.psi.astype(np.int32), n_max) for h in hosts])
        # pad C by repeating the final cumulative count so lookups for
        # symbols >= shard sigma yield empty ranges
        C = np.stack(
            [pad1(h.C.astype(np.int32), sig_max, fill=0) for h in hosts]
        )
        for s, h in enumerate(hosts):
            C[s, h.C.size :] = h.C[-1]
        beg = np.stack(
            [pad1(np.asarray(h.beginnings, np.int32), d_max + 1, fill=2**30) for h in hosts]
        )

        counts = np.zeros(vocab, np.int64)
        for h in hosts:
            occ = np.asarray(h.occurring_distinct)
            keep = occ < vocab
            counts[occ[keep]] += np.asarray(h.occurring_counts, dtype=np.int64)[keep]

        # per-shard bucket-occ tables with a SHARED bucket partition (sized
        # by the global alphabet), padded to the max block count by
        # repeating the final cumulative row (safe: queries stay <= n_rows)
        from seal_tpu.index.device_index import build_bucket_occ

        occ_tabs, bucket_size = [], 1
        for h in hosts:
            tab, bucket_size = build_bucket_occ(h.bwt, vocab + SHIFT)
            occ_tabs.append(tab)
        nb_max = max(t.shape[0] for t in occ_tabs)
        bucket_occ = np.stack(
            [
                np.concatenate([t, np.repeat(t[-1:], nb_max - t.shape[0], 0)])
                for t in occ_tabs
            ]
        )

        doc_offset = np.zeros(n_shards, np.int32)  # global ids via assignment
        return cls(
            bwt=jnp.asarray(bwt),
            psi=jnp.asarray(psi),
            C=jnp.asarray(C),
            n_rows=jnp.asarray([h.size() for h in hosts], jnp.int32),
            doc_offset=jnp.asarray(doc_offset),
            beginnings=jnp.asarray(beg),
            n_docs_shard=jnp.asarray([h.n_docs for h in hosts], jnp.int32),
            corpus_counts=jnp.asarray(np.minimum(counts, 2**31 - 1), jnp.int32),
            bucket_occ=jnp.asarray(bucket_occ),
            n_shards=n_shards,
            vocab=vocab,
            # rank queries search one symbol block; depth = the largest
            # block across shards (see DeviceFMIndex.from_host)
            search_iters=max(
                1,
                math.ceil(
                    math.log2(max(int(np.max(np.diff(h.C))) for h in hosts) + 1)
                ),
            ),
            n_docs=sum(h.n_docs for h in hosts),
            bucket_size=bucket_size,
        )

    def shard_view(self, s: int) -> DeviceFMIndex:
        """A single shard as a DeviceFMIndex (host-side convenience)."""
        return DeviceFMIndex(
            text=None,
            sa=None,
            psi=self.psi[s],
            bwt=self.bwt[s],
            C=self.C[s],
            beginnings=self.beginnings[s],
            corpus_counts=self.corpus_counts,
            bucket_occ=self.bucket_occ[s],
            n_rows=int(self.n_rows[s]),
            sigma=self.C.shape[1] - 1,
            vocab=self.vocab,
            n_docs=int(self.n_docs_shard[s]),
            search_iters=self.search_iters,
            bucket_size=self.bucket_size,
        )

    def place(self, mesh: Mesh) -> "ShardedFMIndex":
        """Place shard-major arrays along the mesh's ``data`` axis."""
        sharded = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())

        def put(name, a):
            if name == "corpus_counts":
                return jax.device_put(a, repl)
            return jax.device_put(a, sharded)

        return self.replace(
            bwt=put("bwt", self.bwt),
            psi=put("psi", self.psi),
            C=put("C", self.C),
            n_rows=put("n_rows", self.n_rows),
            doc_offset=put("doc_offset", self.doc_offset),
            beginnings=put("beginnings", self.beginnings),
            n_docs_shard=put("n_docs_shard", self.n_docs_shard),
            corpus_counts=put("corpus_counts", self.corpus_counts),
            bucket_occ=put("bucket_occ", self.bucket_occ),
        )


class UnionHostIndex:
    """Host-side union view over per-shard FMIndexes.

    Presents the subset of the FMIndex API the evidence ranker consumes
    (counts, occurrences, docs, token stats) with global document ids.
    Range values are (0, count) surrogates -- only their difference is
    meaningful, and ``occurrences`` computes per-shard positions itself
    (offset into a disjoint global position space).
    """

    def __init__(self, hosts: List[FMIndex], assignments: List[List[int]],
                 labels: Sequence[str] | None = None):
        self.hosts = hosts
        self.assignments = assignments
        self.labels = list(labels) if labels else None
        self.offsets = np.cumsum([0] + [h.size() for h in hosts])
        total_tokens = sum(len(h) for h in hosts)
        self.beginnings = [0, total_tokens]
        self.n_sentinels = len(hosts)
        self.n_docs = sum(h.n_docs for h in hosts)
        # global doc id -> (shard, local idx)
        self._where = {}
        for s, ids in enumerate(assignments):
            for local, g in enumerate(ids):
                self._where[g] = (s, local)

    def __len__(self):
        return self.beginnings[-1]

    def get_count(self, ngram) -> int:
        return sum(h.get_count(ngram) for h in self.hosts)

    def get_range(self, ngram):
        return 0, self.get_count(ngram)

    def token_count(self, token: int) -> int:
        return sum(h.token_count(token) for h in self.hosts)

    def occurrences(self, ngram, cap: int, rng=None):
        """Occurrence rows in the CANONICAL order (global doc id asc,
        within-doc SA order) -- identical sequence to the monolithic
        ``FMIndex.occurrences`` over the same documents, for any shard
        count: within-doc SA order is corpus-layout-independent (same-doc
        suffix comparisons always resolve inside the doc), each shard
        already returns doc-sorted rows, and a stable global doc sort
        merges them.  This is what makes sharded ranking bit-identical to
        monolithic ranking end-to-end (round-5 verdict #8).  Truncation at
        ``cap`` applies AFTER the merge (global first-``cap`` by canonical
        order); the ranker never truncates (rare ngrams have
        count <= cap), so the monolithic SA-order-truncation difference is
        unreachable there.
        """
        del rng  # surrogate ranges carry no positions; compute per shard
        ends, docs = [], []
        for s, h in enumerate(self.hosts):
            e, d = h.occurrences(ngram, cap)
            if len(e) == 0:
                continue
            ends.append(e + int(self.offsets[s]))
            gmap = np.asarray(self.assignments[s], dtype=np.int64)
            docs.append(gmap[d])
        if not ends:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        ends_a = np.concatenate(ends)
        docs_a = np.concatenate(docs)
        order = np.argsort(docs_a, kind="stable")[:cap]
        return ends_a[order], docs_a[order]

    def get_doc(self, doc_index: int):
        s, local = self._where[doc_index]
        return self.hosts[s].get_doc(local)

    def get_doc_length(self, doc_index: int) -> int:
        s, local = self._where[doc_index]
        return self.hosts[s].get_doc_length(local)


def _shard_device_index(
    si: ShardedFMIndex, s_bwt, s_psi, s_C, s_beg, n_rows, s_bucket_occ=None
):
    """A DeviceFMIndex view of one shard inside shard_map (arrays are the
    per-device blocks; n_rows is the shard's true row count as a traced
    scalar folded into the query ops via masking)."""
    return DeviceFMIndex(
        text=None,
        sa=None,
        psi=s_psi,
        bwt=s_bwt,
        C=s_C,
        beginnings=s_beg,
        corpus_counts=si.corpus_counts,
        bucket_occ=s_bucket_occ,
        n_rows=si.bwt.shape[1],  # static padded size; C caps real ranges
        sigma=si.C.shape[1] - 1,
        vocab=si.vocab,
        n_docs=si.beginnings.shape[1] - 1,
        search_iters=si.search_iters,
        bucket_size=si.bucket_size,
    )


def _block_device_index(
    s_bwt, s_psi, s_C, s_beg, vocab: int, search_iters: int, bucket_size: int
):
    """A DeviceFMIndex over one shard's [1, ...] blocks inside shard_map.
    Statics come from block shapes + explicit args so the builder can live
    in a compiled-program cache (no closure over a particular index)."""
    return DeviceFMIndex(
        text=None,
        sa=None,
        psi=s_psi[0],
        bwt=s_bwt[0],
        C=s_C[0],
        beginnings=s_beg[0],
        corpus_counts=None,  # unused by the rank/validate ops here
        bucket_occ=None,
        n_rows=s_bwt.shape[1],  # static padded size; C caps real ranges
        sigma=s_C.shape[1] - 1,
        vocab=vocab,
        n_docs=s_beg.shape[1] - 1,
        search_iters=search_iters,
        bucket_size=bucket_size,
    )


def _range_scan(dev, s_nrows, toks, lens):
    """Backward-search scan to each padded sequence's [lo, hi) on one shard."""
    # the padded rows beyond the shard's true size never enter ranges:
    # initial range must be [0, true_n_rows).  initial lo is built from
    # replicated operands: mark it varying over the shard axis so the scan
    # carry type matches the in-loop values
    lo = jax.lax.pcast(jnp.zeros(toks.shape[:-1], jnp.int32), ("data",), to="varying")
    hi = jnp.broadcast_to(s_nrows[0], toks.shape[:-1]).astype(jnp.int32)

    def body(carry, tok_t):
        lo, hi, t = carry
        nlo, nhi = fm_ops.backward_step(dev, tok_t, lo, hi)
        keep = t < lens
        return (jnp.where(keep, nlo, lo), jnp.where(keep, nhi, hi), t + 1), None

    (lo, hi, _), _ = jax.lax.scan(body, (lo, hi, jnp.int32(0)), jnp.moveaxis(toks, -1, 0))
    return lo, hi


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=16)
def _jitted_sharded_query(mesh: Mesh, statics, with_cands: bool):
    """Compiled per-(mesh, index-statics) sharded range/validate programs.

    Rebuilding the shard_map closure per call retraced the whole
    backward-search scan on every _count_filter batch (review finding,
    round 3); the jit wrapper restores the compiled-program cache the
    non-sharded path gets from the searcher's _jit_ranges.
    """
    from jax.experimental.shard_map import shard_map

    vocab, search_iters, bucket_size = statics

    def per_shard(s_bwt, s_psi, s_C, s_beg, s_nrows, toks, lens, *cands):
        dev = _block_device_index(
            s_bwt, s_psi, s_C, s_beg, vocab, search_iters, bucket_size
        )
        lo, hi = _range_scan(dev, s_nrows, toks, lens)
        if with_cands:
            return jax.lax.psum(fm_ops.validate_tokens(dev, cands[0], lo, hi), "data")
        return jax.lax.psum(hi - lo, "data")

    n_rep = 3 if with_cands else 2
    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("data"),) * 5 + (P(),) * n_rep,
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_count_sequences(si: ShardedFMIndex, mesh: Mesh, tokens, lengths):
    """Global corpus counts of padded sequences: per-shard counts + psum.

    tokens: [B, L] replicated; returns [B] int32 global counts.
    """
    fn = _jitted_sharded_query(
        mesh, (si.vocab, si.search_iters, si.bucket_size), False
    )
    return fn(
        si.bwt, si.psi, si.C, si.beginnings, si.n_rows,
        jnp.asarray(tokens, jnp.int32), jnp.asarray(lengths, jnp.int32),
    )


def sharded_allowed_mask(si: ShardedFMIndex, mesh: Mesh, tokens, lengths, cand_tokens):
    """Validate candidate continuations against the global (sharded) corpus.

    tokens: [B, L] prefix batch; cand_tokens: [B, M].  Returns [B, M] global
    counts of prefix+candidate (0 = not allowed anywhere).
    """
    fn = _jitted_sharded_query(
        mesh, (si.vocab, si.search_iters, si.bucket_size), True
    )
    return fn(
        si.bwt, si.psi, si.C, si.beginnings, si.n_rows,
        jnp.asarray(tokens, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(cand_tokens, jnp.int32),
    )
