"""Near-duplicate detection family over the documents table.

Four pillars of training-data dedup, each Ray-Data-first:

* exact          — hash-partition groupby, keep min doc_id (queries.py)
* ngram_jaccard  — exact char-trigram Jaccard via a broadcast binary
                   incidence matrix (integer arithmetic end-to-end, so
                   it has an exact DuckDB oracle); the 10^12-doc path
                   replaces the broadcast with LSH prefiltering below
* minhash_lsh    — shingle → 64-perm minhash → banded LSH buckets →
                   candidate pairs → signature-similarity verify
* simhash        — 64-bit simhash, banded by 4×16-bit chunks,
                   hamming-distance verify

All randomness is a fixed seeded permutation table — results are
deterministic for a given input.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_MERSENNE = (1 << 61) - 1
_N_PERMS = 64
_N_BANDS = 16  # 4 rows per band

_BUCKET_CAP = 512  # LSH hot-bucket cap (see partition_pairs docnotes)
_N_PARTITIONS = 32


def _add_part(df: "pd.DataFrame") -> "pd.DataFrame":
    df = df.copy()
    df["__part"] = (pd.util.hash_array(df["band_key"].to_numpy(dtype=object))
                    % _N_PARTITIONS).astype(np.int64)
    return df

_rng = np.random.RandomState(1234)
_PERM_A = _rng.randint(1, _MERSENNE, size=_N_PERMS, dtype=np.int64)
_PERM_B = _rng.randint(0, _MERSENNE, size=_N_PERMS, dtype=np.int64)


def _read_docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles → stable 61-bit hashes."""
    words = text.lower().split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.int64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big") % _MERSENNE
    return out


def _minhash_signature(text: str) -> np.ndarray:
    h = _shingle_hashes(text)
    if len(h) == 0:
        return np.zeros(_N_PERMS, dtype=np.int64)
    # (perms, shingles): ((a*h + b) mod p) then min over shingles
    vals = (_PERM_A[:, None] * h[None, :] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.5):
    """MinHash+LSH near-dup pairs: per-batch signatures → explode to
    (band_key, doc_id, signature) → groupby band bucket → candidate
    pairs → dedupe pairs → verify estimated Jaccard ≥ τ.

    The only shuffle is the band groupby, whose payload is 16 small
    rows per document — the pattern that holds at corpus scale."""

    def signatures(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        band_keys: List[str] = []
        out_ids: List[int] = []
        sigs: List[List[int]] = []
        for did, text in zip(doc_ids, texts):
            sig = _minhash_signature(text)
            sig_list = sig.tolist()
            rows_per_band = _N_PERMS // _N_BANDS
            for b in range(_N_BANDS):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                digest = hashlib.blake2b(chunk.tobytes(),
                                         digest_size=8).hexdigest()
                band_keys.append(f"{b}:{digest}")
                out_ids.append(did)
                sigs.append(sig_list)
        return pa.table({
            "band_key": pa.array(band_keys, pa.string()),
            "doc_id": pa.array(out_ids, pa.int64()),
            "sig": pa.array(sigs, pa.list_(pa.int64())),
        })

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One hash partition of band rows: pandas groupby over its
        band keys (C speed), numpy pair generation per hot bucket —
        the all-to-all is ONE shuffle on a small int partition id,
        never a per-bucket task dispatch."""
        out = []
        for _, grp in df.groupby("band_key", sort=False):
            grp = grp.sort_values("doc_id").drop_duplicates("doc_id")
            if not (2 <= len(grp) <= _BUCKET_CAP):
                continue
            ids = grp["doc_id"].to_numpy()
            sigs = np.vstack(grp["sig"].to_numpy())
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            matches = (sigs[a_idx] == sigs[b_idx]).sum(axis=1)
            out.append(pd.DataFrame({"id_a": ids[a_idx], "id_b": ids[b_idx],
                                     "sim_64": matches.astype(np.int64)}))
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "sim_64": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    import pyarrow.compute as pc

    from .joins import groupby_agg_partitioned

    ds = _read_docs(sf_dir)
    pairs = (ds.map_batches(signatures, batch_format="pyarrow",
                            zero_copy_batch=True)
             .map_batches(_add_part, batch_format="pandas")
             .groupby("__part")
             .map_groups(partition_pairs, batch_format="pandas"))
    # dedupe candidate pairs (a pair can collide in several bands);
    # sim_64 is identical in every bucket row, so max is a no-op pick
    min_matches = int(threshold * _N_PERMS)
    verified = (groupby_agg_partitioned(pairs, ["id_a", "id_b"],
                                        {"sim_64": "max"})
                .map_batches(lambda b: b.filter(
                    pc.greater_equal(b.column("sim_64"), min_matches))
                    .select(["id_a", "id_b", "sim_64"]),
                    batch_format="pyarrow")
                .sort(["id_a", "id_b"]))
    return verified


_TOKEN_HASH_CACHE: Dict[str, int] = {}


def _simhash64(text: str) -> int:
    tokens = text.lower().split()
    if not tokens:
        return 0
    cache = _TOKEN_HASH_CACHE
    hashes = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = cache.get(tok)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            if len(cache) < 1_000_000:
                cache[tok] = h
        hashes[i] = h
    # vectorized bit expansion: (n_tokens, 64) sign contributions
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    out_bits = (acc > 0).astype(np.uint64)
    return int((out_bits << np.arange(64, dtype=np.uint64)).sum())


def dedup_simhash(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup: 64-bit fingerprints, banded into 4×16-bit
    keys (a pair within hamming ≤ 3·16/64 … pigeonhole: any pair with
    ≤ 3 differing bands shares ≥ 1 exact band), verified by popcount."""

    def fingerprints(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        band_keys, out_ids, hashes = [], [], []
        for did, text in zip(doc_ids, texts):
            h = _simhash64(text)
            for b in range(4):
                chunk = (h >> (16 * b)) & 0xFFFF
                band_keys.append(f"{b}:{chunk}")
                out_ids.append(did)
                hashes.append(h - (1 << 63))  # store as signed int64
        return pa.table({
            "band_key": pa.array(band_keys, pa.string()),
            "doc_id": pa.array(out_ids, pa.int64()),
            "simhash": pa.array(hashes, pa.int64()),
        })

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Hash partition of band rows → pandas groupby over band
        keys, vectorized hamming per hot bucket.  The _BUCKET_CAP
        skip is the standard LSH hot-bucket heuristic — a bucket that
        large means the band carries no signal; pairs in a skipped
        bucket still surface via the other 3 bands."""
        out = []
        for _, grp in df.groupby("band_key", sort=False):
            grp = grp.sort_values("doc_id").drop_duplicates("doc_id")
            if not (2 <= len(grp) <= _BUCKET_CAP):
                continue
            ids = grp["doc_id"].to_numpy()
            hs = (grp["simhash"].to_numpy().astype(np.int64).astype(np.uint64)
                  + np.uint64(1 << 63))
            a_idx, b_idx = np.triu_indices(len(ids), k=1)
            x = hs[a_idx] ^ hs[b_idx]
            pop = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                axis=1).sum(axis=1).astype(np.int64)
            out.append(pd.DataFrame({"id_a": ids[a_idx], "id_b": ids[b_idx],
                                     "hamming": pop}))
        if not out:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    import pyarrow.compute as pc

    from .joins import groupby_agg_partitioned

    ds = _read_docs(sf_dir)
    pairs = (ds.map_batches(fingerprints, batch_format="pyarrow",
                            zero_copy_batch=True)
             .map_batches(_add_part, batch_format="pandas")
             .groupby("__part")
             .map_groups(partition_pairs, batch_format="pandas"))
    out = (groupby_agg_partitioned(pairs, ["id_a", "id_b"],
                                   {"hamming": "min"})
           .map_batches(lambda b: b.filter(
               pc.less_equal(b.column("hamming"), max_hamming))
               .select(["id_a", "id_b", "hamming"]),
               batch_format="pyarrow")
           .sort(["id_a", "id_b"]))
    return out


def _trigram_set(text: str) -> set:
    t = text.lower()
    return {t[i:i + 3] for i in range(len(t) - 2)} if len(t) >= 3 else set()


def dedup_ngram_jaccard(sf_dir: str, threshold_pct: int = 60):
    """Exact char-trigram Jaccard pairs (10·inter ≥ τ%·union/10 …
    integer compare: 10*inter >= (τ/10)*union with τ=60 → 10*inter >=
    6*union) — SQL-oracle-checkable because every quantity is an
    integer.  Ray side: broadcast binary incidence matrix (docs ×
    trigram vocab), one matmul per batch block-row."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    all_ids = np.asarray(t["doc_id"])
    sets = [_trigram_set(x) for x in t["text"].to_pylist()]
    vocab: Dict[str, int] = {}
    for s in sets:
        for g in s:
            if g not in vocab:
                vocab[g] = len(vocab)
    inc = np.zeros((len(all_ids), len(vocab)), dtype=np.int32)
    for i, s in enumerate(sets):
        for g in s:
            inc[i, vocab[g]] = 1
    sizes = inc.sum(axis=1)
    order = np.argsort(all_ids)
    all_ids, inc, sizes = all_ids[order], inc[order], sizes[order]
    bc = ray.put((all_ids, inc, sizes, vocab))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, inc, sizes, vocab = ray.get(bc)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        m = np.zeros((len(ids), len(vocab)), dtype=np.int32)
        my_sizes = np.zeros(len(ids), dtype=np.int64)
        for i, text in enumerate(texts):
            s = _trigram_set(text)
            my_sizes[i] = len(s)
            for g in s:
                j = vocab.get(g)
                if j is not None:
                    m[i, j] = 1
        inter = m @ inc.T  # (batch, all)
        union = my_sizes[:, None] + sizes[None, :] - inter
        mask = (10 * inter) >= ((threshold_pct // 10) * union)
        rows, cols = np.where(mask)
        a = ids[rows]
        b = all_ids[cols]
        sel = a < b
        return pa.table({
            "id_a": pa.array(a[sel], pa.int64()),
            "id_b": pa.array(b[sel], pa.int64()),
        })

    return (_read_docs(sf_dir)
            .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
            .sort(["id_a", "id_b"]))


NGRAM_JACCARD_SQL = """
WITH g AS (
  SELECT DISTINCT doc_id, substring(lower(text), CAST(r.i AS INT), 3) AS tri
  FROM documents CROSS JOIN range(1, 4000) AS r(i)
  WHERE length(text) >= 3 AND r.i <= length(text) - 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM g a JOIN g b ON a.tri = b.tri AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE 10 * i >= 6 * (sa.n + sb.n - i)
ORDER BY id_a, id_b
"""
