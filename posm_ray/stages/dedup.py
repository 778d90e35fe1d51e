"""Deduplication suite (training-data ops; SURVEY.md A7 + graft mandate).

- exact:      content hash -> hash-partitioned groupby -> min-id winner
- minhash:    shingle -> minhash sig -> LSH band explode -> bucket groupby ->
              candidate pairs -> Jaccard verify -> greedy min-id clustering
- simhash:    64-bit simhash, bucket by high bits, hamming<=t pairs
- ngram:      exact n-gram Jaccard between candidate pairs (verify kernel)
- embedding:  cosine near-dup via the ANN stage (knn.ann_cosine_exact)

All shuffles move pre-reduced partials (signatures / band keys), never raw
text, so the exchanged volume is O(docs x bands), not O(bytes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import hashing, text as textfn

from ..util import default_pool


def add_content_hash(ds, text_col: str = "text"):
    """Vectorized md5 content-hash column (DuckDB twin: md5(text))."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = [textfn.fingerprint_md5(t) for t in texts]
        return batch.append_column("content_hash", pa.array(h, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_exact(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct text. Hash-partition on the content
    hash, vectorized per-partition min — no full-row shuffle: only
    (hash, id) pairs move."""
    from ..util import hash_rollup

    hashed = add_content_hash(ds, text_col)
    # pre-reduce per block (combiner): one (hash, min-id) row per distinct
    # hash per block before the exchange
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["content_hash", id_col]).to_pandas() \
            .groupby("content_hash", sort=False)[id_col].min() \
            .reset_index(name="keep_id")
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = hashed.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("content_hash", sort=False)["keep_id"].min() \
            .reset_index(name="keep_id")

    return hash_rollup(pairs, ["content_hash"], merge)


def dedup_exact_rows(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Full surviving rows: winners joined back as a broadcast keep-set
    (semi-join via broadcast id set — the M7/X4 anti-join pattern inverted)."""
    import ray

    winners = dedup_exact(ds, id_col, text_col)
    keep = set(r["keep_id"] for r in winners.iter_rows())
    keep_ref = ray.put(keep)

    def keep_only(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref) if not isinstance(keep_ref, set) else keep_ref
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = pa.array([int(i) in ks for i in ids])
        return batch.filter(mask)

    return ds.map_batches(keep_only, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class _MinHashBands:
    """Actor stage: text -> minhash signature -> (band_id, band_hash, id)
    rows. Signature params fixed in __init__ (deterministic seed)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_width: int = 5,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.num_perm = num_perm
        self.bands = bands
        self.w = shingle_width
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        sigs = hashing.minhash_signature_batch(texts, self.num_perm, self.w)
        out_id, out_band, out_hash = [], [], []
        for i in range(len(ids)):
            for band_id, band_hash in hashing.lsh_band_keys(sigs[i], self.bands):
                out_id.append(int(ids[i]))
                out_band.append(band_id)
                out_hash.append(band_hash)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
        })


def minhash_candidate_pairs(ds, *, num_perm: int = 64, bands: int = 16,
                            shingle_width: int = 5, concurrency=None):
    """Docs sharing any LSH band bucket -> candidate pairs (a < b),
    deduplicated across bands via a second groupby."""
    kwargs = dict(batch_format="pyarrow", batch_size=2048,
                  fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                             shingle_width=shingle_width),
                  concurrency=concurrency if concurrency is not None else default_pool())
    bands_ds = ds.map_batches(_MinHashBands, **kwargs)

    from ..util import hash_rollup

    def bucket_pairs(part: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in part.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].unique())
            if len(ids) < 2:
                continue
            ai, bi = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ai])
            out_b.append(ids[bi])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    pairs = hash_rollup(bands_ds, ["band_id", "band_hash"], bucket_pairs)

    # dedupe pairs found in multiple bands
    def dedupe(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["a", "b"], sort=False).size().reset_index(name="n_bands")
        g["n_bands"] = g["n_bands"].astype("int64")
        return g

    return hash_rollup(pairs, ["a", "b"], dedupe)


def verify_jaccard_pairs(pairs_ds, docs_ds, *, threshold: float = 0.5,
                         ngram: int = 5, id_col: str = "doc_id",
                         text_col: str = "text"):
    """Exact n-gram Jaccard over candidate pairs. The doc texts needed are
    only those appearing in candidates (small side) — broadcast them."""
    import ray

    cand = pairs_ds.to_pandas()
    needed = set(cand["a"]) | set(cand["b"])
    needed_ref = ray.put(needed)

    def grab(batch: pa.Table) -> pa.Table:
        need = ray.get(needed_ref) if not isinstance(needed_ref, set) else needed_ref
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = pa.array([int(i) in need for i in ids])
        return batch.select([id_col, text_col]).filter(mask)

    texts = {}
    for b in docs_ds.map_batches(grab, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            texts[i] = t
    grams = {i: hashing.char_ngrams(t, ngram) for i, t in texts.items()}
    sims = [hashing.jaccard(grams[a], grams[b])
            for a, b in zip(cand["a"], cand["b"])]
    cand = cand.assign(jaccard=sims)
    return cand[cand["jaccard"] >= threshold].reset_index(drop=True)


def near_dup_clusters(verified_pairs: pd.DataFrame) -> dict[int, int]:
    """Union-find over verified pairs (driver side — candidate set is small
    by construction); returns id -> cluster representative (min id)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(verified_pairs["a"], verified_pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_pairs(ds, *, max_hamming: int = 3, prefix_bits: int = 16,
                  id_col: str = "doc_id", text_col: str = "text"):
    """SimHash near-dup: bucket by the top ``prefix_bits`` of the fingerprint
    (docs differing in <= max_hamming bits usually share a prefix bucket for
    small thresholds; multi-table prefixes would raise recall — documented
    approximation), verify hamming distance within buckets."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        sigs = [hashing.simhash(t) for t in texts]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64)),
            "bucket": pa.array(
                np.array([s >> (64 - prefix_bits) for s in sigs], dtype=np.int64)),
        })

    sigs = ds.map_batches(sig_batch, batch_format="pyarrow")

    def bucket_verify(part: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, rows_h = [], [], []
        for _, g in part.groupby("bucket", sort=False):
            recs = sorted(zip(g["doc_id"], g["simhash"].to_numpy().view(np.uint64)))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    h = hashing.hamming64(int(recs[i][1]), int(recs[j][1]))
                    if h <= max_hamming:
                        rows_a.append(recs[i][0])
                        rows_b.append(recs[j][0])
                        rows_h.append(h)
        return pd.DataFrame({"a": pd.Series(rows_a, dtype=np.int64),
                             "b": pd.Series(rows_b, dtype=np.int64),
                             "hamming": pd.Series(rows_h, dtype=np.int64)})

    from ..util import hash_rollup

    return hash_rollup(sigs, ["bucket"], bucket_verify)


def embedding_near_dups(embeddings, *, threshold: float = 0.95, k: int = 10,
                        sample_queries: int | None = None):
    """Embedding-cosine near-dup: exact top-k per vector (or a query sample),
    filtered to cosine >= threshold."""
    from . import knn as knn_stage

    emb_pd = embeddings.to_pandas() if sample_queries else None
    if sample_queries:
        q = emb_pd.iloc[:sample_queries]
        queries = {"id": q["vec_id"].to_numpy(),
                   "mat": np.asarray(list(q["embedding"]), dtype=np.float64)}
    else:
        all_pd = embeddings.to_pandas()
        queries = {"id": all_pd["vec_id"].to_numpy(),
                   "mat": np.asarray(list(all_pd["embedding"]), dtype=np.float64)}
    topk = knn_stage.ann_cosine_exact(embeddings, queries, k=k)

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["cosine"], threshold))

    return topk.map_batches(flt, batch_format="pyarrow")
