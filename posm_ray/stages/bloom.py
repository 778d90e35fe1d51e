"""Bloom-filter membership prefilter + exact anti-join (crawl-frontier
dedup: "which of these urls have we never seen?").

The production shape at 10^12-url scale: the seen-set does NOT fit a
broadcast hash set, but a Bloom bitmap of fixed size does (m bits
regardless of seen-set cardinality; FPR degrades gracefully and is a
tuning knob). The pipeline is EXACT end-to-end:

1. build: every block of the seen stream sets its bits into a local
   bitmap (vectorized double-hashing, k probes); bitmaps OR-merge —
   a mergeable sketch like the HLL in stages/tiles.py, shipped as ONE
   m/8-byte row per block through a repartition(1) combine;
2. prefilter: the new stream tests its urls against the broadcast
   bitmap — bloom-NEGATIVE rows are definitely unseen and pass through
   immediately (no shuffle for the typical 95%+ of a crawl frontier);
3. confirm: only bloom-POSITIVE candidates (true hits + FPs) co-partition
   with the seen urls on url; a vectorized per-partition anti-join
   rescues the false positives.

So the all-to-all exchange carries only the candidate fraction, the
sketch is O(m) no matter the input, and the output equals the exact
anti-join (SQL twin: NOT IN) for ANY m — a tiny bitmap only moves work
from step 2 to step 3, never changes the answer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _url_probes(urls: list[str | None], m_bits: int, k: int) -> np.ndarray:
    """(len(urls), k) bit positions via double hashing: blake2b-16 split
    into two 64-bit halves, probe_i = (h1 + i*h2) mod m."""
    out = np.empty((len(urls), k), dtype=np.int64)
    ks = np.arange(k, dtype=np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.blake2b((u or "").encode("utf-8"), digest_size=16).digest()
        h1 = np.uint64(int.from_bytes(d[:8], "big"))
        h2 = np.uint64(int.from_bytes(d[8:], "big") | 1)
        with np.errstate(over="ignore"):
            out[i] = ((h1 + ks * h2) % np.uint64(m_bits)).astype(np.int64)
    return out


def build_bloom(seen_ds, *, url_col: str = "url", m_bits: int = 1 << 20,
                k: int = 4) -> np.ndarray:
    """OR-mergeable Bloom bitmap (uint64 words) over the seen stream.
    Per-block partial bitmaps (m/8 bytes each) repartition(1)-merge; the
    final bitmap is the only thing that reaches the driver."""
    words = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        probes = _url_probes(b.column(url_col).to_pylist(), m_bits, k)
        flat = probes.ravel()
        np.bitwise_or.at(bits, flat // 64,
                         np.uint64(1) << (flat % 64).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = seen_ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1).map_batches(
            lambda t: pa.table({"bits": pa.array(
                [np.bitwise_or.reduce(
                    np.stack([np.frombuffer(x.as_py(), dtype=np.uint64)
                              for x in t.column("bits")])).tobytes()],
                pa.binary())}),
            batch_format="pyarrow", batch_size=None)
    [row] = merged.take_all()
    return np.frombuffer(row["bits"], dtype=np.uint64).copy()


def _test_bloom(bits: np.ndarray, urls: list[str | None], m_bits: int,
                k: int) -> np.ndarray:
    probes = _url_probes(urls, m_bits, k)
    word = bits[probes // 64]
    hit = (word >> (probes % 64).astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=1)


def bloom_unseen(new_ds, seen_ds, *, url_col: str = "url",
                 id_col: str = "doc_id", m_bits: int = 1 << 20, k: int = 4,
                 npartitions: int | None = None):
    """Exact anti-join of ``new_ds`` against ``seen_ds`` urls with a Bloom
    prefilter: negatives stream straight through, positives confirm via a
    tagged-union co-partition on url. Returns (id_col, url) of rows whose
    url appears nowhere in ``seen_ds``."""
    import ray

    from ..util import hash_rollup

    bits = build_bloom(seen_ds, url_col=url_col, m_bits=m_bits, k=k)
    bits_ref = ray.put(bits)

    # The bitmap test runs independently in EACH branch (two streaming
    # passes over new_ds) instead of materializing a tested intermediate:
    # at crawl-frontier scale that intermediate IS the corpus, and the
    # repo rule is to materialize only sketch-size aggregates. The test
    # itself is a cheap vectorized probe against the broadcast bitmap.
    def negatives_only(b: pa.Table, *, bref=bits_ref) -> pa.Table:
        bm = bref if isinstance(bref, np.ndarray) else ray.get(bref)
        pos = _test_bloom(bm, b.column(url_col).to_pylist(), m_bits, k)
        sel = b.filter(pa.array(~pos))
        return pa.table({id_col: sel[id_col], "url": sel[url_col]})

    # definite-unseen fast path: no shuffle
    negatives = new_ds.map_batches(negatives_only, batch_format="pyarrow")

    def tag_new(b: pa.Table, *, bref=bits_ref) -> pa.Table:
        bm = bref if isinstance(bref, np.ndarray) else ray.get(bref)
        pos = _test_bloom(bm, b.column(url_col).to_pylist(), m_bits, k)
        sel = b.filter(pa.array(pos))
        return pa.table({
            "url": sel[url_col],
            id_col: sel[id_col],
            "side": pa.array(np.zeros(sel.num_rows, dtype=np.int8)),
        })

    def tag_seen(b: pa.Table) -> pa.Table:
        return pa.table({
            "url": b[url_col],
            id_col: pa.nulls(b.num_rows, pa.int64()),
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    tagged = new_ds.map_batches(tag_new, batch_format="pyarrow").union(
        seen_ds.map_batches(tag_seen, batch_format="pyarrow"))

    def anti(g: pd.DataFrame) -> pa.Table:
        seen_urls = set(g.loc[g["side"] == 1, "url"])
        cand = g[g["side"] == 0]
        keep = cand[~cand["url"].isin(seen_urls)]
        # Arrow out (not pandas): Ray's block-size estimator np.vectorizes
        # over object-dtype pandas columns and logs errors on empty blocks
        return pa.table({
            id_col: pa.array(keep[id_col].to_numpy(dtype=np.int64),
                             pa.int64()),
            "url": pa.array(keep["url"].tolist(), pa.string()),
        })

    rescued = hash_rollup(tagged, ["url"], anti, npartitions=npartitions)
    return negatives.union(rescued)
