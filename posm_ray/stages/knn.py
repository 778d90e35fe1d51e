"""kNN (haversine, geographic) and ANN (cosine, embeddings).

North-star J7: per-H3-shard kNN with halo replication; plus the exact
brute-force baselines that double as correctness oracles.

Patterns:
- the QUERY set is small and broadcast (ray.put once, read per actor);
  candidates stream through map_batches — no shuffle of the big side;
- per-batch partial top-k (numpy argpartition) -> groupby(query).map_groups
  merges partials: the shuffle carries only Q x k x num_batches rows;
- the sharded variant co-locates candidates by coarse cell and replicates
  each query to its 3x3 halo shards (cells.neighbors), turning global kNN
  into per-shard local work — the scale path when queries are also huge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import cells
from ..geom.kernels import haversine_m

from ..util import default_pool, list_to_matrix

# Geo ranking is done on an INTEGER-quantized distance (whole millimetres,
# floor(dist_m * 1e3)) rather than the raw float64 haversine. Rationale
# (the repo float rule, CLAUDE.md): numpy and DuckDB run different libm
# implementations of sin/asin, which can differ by ~1 ulp — enough to flip
# the rank of a near-tie pair between environments even when the op order
# is identical on both sides. Quantizing collapses any sub-millimetre
# difference into an exact int64 tie that both sides break by neighbor_id
# identically. The residual failure window (a distance within ~1 ulp of a
# millimetre boundary) is audited per fixture by
# tests/test_knn_quantize.py: every distance's d*1e3 fractional part is
# bounded away from the integer boundary, and adjacent-rank gaps exceed
# the quantum, so quantized ranks equal unquantized ranks at every sf.
DIST_SCALE = 1000.0  # quantum = 1 mm

# int64 sentinel for excluded (self) slots in quantized distance matrices
_DIST_INF = np.iinfo(np.int64).max


def quantize_dist_m(d: np.ndarray) -> np.ndarray:
    """floor(dist_m * 1000) as int64 — the rank key (twin:
    ``CAST(FLOOR(dist * 1000.0) AS BIGINT)``)."""
    return np.floor(d * DIST_SCALE).astype(np.int64)


class _PartialTopK:
    """map_batches stage: for each broadcast query point, the k nearest
    candidates within this batch."""

    def __init__(self, q_ref, k: int, id_col: str):
        q = q_ref
        if not isinstance(q, dict):
            import ray

            q = ray.get(q_ref)
        self.qid = q["id"]
        self.qlat = q["lat"]
        self.qlon = q["lon"]
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        clat = batch.column("lat").to_numpy(zero_copy_only=False)
        clon = batch.column("lon").to_numpy(zero_copy_only=False)
        out_q, out_n, out_d = [], [], []
        # vectorized per query over the whole batch (Q small, batch large).
        # NOTE: tie handling must be deterministic IN THE PARTIAL — with
        # many equidistant candidates (e.g. duplicated mega-cell points)
        # argpartition would keep an arbitrary subset and drop tied
        # candidates the final merge should have ranked; lexsort keeps the
        # kk smallest under the same (dist_mm, neighbor_id) order the
        # merge uses. Ranking is on the millimetre-quantized distance
        # (see DIST_SCALE note above) so the rank is libm-independent.
        for i in range(len(self.qid)):
            dq = quantize_dist_m(
                haversine_m(self.qlat[i], self.qlon[i], clat, clon))
            kk = min(self.k, len(dq))
            idx = np.lexsort((cid, dq))[:kk]
            out_q.append(np.full(kk, self.qid[i], dtype=np.int64))
            out_n.append(cid[idx])
            out_d.append(dq[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "dist_mm": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "dist_mm": pa.array(np.concatenate(out_d)),
        })


def _merge_topk(k: int, exclude_self: bool, by: str = "dist_mm",
                ascending: bool = True):
    """Vectorized per-partition top-k merge: ALL queries hashed to this
    partition in one pandas pass (sort -> per-group head -> cumcount rank);
    no per-group python dispatch."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        # deterministic: ties broken by neighbor_id
        g = g.sort_values(["query_id", by, "neighbor_id"],
                          ascending=[True, ascending, True], kind="mergesort")
        g = g.groupby("query_id", sort=False).head(k).reset_index(drop=True)
        g["rank"] = (g.groupby("query_id", sort=False).cumcount() + 1).astype("int64")
        return g

    return fn


def knn_exact(candidates, queries: dict, *, k: int = 5, id_col: str = "doc_id",
              exclude_self: bool = True, concurrency=None):
    """Exact kNN of broadcast ``queries`` {id, lat, lon arrays} against the
    streaming ``candidates`` Dataset (must have id_col, lat, lon)."""
    import ray

    from ..util import hash_rollup

    q_ref = ray.put(queries)
    kwargs = dict(batch_format="pyarrow", batch_size=8192, zero_copy_batch=True,
                  fn_constructor_kwargs={"q_ref": q_ref, "k": k + (1 if exclude_self else 0),
                                         "id_col": id_col},
                  concurrency=concurrency if concurrency is not None else default_pool())
    partial = candidates.map_batches(_PartialTopK, **kwargs)
    return hash_rollup(partial, ["query_id"], _merge_topk(k, exclude_self),
                       npartitions=None)


def knn_sharded(candidates, *, k: int = 5, shard_res: int = 2,
                id_col: str = "doc_id"):
    """All-pairs kNN, sharded: candidates grouped by coarse cell; each point
    also replicated to its 3x3 halo shards as a *candidate*, so every point's
    true neighbors within one shard-width are present locally. Exact for
    neighbors closer than one shard cell (~shard_res width); documented
    partitioning assumption (SURVEY.md J7)."""

    def to_shards(batch: pa.Table) -> pa.Table:
        """Vectorized 3x3 halo explode: all 9 offsets computed batch-wise
        (wrap in longitude, clamp at poles), then per-point dedup of the
        clamp-collapsed shards — no per-row python."""
        pid = batch.column(id_col).to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        home = cells.cell_id(lat, lon, shard_res)
        nx, ny = cells.ncols(shard_res), cells.nrows(shard_res)
        ix, iy = cells.cell_ixy(home)
        n = len(pid)
        shards = np.empty((9, n), dtype=np.int64)
        for off, (dx, dy) in enumerate(
                (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)):
            jx = (ix + dx) % nx
            jy = np.minimum(np.maximum(iy + dy, 0), ny - 1)
            shards[off] = cells.pack(shard_res, jx, jy)
        row = np.tile(np.arange(n, dtype=np.int64), 9)
        flat = shards.ravel()
        # dedupe (point, shard) pairs collapsed by the pole clamp: sort
        # row-major then drop adjacent repeats (per-row sorted-unique, the
        # same order the old per-row np.unique emitted)
        order = np.lexsort((flat, row))
        row, flat = row[order], flat[order]
        keep = np.ones(len(row), dtype=bool)
        keep[1:] = (row[1:] != row[:-1]) | (flat[1:] != flat[:-1])
        row, flat = row[keep], flat[keep]
        return pa.table({
            id_col: pa.array(pid[row], pa.int64()),
            "lat": pa.array(lat[row], pa.float64()),
            "lon": pa.array(lon[row], pa.float64()),
            "shard": pa.array(flat, pa.int64()),
            "home": pa.array(home[row], pa.int64()),
        })

    sharded = candidates.map_batches(to_shards, batch_format="pyarrow")

    def empty_out() -> pd.DataFrame:
        # explicit int64: a bare `{"query_id": []}` frame is float64, and
        # ONE such frame in the concat promotes every column to float64 —
        # the driver value-hashes dtypes, so float 1.0 vs BIGINT 1 was the
        # r3+r4 knn_geo_sharded red (rows matched, hash didn't; the local
        # checker's `==` compare hid it because 1.0 == 1)
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("query_id", "neighbor_id",
                                       "dist_mm", "rank")})

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        frames = [per_shard(g) for _, g in part.groupby("shard", sort=False)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return empty_out()
        return pd.concat(frames, ignore_index=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        """Fully vectorized per-shard kNN: one (Q, N) haversine matrix,
        candidates pre-sorted by id so a row-wise STABLE argsort on the
        millimetre-quantized distance gives the (dist_mm, neighbor_id) tie
        order without a per-query python loop (quantization rationale at
        DIST_SCALE)."""
        shard = g["shard"].iloc[0]
        owners = g[g["home"] == shard]  # points whose home is this shard
        if len(owners) == 0:
            return empty_out()
        order_c = np.argsort(g[id_col].to_numpy(), kind="stable")
        cid = g[id_col].to_numpy()[order_c]
        clat = g["lat"].to_numpy()[order_c]
        clon = g["lon"].to_numpy()[order_c]
        qid = owners[id_col].to_numpy()
        qlat = owners["lat"].to_numpy()
        qlon = owners["lon"].to_numpy()
        dq = quantize_dist_m(haversine_m(qlat[:, None], qlon[:, None],
                                         clat[None, :], clon[None, :]))
        dq[qid[:, None] == cid[None, :]] = _DIST_INF  # exclude self
        kk = min(k, dq.shape[1])
        top = np.argsort(dq, axis=1, kind="stable")[:, :kk]
        rows_q = np.repeat(qid, kk)
        rows_n = cid[top].ravel()
        rows_d = np.take_along_axis(dq, top, axis=1).ravel()
        rows_r = np.tile(np.arange(1, kk + 1, dtype=np.int64), len(qid))
        keep = rows_d != _DIST_INF  # drop padded self-only slots
        return pd.DataFrame({
            "query_id": rows_q[keep], "neighbor_id": rows_n[keep],
            "dist_mm": rows_d[keep], "rank": rows_r[keep]})

    from ..util import hash_rollup

    return hash_rollup(sharded, ["shard"], per_part, npartitions=None)


# ---------------------------------------------------------------------------
# ANN over embeddings
# ---------------------------------------------------------------------------

class _CosinePartialTopK:
    """Brute-force cosine top-k per batch against a broadcast query matrix
    (numpy matmul — the vectorized baseline; IVF/LSH variants in dedup.py
    bucket first)."""

    def __init__(self, q_ref, k: int):
        q = q_ref
        if not isinstance(q, dict):
            import ray

            q = ray.get(q_ref)
        self.qid = q["id"]
        qm = q["mat"].astype(np.float64)
        self.qmat = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = list_to_matrix(batch.column("embedding"), np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        emb = emb / norms
        sims = self.qmat @ emb.T  # (Q, B)
        out_q, out_n, out_s = [], [], []
        for i in range(len(self.qid)):
            s = sims[i]
            kk = min(self.k, len(s))
            # deterministic under cosine ties (exact-duplicate vectors):
            # keep the kk best by (cosine desc, neighbor_id asc), matching
            # the final merge's order — argpartition drops tied candidates
            idx = np.lexsort((vid, -s))[:kk]
            out_q.append(np.full(kk, self.qid[i], dtype=np.int64))
            out_n.append(vid[idx])
            out_s.append(s[idx])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "cosine": pa.array(np.concatenate(out_s)),
        })


def ann_cosine_exact(embeddings, queries: dict, *, k: int = 5,
                     exclude_self: bool = True, concurrency=None):
    """Exact cosine top-k: broadcast query matrix, streamed candidates,
    partial top-k per batch, merge per query."""
    import ray

    q_ref = ray.put(queries)
    kwargs = dict(batch_format="pyarrow", batch_size=4096, zero_copy_batch=True,
                  fn_constructor_kwargs={"q_ref": q_ref,
                                         "k": k + (1 if exclude_self else 0)},
                  concurrency=concurrency if concurrency is not None else default_pool())
    partial = embeddings.map_batches(_CosinePartialTopK, **kwargs)
    from ..util import hash_rollup

    return hash_rollup(
        partial, ["query_id"],
        _merge_topk(k, exclude_self, by="cosine", ascending=False),
        npartitions=None)


def ann_cosine_lsh(embeddings, queries: dict, *, k: int = 5, nplanes: int = 8,
                   ntables: int = 8, seed: int = 42):
    """Multi-table LSH-bucketed ANN (the scale path): ``ntables`` independent
    random-hyperplane signatures bucket both sides; a candidate is scanned iff
    it shares a bucket with the query in ANY table (OR-amplification — recall
    per neighbor ~= 1-(1-p^nplanes)^ntables for per-plane agreement p).
    Approximate; deterministic planes from ``seed``."""
    qmat = queries["mat"].astype(np.float64)
    dim = qmat.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((ntables, dim, nplanes))
    weights = 1 << np.arange(nplanes)

    def signatures(mat: np.ndarray) -> np.ndarray:
        """(n, ntables) int64 bucket ids."""
        bits = np.einsum("nd,tdp->ntp", mat, planes) > 0
        return (bits * weights).sum(axis=2).astype(np.int64)

    qsig = signatures(qmat)
    by_bucket: dict[tuple[int, int], list[int]] = {}
    for i in range(qsig.shape[0]):
        for t in range(ntables):
            by_bucket.setdefault((t, int(qsig[i, t])), []).append(i)

    import ray

    ctx = ray.put({"planes": planes, "qid": queries["id"], "qmat": qmat,
                   "qbuckets": by_bucket, "k": k})

    def per_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(ctx) if not isinstance(ctx, dict) else ctx
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = list_to_matrix(batch.column("embedding"), np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        embn = emb / norms
        pl = c["planes"]
        nt = pl.shape[0]
        sig = (np.einsum("nd,tdp->ntp", emb, pl) > 0)
        sig = (sig * (1 << np.arange(sig.shape[2]))).sum(axis=2).astype(np.int64)
        qmatn = c["qmat"] / np.linalg.norm(c["qmat"], axis=1, keepdims=True)
        # candidate sets per query: union of bucket matches over all tables
        cand: dict[int, np.ndarray] = {}
        for t in range(nt):
            col = sig[:, t]
            for (tt, bucket), qidx in c["qbuckets"].items():
                if tt != t:
                    continue
                mask = col == bucket
                if not mask.any():
                    continue
                rows = np.nonzero(mask)[0]
                for qi in qidx:
                    prev = cand.get(qi)
                    cand[qi] = rows if prev is None else np.union1d(prev, rows)
        out_q, out_n, out_s = [], [], []
        for qi, rows in cand.items():
            s = qmatn[qi] @ embn[rows].T
            kk = min(c["k"] + 1, len(s))
            idx = np.lexsort((vid[rows], -s))[:kk]  # tie-deterministic
            out_q.append(np.full(len(idx), c["qid"][qi], dtype=np.int64))
            out_n.append(vid[rows][idx])
            out_s.append(s[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "cosine": pa.array(np.concatenate(out_s))})

    partial = embeddings.map_batches(per_batch, batch_format="pyarrow")
    from ..util import hash_rollup

    # drop duplicate candidates found via multiple tables before ranking
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["query_id", "neighbor_id"])
        return _merge_topk(k, True, by="cosine", ascending=False)(g)

    return hash_rollup(partial, ["query_id"], merge, npartitions=None)


def _spherical_kmeans(sample: np.ndarray, nlist: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means for IVF coarse centroids: init from
    the first ``nlist`` sample rows, Lloyd iterations with cosine
    assignment; empty clusters keep their previous centroid."""
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cents = x[:nlist].copy()
    for _ in range(iters):
        cents = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(nlist):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)


def ann_cosine_ivf(embeddings, queries: dict, *, k: int = 5, nlist: int = 16,
                   nprobe: int = 4, train_sample: int = 1024,
                   train_iters: int = 10):
    """IVF-style ANN (the second scale path next to LSH): coarse centroids
    trained driver-side on a bounded sample (spherical k-means,
    deterministic init), broadcast; every vector belongs to its nearest
    centroid's inverted list, and each query scans only its ``nprobe``
    nearest lists. Approximate — recall grows with nprobe/nlist ratio.

    ``train_iters=0`` skips Lloyd refinement: centroids are then exactly
    the (normalized) first ``nlist`` sample vectors, which makes the whole
    scan structure (inverted lists, nprobe, ranking) replayable in SQL —
    the driver-checked ``ann_cosine_ivf`` query uses that mode so the
    oracle is exact; refinement quality is pytest territory.

    Scale shape: the centroid matrix is tiny and broadcast once; candidates
    stream through map_batches with a per-batch (assign -> mask -> matmul);
    the only exchange is the partial-top-k merge on query_id."""
    import pyarrow.compute as _pc  # noqa: F401  (parity with siblings)

    import ray

    from ..util import hash_rollup

    sample_tbl = embeddings.limit(train_sample).to_pandas()
    sample = np.asarray(list(sample_tbl["embedding"]), dtype=np.float64)
    cents = _spherical_kmeans(sample, min(nlist, len(sample)),
                              iters=train_iters)

    qmat = queries["mat"].astype(np.float64)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # nprobe nearest lists per query; kind="stable" so equal-cosine
    # centroids keep index order, matching the SQL twin's
    # ORDER BY cosine DESC, ct.c tie-break (repo tie-determinism rule)
    probe = np.argsort(-(qn @ cents.T), axis=1, kind="stable")[:, :nprobe]

    ctx = ray.put({"cents": cents, "qid": queries["id"], "qn": qn,
                   "probe": probe, "k": k})

    def per_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(ctx) if not isinstance(ctx, dict) else ctx
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = list_to_matrix(batch.column("embedding"), np.float64)
        n = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        embn = emb / n
        lists = (embn @ c["cents"].T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(c["qid"])):
            mask = np.isin(lists, c["probe"][qi])
            if not mask.any():
                continue
            s = c["qn"][qi] @ embn[mask].T
            kk = min(c["k"] + 1, len(s))
            idx = np.lexsort((vid[mask], -s))[:kk]  # tie-deterministic
            out_q.append(np.full(len(idx), c["qid"][qi], dtype=np.int64))
            out_n.append(vid[mask][idx])
            out_s.append(s[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "cosine": pa.array(np.concatenate(out_s))})

    partial = embeddings.map_batches(per_batch, batch_format="pyarrow")
    return hash_rollup(partial, ["query_id"],
                       _merge_topk(k, True, by="cosine", ascending=False),
                       npartitions=None)


# integer quantum for the ADC lookup-table weights: floor(dot * 2^20).
# Integer partial scores make the PQ shortlist boundary EXACT across
# engines (BIGINT sums are associative; float sums are not) — the repo's
# integer-scaled-sum rule (relational.py) applied to ANN.
PQ_ADC_SCALE = 1 << 20


def ann_cosine_pq(embeddings, queries: dict, *, k: int = 5, m: int = 8,
                  ksub: int = 16, shortlist: int = 20,
                  codebook: np.ndarray | None = None):
    """Product-quantization ANN (third scale path next to LSH/IVF): split
    the D dims into ``m`` subspaces, quantize every candidate sub-vector to
    its nearest of ``ksub`` codebook entries (L2, lowest code index on
    ties), score candidates with the asymmetric-distance trick — per query
    a tiny (m, ksub) lookup table of INTEGER-quantized sub-dots, candidate
    score = sum of m table entries — take the top-``shortlist`` by
    (score DESC, id ASC), then re-rank the shortlist by EXACT cosine.

    Scale shape: the codebook is m*ksub*(D/m) floats (broadcast once, KB);
    candidates stream through one map_batches (encode -> integer gather ->
    partial top-shortlist) — the 100-TB memory win is that a PQ-encoded
    corpus is m bytes/vector (here 8 vs 256), so a re-scan or a cached
    code table is ~30x smaller than the raw embeddings; the only exchange
    is the per-query merge of shortlist rows. The shortlist boundary is
    integer-exact (see PQ_ADC_SCALE), so the SQL twin
    (vectors.ann_pq_oracle_sql) replays it bit-for-bit; only the final
    within-shortlist cosine rank is float, same contract as the
    LSH/IVF/exact siblings.

    ``codebook=None`` trains nothing: codes are the sub-vectors of the
    first ``ksub`` embeddings (by vec_id) — fully deterministic and SQL
    replayable, the train_iters=0 convention of :func:`ann_cosine_ivf`."""
    import ray

    from ..util import hash_rollup

    qmat = queries["mat"].astype(np.float64)
    dim = qmat.shape[1]
    assert dim % m == 0, (dim, m)
    dsub = dim // m

    if codebook is None:
        head = embeddings.limit(ksub).to_pandas() \
            .sort_values("vec_id").head(ksub)
        base = np.asarray(list(head["embedding"]), dtype=np.float64)
        codebook = base.reshape(len(base), m, dsub) \
            .transpose(1, 0, 2).copy()  # (m, ksub, dsub)

    ctx = ray.put({"qid": np.asarray(queries["id"], dtype=np.int64),
                   "qmat": qmat, "codebook": codebook,
                   "m": m, "ksub": ksub, "dsub": dsub,
                   "R": shortlist, "k": k})

    def per_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(ctx) if not isinstance(ctx, dict) else ctx
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        emb = list_to_matrix(batch.column("embedding"), np.float64)
        cb = c["codebook"]  # (m, ksub, dsub)
        mm, kk, dd = c["m"], cb.shape[1], c["dsub"]
        # per-query integer LUT: floor(scale * <q_sub, code>)
        lut = np.floor(PQ_ADC_SCALE * np.einsum(
            "qsd,scd->qsc", c["qmat"].reshape(-1, mm, dd), cb)) \
            .astype(np.int64)                       # (Q, m, ksub)
        sub = emb.reshape(-1, mm, dd)               # (B, m, dsub)
        # encode: nearest code per (row, subspace); argmin takes the
        # LOWEST code index on exact ties (mirrors the twin's ORDER BY
        # dist, c) — squared L2, monotonic with the twin's list_distance
        d2 = ((sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2)                   # (B, m)
        # ADC gather: score[q, b] = sum_s lut[q, s, codes[b, s]]
        scores = lut[:, np.arange(mm)[None, :], codes].sum(axis=2)  # (Q, B)
        qn = c["qmat"] / np.maximum(
            np.linalg.norm(c["qmat"], axis=1, keepdims=True), 1e-12)
        nrm = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        out_q, out_n, out_sc, out_cos = [], [], [], []
        for qi in range(len(c["qid"])):
            keep = vid != c["qid"][qi]              # exclude self
            if not keep.any():
                continue
            s = scores[qi][keep]
            rr = min(c["R"], len(s))
            idx = np.lexsort((vid[keep], -s))[:rr]  # tie-deterministic
            cand = np.nonzero(keep)[0][idx]
            cos = qn[qi] @ (emb[cand] / nrm[cand]).T
            out_q.append(np.full(rr, c["qid"][qi], dtype=np.int64))
            out_n.append(vid[cand])
            out_sc.append(s[idx])
            out_cos.append(cos)
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "score": pa.array(np.concatenate(out_sc)),
                         "cosine": pa.array(np.concatenate(out_cos))})

    partial = embeddings.map_batches(per_batch, batch_format="pyarrow",
                                     batch_size=4096, zero_copy_batch=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # global shortlist on the INTEGER score, then exact-cosine rerank
        g = g.sort_values(["query_id", "score", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("query_id", sort=False).head(shortlist)
        g = g.sort_values(["query_id", "cosine", "neighbor_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("query_id", sort=False).head(k).reset_index(drop=True)
        g["rank"] = (g.groupby("query_id", sort=False).cumcount() + 1) \
            .astype("int64")
        return g[["query_id", "neighbor_id", "rank"]]

    return hash_rollup(partial, ["query_id"], merge, npartitions=None)


# ---------------------------------------------------------------------------
# radius join (geofencing)
# ---------------------------------------------------------------------------

class _RadiusFilter:
    """map_batches stage: all (query, candidate) pairs within radius_m.
    Queries are the broadcast small side (ray.put once, read per actor);
    the candidate stream never shuffles — this is the geofencing analogue
    of the PIP broadcast join. For a LARGE query set, bucket queries by
    coarse cell and prefilter candidates by the covering of each query's
    radius bbox (cells.covering), exactly like the PIP grid index; at the
    Q<=hundreds scale the dense (Q, N) haversine matrix per batch is
    faster than any index."""

    def __init__(self, q_ref, radius_m: float, id_col: str):
        q = q_ref
        if not isinstance(q, dict):
            import ray

            q = ray.get(q_ref)
        self.qid = np.asarray(q["id"], dtype=np.int64)
        self.qlat = np.asarray(q["lat"], dtype=np.float64)
        self.qlon = np.asarray(q["lon"], dtype=np.float64)
        # membership compare on quantized millimetres (DIST_SCALE note):
        # floor(d*1e3) <= radius_m*1e3 — libm-independent away from the
        # (audited) 1-mm boundary band around the radius
        self.radius_mm = int(round(radius_m * DIST_SCALE))
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        clat = batch.column("lat").to_numpy(zero_copy_only=False)
        clon = batch.column("lon").to_numpy(zero_copy_only=False)
        dq = quantize_dist_m(haversine_m(self.qlat[:, None],
                                         self.qlon[:, None],
                                         clat[None, :], clon[None, :]))
        qi, ci = np.nonzero(dq <= self.radius_mm)
        keep = self.qid[qi] != cid[ci]  # exclude self like knn
        return pa.table({
            "query_id": pa.array(self.qid[qi][keep]),
            self.id_col: pa.array(cid[ci][keep]),
        })


# degrees of latitude per metre on the R=6371000 sphere (meridian arc is
# exact: deg = m * 180 / (pi * R)); 1.001 safety factor keeps the bbox a
# strict superset under float error — over-covering is always safe because
# membership is re-verified with the exact haversine.
_DEG_PER_M = 180.0 / (np.pi * 6371000.0) * 1.001


def _radius_query_buckets(queries: dict, radius_m: float, cell_res: int):
    """Driver-side (small-Q-side) index for the bucketed radius join:
    cell id -> int array of query indices whose radius disc can intersect
    that cell. Each query's disc is bounded by a conservative lat/lon bbox
    (exact meridian bound for latitude; parallel bound divided by the
    worst-case cos(lat) inside the lat band for longitude; full longitude
    range near the poles), covered with cells.covering (antimeridian-wrap
    aware)."""
    qlat = np.asarray(queries["lat"], dtype=np.float64)
    qlon = np.asarray(queries["lon"], dtype=np.float64)
    dlat = radius_m * _DEG_PER_M
    # longitude bound derived FROM the haversine itself: for any point p
    # in the disc, hav(dlam) <= hav(r/R) / (cos(lat_q) cos(lat_p)), so
    # dlam <= 2 asin(sin(r/2R) / cos(worst lat in the band)) — provably a
    # superset (a linear dlat/cos bound UNDER-covers at high latitude:
    # the asin's cubic term grows as 1/cos^3).
    s = np.sin(radius_m / (2.0 * 6371000.0))
    buckets: dict[int, list[int]] = {}
    for i in range(len(qlat)):
        lat0 = max(qlat[i] - dlat, -90.0)
        lat1 = min(qlat[i] + dlat, 90.0)
        worst = max(abs(lat0), abs(lat1))
        cosmin = np.cos(np.radians(min(worst, 90.0)))
        if worst >= 89.9 or s / max(cosmin, 1e-12) >= 0.999:
            lon0, lon1 = -180.0, 180.0
        else:
            dlon = np.degrees(2.0 * np.arcsin(s / cosmin)) * 1.001
            if 2.0 * dlon >= 360.0:
                lon0, lon1 = -180.0, 180.0
            else:
                lon0, lon1 = qlon[i] - dlon, qlon[i] + dlon
                # normalize into [-180, 180] so a cross-antimeridian box
                # takes the covering's split path instead of clamping flat
                if lon0 < -180.0:
                    lon0 += 360.0
                if lon1 > 180.0:
                    lon1 -= 360.0
        for c in cells.covering(lon0, lat0, lon1, lat1, cell_res):
            buckets.setdefault(int(c), []).append(i)
    return {c: np.asarray(v, dtype=np.int64) for c, v in buckets.items()}


class _RadiusCellFilter:
    """Bucketed radius join stage (the LARGE-Q scale path): instead of the
    dense (Q, N) matrix per batch, candidates group by their coarse cell
    and each cell is scanned only against the queries whose radius-disc
    covering includes it (broadcast dict built once driver-side). Exact —
    the covering is a superset prefilter and membership is the same
    quantized haversine compare as _RadiusFilter."""

    def __init__(self, q_ref, radius_m: float, id_col: str, cell_res: int):
        q = q_ref
        if not isinstance(q, dict):
            import ray

            q = ray.get(q_ref)
        self.qid = np.asarray(q["id"], dtype=np.int64)
        self.qlat = np.asarray(q["lat"], dtype=np.float64)
        self.qlon = np.asarray(q["lon"], dtype=np.float64)
        self.buckets = q["buckets"]
        self.radius_mm = int(round(radius_m * DIST_SCALE))
        self.id_col = id_col
        self.cell_res = cell_res

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        clat = batch.column("lat").to_numpy(zero_copy_only=False)
        clon = batch.column("lon").to_numpy(zero_copy_only=False)
        ccell = cells.cell_id(clat, clon, self.cell_res)
        order = np.argsort(ccell, kind="stable")
        uc, starts = np.unique(ccell[order], return_index=True)
        out_q, out_c = [], []
        bounds = np.append(starts, len(order))
        for j in range(len(uc)):
            qidx = self.buckets.get(int(uc[j]))
            if qidx is None:
                continue
            rows = order[bounds[j]:bounds[j + 1]]
            dq = quantize_dist_m(haversine_m(
                self.qlat[qidx][:, None], self.qlon[qidx][:, None],
                clat[rows][None, :], clon[rows][None, :]))
            qi, ci = np.nonzero(dq <= self.radius_mm)
            a = self.qid[qidx][qi]
            b = cid[rows][ci]
            keep = a != b
            out_q.append(a[keep])
            out_c.append(b[keep])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_c)),
        })


def radius_join_bucketed(ds, queries: dict, radius_m: float, *,
                         id_col: str = "doc_id", cell_res: int = 2,
                         concurrency=None):
    """Exact geofencing radius join, bucketed — the documented large-Q
    scale path of :func:`radius_join` made real: per-batch work is
    O(sum over present cells of |q_cell| x |cand_cell|) instead of the
    dense O(Q x N) matmul, so a query set of millions only costs where
    discs actually overlap candidates. Output is identical to
    :func:`radius_join` (pytest-pinned): the covering is a conservative
    superset and every pair is re-verified with the same quantized
    haversine. ``cell_res`` trades prefilter sharpness against the size
    of the broadcast bucket dict (cells must be >= the radius scale to
    keep per-query coverings small)."""
    import ray

    payload = dict(queries)
    payload["buckets"] = _radius_query_buckets(queries, radius_m, cell_res)
    ref = ray.put(payload)
    return ds.map_batches(
        _RadiusCellFilter,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        fn_constructor_kwargs={"q_ref": ref, "radius_m": radius_m,
                               "id_col": id_col, "cell_res": cell_res},
        concurrency=concurrency if concurrency is not None else default_pool(),
    )


def radius_join(ds, queries: dict, radius_m: float, *, id_col: str = "doc_id",
                concurrency=None):
    """(query_id, doc_id) pairs for every candidate within ``radius_m`` of
    a query point — exact haversine geofencing with zero shuffles.

    Oracle note: membership compares the millimetre-quantized distance
    (``floor(d*1e3) <= radius_m*1e3``, twin identical), so a libm 1-ulp
    divergence can only matter for a distance within ~1 ulp of a
    millimetre boundary at the radius; tests/test_knn_quantize.py audits
    that every fixture distance stays >1 mm away from the radius."""
    import ray

    ref = ray.put(queries)  # broadcast once; actors ray.get in __init__
    return ds.map_batches(
        _RadiusFilter,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        fn_constructor_kwargs={"q_ref": ref, "radius_m": radius_m,
                               "id_col": id_col},
        concurrency=concurrency if concurrency is not None else default_pool(),
    )
