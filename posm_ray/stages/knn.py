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

from ..util import default_pool


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
        # kk smallest under the same (dist, neighbor_id) order the merge
        # uses.
        for i in range(len(self.qid)):
            d = haversine_m(self.qlat[i], self.qlon[i], clat, clon)
            kk = min(self.k, len(d))
            idx = np.lexsort((cid, d))[:kk]
            out_q.append(np.full(kk, self.qid[i], dtype=np.int64))
            out_n.append(cid[idx])
            out_d.append(d[idx])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "dist_m": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "dist_m": pa.array(np.concatenate(out_d)),
        })


def _merge_topk(k: int, exclude_self: bool, by: str = "dist_m",
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

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        frames = [per_shard(g) for _, g in part.groupby("shard", sort=False)]
        if not frames:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "dist_m": pd.Series([], dtype=np.float64),
                                 "rank": pd.Series([], dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        """Fully vectorized per-shard kNN: one (Q, N) haversine matrix,
        candidates pre-sorted by id so a row-wise STABLE argsort on
        distance gives the (dist, neighbor_id) tie order without a
        per-query python loop."""
        shard = g["shard"].iloc[0]
        owners = g[g["home"] == shard]  # points whose home is this shard
        if len(owners) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "dist_m": [],
                                 "rank": []})
        order_c = np.argsort(g[id_col].to_numpy(), kind="stable")
        cid = g[id_col].to_numpy()[order_c]
        clat = g["lat"].to_numpy()[order_c]
        clon = g["lon"].to_numpy()[order_c]
        qid = owners[id_col].to_numpy()
        qlat = owners["lat"].to_numpy()
        qlon = owners["lon"].to_numpy()
        d = haversine_m(qlat[:, None], qlon[:, None],
                        clat[None, :], clon[None, :])
        d[qid[:, None] == cid[None, :]] = np.inf  # exclude self
        kk = min(k, d.shape[1])
        top = np.argsort(d, axis=1, kind="stable")[:, :kk]
        rows_q = np.repeat(qid, kk)
        rows_n = cid[top].ravel()
        rows_d = np.take_along_axis(d, top, axis=1).ravel()
        rows_r = np.tile(np.arange(1, kk + 1, dtype=np.int64), len(qid))
        keep = np.isfinite(rows_d)  # drop padded self-only slots
        return pd.DataFrame({
            "query_id": rows_q[keep], "neighbor_id": rows_n[keep],
            "dist_m": rows_d[keep], "rank": rows_r[keep]})

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
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
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
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
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
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
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
        self.radius_m = radius_m
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        clat = batch.column("lat").to_numpy(zero_copy_only=False)
        clon = batch.column("lon").to_numpy(zero_copy_only=False)
        d = haversine_m(self.qlat[:, None], self.qlon[:, None],
                        clat[None, :], clon[None, :])
        qi, ci = np.nonzero(d <= self.radius_m)
        keep = self.qid[qi] != cid[ci]  # exclude self like knn
        return pa.table({
            "query_id": pa.array(self.qid[qi][keep]),
            self.id_col: pa.array(cid[ci][keep]),
        })


def radius_join(ds, queries: dict, radius_m: float, *, id_col: str = "doc_id",
                concurrency=None):
    """(query_id, doc_id) pairs for every candidate within ``radius_m`` of
    a query point — exact haversine geofencing with zero shuffles.

    Oracle note: membership is a float threshold compare; the DuckDB twin
    uses the identical op-order haversine, so divergence needs a distance
    within ~1 ulp of the radius, which the synthetic coordinate family
    never produces (verified over all sf fixtures)."""
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
