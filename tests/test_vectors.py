"""Embedding-vector pipelines (vectors.py) + n-gram Jaccard dedup."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


class TestEmbeddingDups:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import vectors

        got = vectors.embedding_dups(SF).to_pandas()
        want = _con().execute(vectors.EMBEDDING_DUPS_SQL).df()
        g = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
        w = set(map(tuple, want[["a", "b"]].itertuples(index=False)))
        assert g == w and len(g) > 0

    def test_injected_pairs_found(self, ray_session):
        """Every exact-dup injection (vec_id, vec_id+1M) must be a pair."""
        from posm_ray.pipelines import vectors

        got = vectors.embedding_dups(SF).to_pandas()
        pairs = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
        vid = _con().execute(
            f"SELECT vec_id FROM embeddings WHERE vec_id % "
            f"{vectors.DUP_EXACT_MOD} = 0").df()["vec_id"]
        for v in vid:
            assert (int(v), int(v) + 1_000_000) in pairs

    def test_threshold_margin(self):
        """Decision stability: no cosine within 0.02 of the threshold, so
        float32 (SQL) vs float64 (numpy) can't disagree on membership."""
        from posm_ray.pipelines import vectors

        ids, mats = vectors._noisy_matrix(SF)
        m = mats.astype(np.float64)
        n = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = n @ n.T
        iu = np.triu_indices(len(ids), k=1)
        vals = cos[iu]
        near = np.abs(vals - vectors.DUP_COS_THRESHOLD) < 0.02
        assert not near.any()


class TestAnnLsh:
    def test_recall_vs_exact(self, ray_session):
        """LSH top-1 must recover the exact top-1 for most queries (the
        injected structure is absent here — plain corpus, recall >= 0.7)."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from posm_ray.pipelines import vectors
        from posm_ray.stages import knn

        head = pq.read_table(f"{SF}/embeddings.parquet").slice(0, 16)
        queries = {"id": head["vec_id"].to_numpy(),
                   "mat": np.asarray(head["embedding"].to_pylist(),
                                     dtype=np.float64)}
        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        exact = knn.ann_cosine_exact(emb, queries, k=1).to_pandas()
        approx = vectors.ann_lsh(SF, k=1, nplanes=4, ntables=12).to_pandas()
        e1 = dict(zip(exact["query_id"], exact["neighbor_id"]))
        a1 = dict(zip(approx["query_id"], approx["neighbor_id"]))
        hits = sum(1 for q in e1 if a1.get(q) == e1[q])
        assert hits / len(e1) >= 0.7


class TestNgramJaccard:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.ngram_jaccard(SF).to_pandas()
        want = _con().execute(textops.NGRAM_JACCARD_SQL).df()
        cols = ["a", "b", "jaccard"]
        g = got[cols].sort_values(["a", "b"]).reset_index(drop=True)
        w = want[cols].sort_values(["a", "b"]).reset_index(drop=True)
        assert len(g) == len(w) > 0
        assert (g["a"].to_numpy() == w["a"].to_numpy()).all()
        assert (g["b"].to_numpy() == w["b"].to_numpy()).all()
        # identical IEEE division of identical ints -> bitwise equal
        assert (g["jaccard"].to_numpy() == w["jaccard"].to_numpy()).all()

    def test_near_dups_score_high(self, ray_session):
        """Injected near-dups (suffix append) must pass the threshold."""
        from posm_ray.pipelines import textops

        got = textops.ngram_jaccard(SF).to_pandas()
        near = got[(got["b"] - got["a"]) == 2_000_000]
        assert len(near) > 0
        assert (near["jaccard"] > 0.6).all()
        assert near["jaccard"].median() > 0.85


class TestAnnIvf:
    def test_recall_vs_exact(self, ray_session):
        """IVF top-1 with nprobe=8/nlist=16 must recover most exact top-1s."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from posm_ray.pipelines import vectors
        from posm_ray.stages import knn

        head = pq.read_table(f"{SF}/embeddings.parquet").slice(0, 16)
        queries = {"id": head["vec_id"].to_numpy(),
                   "mat": np.asarray(head["embedding"].to_pylist(),
                                     dtype=np.float64)}
        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        exact = knn.ann_cosine_exact(emb, queries, k=1).to_pandas()
        approx = vectors.ann_ivf(SF, k=1, nlist=16, nprobe=8).to_pandas()
        e1 = dict(zip(exact["query_id"], exact["neighbor_id"]))
        a1 = dict(zip(approx["query_id"], approx["neighbor_id"]))
        hits = sum(1 for q in e1 if a1.get(q) == e1[q])
        assert hits / len(e1) >= 0.6

    def test_deterministic(self, ray_session):
        from posm_ray.pipelines import vectors

        a = vectors.ann_ivf(SF, k=3).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        b = vectors.ann_ivf(SF, k=3).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b)


class TestAnnPq:
    def test_matches_oracle(self, ray_session):
        """The integer-exact shortlist + rerank replays bit-for-bit in
        DuckDB (the driver contract, pinned here at sf0.001)."""
        from posm_ray.pipelines import vectors

        got = vectors.ann_pq(SF).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        want = _con().execute(vectors.ann_pq_oracle_sql()).df() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert len(got) == len(want) > 0
        for c in ("query_id", "neighbor_id", "rank"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_recall_vs_exact(self, ray_session):
        """PQ top-1 (8 subspaces x 16 codes, shortlist 20, exact rerank)
        must recover most exact top-1s on the plain corpus."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from posm_ray.pipelines import vectors
        from posm_ray.stages import knn

        head = pq.read_table(f"{SF}/embeddings.parquet").slice(0, 16)
        queries = {"id": head["vec_id"].to_numpy(),
                   "mat": np.asarray(head["embedding"].to_pylist(),
                                     dtype=np.float64)}
        emb = rd.read_parquet(f"{SF}/embeddings.parquet")
        exact = knn.ann_cosine_exact(emb, queries, k=1).to_pandas()
        approx = vectors.ann_pq(SF, k=1).to_pandas()
        e1 = dict(zip(exact["query_id"], exact["neighbor_id"]))
        a1 = dict(zip(approx["query_id"], approx["neighbor_id"]))
        hits = sum(1 for q in e1 if a1.get(q) == e1[q])
        assert hits / len(e1) >= 0.6

    def test_deterministic(self, ray_session):
        from posm_ray.pipelines import vectors

        a = vectors.ann_pq(SF, k=3).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        b = vectors.ann_pq(SF, k=3).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b)


class TestKnnSharded:
    def test_agrees_with_exact_within_halo(self, ray_session):
        """knn_sharded is exact for neighbors within one shard-cell width
        (3x3 halo, SURVEY J7). Verify every sharded neighbor list equals the
        brute-force list whenever the true k-th neighbor lies within one
        shard cell of the query."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from posm_ray import cells
        from posm_ray.geom.kernels import haversine_m
        from posm_ray.sources import synth
        from posm_ray.stages import knn

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        did = t["doc_id"].to_numpy()[:300]
        lat, lon = synth.derive_lat(did), synth.derive_lon(did)
        pts = rd.from_arrow(__import__("pyarrow").table({
            "doc_id": did, "lat": lat, "lon": lon}))
        shard_res = 2
        out = knn.knn_sharded(pts, k=3, shard_res=shard_res).to_pandas()
        # dtype regression (r3+r4 driver red): an empty float64 frame in
        # the per-shard concat used to upcast EVERY column to float64 —
        # the driver value-hashes dtypes, so int64 must survive end-to-end
        for c in ("query_id", "neighbor_id", "dist_mm", "rank"):
            assert out[c].dtype == np.int64, (c, out[c].dtype)
        by_q = {q: g.sort_values("rank")["neighbor_id"].tolist()
                for q, g in out.groupby("query_id")}
        width_deg = cells.cell_width_deg(shard_res)
        checked = 0
        for i in range(0, len(did), 5):
            dq = knn.quantize_dist_m(haversine_m(lat[i], lon[i], lat, lon))
            dq[i] = np.iinfo(np.int64).max
            order = np.lexsort((did, dq))[:3]
            # assumption gate: true neighbors within one shard cell (deg)
            if max(abs(lat[order] - lat[i]).max(),
                   abs(lon[order] - lon[i]).max()) < width_deg * 0.9:
                assert by_q.get(int(did[i])) == [int(x) for x in did[order]]
                checked += 1
        assert checked >= 5


class TestHllSketch:
    def test_estimates_within_error(self, ray_session):
        """HLL per-cell distinct estimates land within ~3 sigma (40% at 64
        registers) of the exact counts from tile_rollup, and the total-corpus
        relative error is much tighter."""
        from posm_ray.pipelines import flagship
        from posm_ray.stages import tiles as ti

        jr = flagship.join_rows(SF, slim=True)
        exact = ti.tile_rollup(jr).to_pandas().set_index("cell")
        jr2 = flagship.join_rows(SF, slim=True)
        approx = ti.approx_distinct_domains(jr2).to_pandas().set_index("cell")
        j = exact.join(approx, how="inner")
        assert len(j) == len(exact) == len(approx)
        rel = (j["approx_distinct_domains"] - j["distinct_domains"]).abs() \
            / j["distinct_domains"].clip(lower=1)
        assert (rel <= 0.4).mean() >= 0.95
        tot_rel = abs(j["approx_distinct_domains"].sum()
                      - j["distinct_domains"].sum()) / j["distinct_domains"].sum()
        assert tot_rel <= 0.15

    def test_deterministic(self, ray_session):
        from posm_ray.pipelines import flagship
        from posm_ray.stages import tiles as ti

        a = ti.approx_distinct_domains(flagship.join_rows(SF, slim=True)) \
            .to_pandas().sort_values("cell").reset_index(drop=True)
        b = ti.approx_distinct_domains(flagship.join_rows(SF, slim=True)) \
            .to_pandas().sort_values("cell").reset_index(drop=True)
        assert a.equals(b)


class TestCellMajorityLabel:
    def test_majority_matches_pandas_rebuild(self, ray_session):
        import pandas as pd

        from posm_ray.pipelines import flagship, vectors

        out = vectors.cell_majority_label("/root/testdata/sf0.001") \
            .to_pandas().set_index("cell")
        jr = flagship.join_rows("/root/testdata/sf0.001",
                                slim=True).to_pandas()
        emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                              columns=["vec_id", "label"])
        j = jr.merge(emb, left_on="doc_id", right_on="vec_id")
        c = j.groupby(["cell_r7", "label"]).size().reset_index(name="n")
        c = c.sort_values(["cell_r7", "n", "label"],
                          ascending=[True, False, True])
        want = c.drop_duplicates("cell_r7").set_index("cell_r7")
        assert len(out) == len(want)
        for cell, row in want.iterrows():
            assert out.loc[cell, "majority_label"] == row["label"]
            assert out.loc[cell, "n_docs"] == row["n"]


class TestKmeans:
    def test_matches_sql_twin_and_balances(self, ray_session):
        import duckdb

        from posm_ray.pipelines import vectors

        sf = "/root/testdata/sf0.001"
        got = vectors.kmeans_embeddings(sf).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf}/embeddings.parquet')")
        want = con.execute(vectors.kmeans_embeddings_sql()).df() \
            .sort_values("vec_id").reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["cluster"].to_numpy() == want["cluster"].to_numpy()).all()
        sizes = got.groupby("cluster").size()
        assert len(sizes) == vectors.KMEANS_K  # no empty final cluster
        assert sizes.min() > 0

    def test_iteration_improves_inertia(self, ray_session):
        """More Lloyd's iterations can only lower (never raise) the exact
        integer inertia — pins that the update step actually descends."""
        import numpy as np
        import pandas as pd

        from posm_ray.pipelines import vectors

        sf = "/root/testdata/sf0.001"
        ints = vectors._int_embeddings(sf).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        v = np.stack([np.asarray(x, dtype=np.int64) for x in ints["v"]])

        def inertia(iters):
            a = vectors.kmeans_embeddings(sf, iters=iters).to_pandas() \
                .sort_values("vec_id").reset_index(drop=True)
            tot = 0
            for c, sub in a.groupby("cluster"):
                pts = v[sub.index.to_numpy()]
                cen = pts.mean(axis=0)
                tot += ((pts - cen) ** 2).sum()
            return tot

        assert inertia(3) <= inertia(1)


class TestNoisyEmbeddingsSmallBlocks:
    """Regression for the round-4 driver crash (VERDICT r4 #1): the driver
    harness reads 8-row blocks, so _inject regularly sees a batch with NO
    vec_id % 13/17 == 0 row; the empty filter used to lose the list width
    ((0, 0) matrix) and _flat_list_col's step-0 arange raised
    ZeroDivisionError, killing semantic_dedup / embedding_dups /
    embedding_dups_lsh."""

    def test_inject_empty_filter_pure_arrow(self):
        """No Ray needed: an 8-row batch with no divisible vec_id must
        round-trip through _inject (both eps paths) with the input schema."""
        import pyarrow as pa

        from posm_ray.pipelines import vectors

        emb = [[0.1] * 4, [0.2] * 4] * 4
        t = pa.table({
            "vec_id": pa.array(list(range(8, 16)), pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
        })
        for mod, eps in [(17, vectors.NEAR_EPS), (13, 0.0)]:
            # vec_ids 8..15 contain 13 multiples? 13 yes — drop it for the
            # truly-empty case
            t2 = t.filter(pa.compute.not_equal(t["vec_id"], 13))
            out = vectors._inject(t2, mod, 1_000_000, eps)
            if mod == 17:
                assert out.num_rows == 0
                assert out.schema.equals(t2.schema)
        full = vectors._explode(t)
        # 8 base rows + one %13 row (13) + no %17 rows
        assert full.num_rows == 9
        assert full.schema.field("embedding").type.equals(
            t.schema.field("embedding").type)

    def test_list_to_matrix_empty_preserves_fixed_width(self):
        import pyarrow as pa

        from posm_ray.util import list_to_matrix

        col = pa.array([], pa.list_(pa.float32(), 4))
        m = list_to_matrix(col, np.float32)
        assert m.shape == (0, 4)
        var = pa.array([], pa.list_(pa.float32()))
        assert list_to_matrix(var, np.float32).shape == (0, 0)

    def test_explode_over_8_row_blocks_matches_sql(self, ray_session):
        """Map the explode over driver-sized blocks and pin counts + ids
        against the SQL twin — the exact failing shape from r4."""
        import ray.data as rd

        from posm_ray.pipelines import vectors

        ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        out = ds.map_batches(vectors._explode, batch_format="pyarrow",
                             batch_size=8).to_pandas()
        want = _con().execute(vectors.NOISY_EMBEDDINGS_SQL).df()
        assert len(out) == len(want)
        assert sorted(out["vec_id"]) == sorted(want["vec_id"])
