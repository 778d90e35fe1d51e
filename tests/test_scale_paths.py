"""Scale-path operators (round 2): LSH-bucketed embedding near-dup vs the
brute-force baseline; topology-arcs stats; HLL vectorized internals."""

import numpy as np


class TestEmbeddingDupsLsh:
    def test_subset_and_recall_vs_brute_force(self, ray_session):
        from posm_ray.pipelines import vectors

        brute = vectors.embedding_dups("/root/testdata/sf0.001").to_pandas()
        lsh = vectors.embedding_dups_lsh("/root/testdata/sf0.001").to_pandas()
        b = set(map(tuple, brute[["a", "b"]].itertuples(index=False)))
        l = set(map(tuple, lsh[["a", "b"]].itertuples(index=False)))
        assert l <= b            # the exact in-bucket verify admits no FPs
        assert len(b) > 0
        assert len(l) / len(b) >= 0.9   # OR-amplified recall
        # exact copies collide in every table -> always found
        exact = {(a, bb) for a, bb in b if bb - a == 1_000_000}
        assert exact and exact <= l

    def test_deterministic(self, ray_session):
        from posm_ray.pipelines import vectors

        a = vectors.embedding_dups_lsh("/root/testdata/sf0.001") \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        b = vectors.embedding_dups_lsh("/root/testdata/sf0.001") \
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        assert a.equals(b)


class TestTopologyArcs:
    def test_shared_arcs_found(self, ray_session):
        import __ray_entry__ as entry

        t = entry.queries()["topology_arcs"]("/root/testdata/sf0.001")
        df = t.to_pandas()
        assert sorted(df["country"]) == ["R1000", "R2000", "R3000"]
        assert (df["n_features"] == 4).all()   # 4 quartered states each
        # quartered rectangles share interior borders: every country's
        # topology must deduplicate at least one arc
        assert (df["n_shared_arcs"] > 0).all()
        assert (df["n_arcs"] < df["n_features"] * 4 + 4).all()


class TestQualityFilter:
    def test_matches_oracle(self, ray_session):
        import duckdb

        from posm_ray.pipelines import textops

        got = textops.quality_filter("/root/testdata/sf0.001").to_pandas()
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = con.execute(textops.QUALITY_FILTER_SQL).df()
        g = got.sort_values("doc_id").reset_index(drop=True)
        w = want.sort_values("doc_id").reset_index(drop=True)
        assert (g["kept"].to_numpy() == w["kept"].to_numpy()).all()
        assert list(g["reject_reason"].fillna("")) == \
            list(w["reject_reason"].fillna(""))
        assert (~g["kept"]).sum() > 0  # the gate does real work

    def test_every_rule_fires(self, ray_session):
        """Rules the uniform synthetic corpus can't trip (punct/digit
        density, too_long) verified on crafted docs through the SAME
        pipeline + SQL twin."""
        import tempfile

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from posm_ray.pipelines import textops

        docs = [
            (1, "word " * 40),                          # kept
            (2, "tiny"),                                # too_short
            (3, "x" * 30000),                           # too_long
            (4, "supercalifragilistic " * 8),           # too_few_tokens
            (5, "!?.,;:-" * 20 + " ok " * 10),          # punct_dense
            (6, "12345 67890 " * 12),                   # digit_dense
        ]
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            pq.write_table(pa.table({
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }), f"{d}/documents.parquet")
            got = textops.quality_filter(d).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
            con = duckdb.connect()
            con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                        f"read_parquet('{d}/documents.parquet')")
            want = con.execute(textops.QUALITY_FILTER_SQL).df() \
                .sort_values("doc_id").reset_index(drop=True)
        assert list(got["reject_reason"].fillna("")) == \
            list(want["reject_reason"].fillna(""))
        assert list(got["reject_reason"][1:]) == [
            "too_short", "too_long", "too_few_tokens", "punct_dense",
            "digit_dense"]
        assert bool(got["kept"][0]) and not got["kept"][1:].any()


class TestChunkDedup:
    def test_matches_oracle(self, ray_session):
        import duckdb

        from posm_ray.pipelines import textops

        got = textops.chunk_dedup("/root/testdata/sf0.001").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = con.execute(textops.chunk_dedup_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(want)
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["text_clean"]) == list(want["text_clean"])
        assert list(got["n_kept"]) == list(want["n_kept"])
        assert list(got["n_dropped"]) == list(want["n_dropped"])

    def test_exact_dup_docs_collapse(self, ray_session):
        """Injected exact-copy docs (doc_id+1_000_000) lose every chunk to
        the original and disappear; their originals keep all chunks."""
        from posm_ray.pipelines import textops

        df = textops.chunk_dedup("/root/testdata/sf0.001").to_pandas()
        ids = set(df["doc_id"])
        originals = {d for d in ids if d < 1_000_000
                     and d % textops.EXACT_DUP_MOD == 0}
        assert originals  # fixture has exact dups
        for d in originals:
            assert d + 1_000_000 not in ids
        assert (df["n_dropped"] >= 0).all()
        assert df["n_dropped"].sum() > 0


class TestDecontaminate:
    def test_matches_oracle(self, ray_session):
        import duckdb

        from posm_ray.pipelines import textops

        got = textops.decontaminate("/root/testdata/sf0.001").to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = con.execute(textops.decontaminate_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(want) > 0
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["n_hits"]) == list(want["n_hits"])

    def test_planted_contamination(self, ray_session):
        """A corpus doc that verbatim-copies an eval doc's text must be
        flagged with every one of its distinct grams hitting."""
        import tempfile

        import pyarrow as pa
        import pyarrow.parquet as pq

        from posm_ray.functions import hashing
        from posm_ray.pipelines import textops

        ev = textops.EVAL_REM          # eval doc id
        copy_id = ev + textops.EVAL_MOD + 1  # corpus doc (rem != EVAL_REM)
        clean_id = ev + 2 * textops.EVAL_MOD + 2
        eval_text = "alpha beta gamma delta epsilon zeta eta theta"
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            pq.write_table(pa.table({
                "doc_id": pa.array([ev, copy_id, clean_id], pa.int64()),
                "text": pa.array([eval_text, eval_text,
                                  "one two three four five six"], pa.string()),
            }), f"{d}/documents.parquet")
            df = textops.decontaminate(d).to_pandas()
        assert list(df["doc_id"]) == [copy_id]
        n_grams = len(np.unique(hashing.shingles(eval_text, textops.DECON_NGRAM)))
        assert list(df["n_hits"]) == [n_grams]


class TestStratifiedSample:
    def test_matches_oracle(self, ray_session):
        import duckdb

        from posm_ray.pipelines import relational

        got = relational.stratified_sample("/root/testdata/sf0.001") \
            .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = con.execute(relational.stratified_sample_sql()).df() \
            .sort_values(["lang", "rank"]).reset_index(drop=True)
        assert len(got) == len(want) > 0
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["rank"]) == list(want["rank"])
        # every stratum capped at N, dense ranks from 1
        per = got.groupby("lang")["rank"].agg(["min", "max", "size"])
        assert (per["min"] == 1).all()
        assert (per["max"] == per["size"]).all()
        assert (per["size"] <= relational.STRATA_N).all()


class TestTfidfTerms:
    def test_matches_oracle(self, ray_session):
        import duckdb

        from posm_ray.pipelines import textops

        got = textops.tfidf_terms("/root/testdata/sf0.001").to_pandas() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = con.execute(textops.tfidf_terms_sql()).df() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
        assert len(got) == len(want) > 0
        for col in ["doc_id", "token", "tf", "df", "rank"]:
            assert list(got[col]) == list(want[col]), col


class TestRasterToVector:
    def test_threshold_keeps_mega_pixel(self, ray_session):
        """At threshold 2 on sf0.001 only the mega-cell pixel (20% of all
        docs geocode there) survives; its box must contain the mega point."""
        from posm_ray.sources import synth
        from posm_ray.stages import extract as ex, tiles as ti

        raster = ti.raster_tiles(ex.extracted_pages(
            synth.read_pages("/root/testdata/sf0.001")))
        vec = ti.raster_to_vector(raster, threshold=2).to_pandas()
        assert len(vec) >= 1
        hot = vec.sort_values("doc_count", ascending=False).iloc[0]
        assert hot["minx"] < synth.MEGA_LON < hot["maxx"]
        assert hot["miny"] < synth.MEGA_LAT < hot["maxy"]
        # boxes are exactly one pix-res cell wide
        import numpy as np

        from posm_ray import cells

        w = cells.cell_width_deg(9)
        assert np.allclose(vec["maxx"] - vec["minx"], w)


class TestSimhashMultiTable:
    def test_rotated_tables_superset(self, ray_session):
        """Multi-table rotated prefixes can only ADD pairs (same hamming
        verify; more collision windows) and must keep every single-table
        pair."""
        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        docs1 = textops.noisy_documents("/root/testdata/sf0.001")
        one = dedup.simhash_pairs(docs1, max_hamming=6).to_pandas()
        docs4 = textops.noisy_documents("/root/testdata/sf0.001")
        four = dedup.simhash_pairs(docs4, max_hamming=6,
                                   ntables=4).to_pandas()
        s1 = set(map(tuple, one[["a", "b"]].itertuples(index=False)))
        s4 = set(map(tuple, four[["a", "b"]].itertuples(index=False)))
        assert s1 <= s4
        assert len(s1) > 0
        # no duplicate pairs after the cross-table dedupe
        assert len(s4) == len(four)


class TestHllClz:
    def test_vectorized_clz_exact(self):
        """The 6-pass shift clz must equal python's bit_length-based clz on
        adversarial values (powers of two, all-ones, near-boundary)."""
        from posm_ray.stages import tiles

        vals = [1, 2, 3, (1 << 63), (1 << 63) - 1, (1 << 64) - 1,
                (1 << 40) + 1, 5, 0xF0F0F0F0F0F0F0F0]
        v = np.array(vals, dtype=np.uint64)
        clz = np.zeros(len(v), dtype=np.uint64)
        cur = v.copy()
        for s in (32, 16, 8, 4, 2, 1):
            hi = cur >> np.uint64(s)
            empty = hi == 0
            clz = np.where(empty, clz + np.uint64(s), clz)
            cur = np.where(empty, cur, hi)
        want = [64 - x.bit_length() for x in vals]
        assert list(clz.astype(int)) == want


class TestTilePyramid:
    def test_levels_consistent(self, ray_session):
        """Each coarser level's total equals the finest level's total, and
        every r8 count is the sum of its r9 children (parent cascade)."""
        import numpy as np

        from posm_ray import cells
        from posm_ray.pipelines import flagship as fs
        from posm_ray.stages import tiles

        out = tiles.tile_pyramid(
            fs.join_rows("/root/testdata/sf0.001", slim=True)).to_pandas()
        totals = out.groupby("res")["n_docs"].sum()
        assert totals[7] == totals[8] == totals[9] > 0
        r9 = out[out["res"] == 9]
        lifted = r9.assign(
            p=cells.parent(r9["cell"].to_numpy(), 8)) \
            .groupby("p")["n_docs"].sum()
        r8 = out[out["res"] == 8].set_index("cell")["n_docs"]
        assert lifted.sort_index().equals(r8.sort_index())


class TestPagerank:
    def test_matches_numpy_reference(self, ray_session):
        """Distributed integer PageRank == a straightforward single-process
        replay of the same fixed-point recurrence on a small digraph."""
        import numpy as np
        import ray.data as rd

        from posm_ray.stages import graph as g

        edges = [(0, 1, 2), (1, 2, 1), (2, 0, 1), (0, 2, 1), (3, 0, 5)]
        ds = rd.from_items(
            [{"src": s, "dst": d, "n": n} for s, d, n in edges])
        got = {r["node"]: r["r"]
               for r in g.pagerank(ds, n_iter=4, npartitions=2).take_all()}

        nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
        r = {v: g.SCALE for v in nodes}
        wt = {}
        for s, _, n in edges:
            wt[s] = wt.get(s, 0) + n
        tel = (g.DAMP_DEN - g.DAMP_NUM) * g.SCALE // g.DAMP_DEN
        for _ in range(4):
            inflow = {v: 0 for v in nodes}
            for s, d, n in edges:
                inflow[d] += (r[s] * n) // wt[s]
            r = {v: tel + g.DAMP_NUM * inflow[v] // g.DAMP_DEN
                 for v in nodes}
        assert got == r
        # every node keeps at least the teleport floor; node 3 (no
        # in-edges) sits exactly on it
        assert min(got.values()) == got[3] == tel

    def test_block_layout_invariant(self, ray_session):
        """The same (src, dst) edge arriving as several partial-count rows
        (per-block pre-counting upstream) must produce the identical rank
        table as the pre-summed edge list: the floor split happens once
        per globally-summed edge, not per partial row."""
        import ray.data as rd

        from posm_ray.stages import graph as g

        summed = [(0, 1, 3), (1, 2, 2), (2, 0, 1), (0, 2, 2)]
        # split every edge's multiplicity across two "blocks"
        split = []
        for s, d, n in summed:
            split.append((s, d, n - 1))
            split.append((s, d, 1))
        ds_sum = rd.from_items(
            [{"src": s, "dst": d, "n": n} for s, d, n in summed])
        ds_split = rd.from_items(
            [{"src": s, "dst": d, "n": n} for s, d, n in split if n > 0])
        a = {r["node"]: r["r"]
             for r in g.pagerank(ds_sum, n_iter=3, npartitions=2).take_all()}
        b = {r["node"]: r["r"]
             for r in g.pagerank(ds_split, n_iter=3, npartitions=3).take_all()}
        assert a == b


class TestPinSmall:
    def test_blocks_survive_source_gc_and_values_match(self, ray_session):
        """pin_small cuts the lineage of a materialized aggregate; the
        pinned blocks must stay alive (and correct) after every reference
        to the source dataset — including the intermediate
        MaterializedDataset inside pin_small — has been collected."""
        import gc

        import pyarrow as pa
        import ray

        from posm_ray.util import hash_rollup, pin_small

        def to_kn(b: pa.Table) -> pa.Table:
            ids = b.column("id").to_numpy(zero_copy_only=False)
            return pa.table({"k": pa.array(ids % 7),
                             "n": pa.array(np.ones(len(ids), dtype=np.int64))})

        src = ray.data.range(10_000).map_batches(to_kn, batch_format="pyarrow")

        def merge(t: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(t, ["k"]).aggregate([("n", "sum")])
            return g.rename_columns(["k", "n"])

        pinned = pin_small(hash_rollup(src, ["k"], merge,
                                       batch_format="pyarrow"))
        del src
        gc.collect()
        got = pinned.to_pandas().sort_values("k").reset_index(drop=True)
        assert got["n"].sum() == 10_000
        assert len(got) == 7
        # consume a second time: pinned datasets are re-readable
        assert pinned.count() == 7

    def test_refuses_raw_stream(self, ray_session):
        """The sketch-size guard: pinning above the row/byte bound raises
        (lineage-cut blocks are unrecoverable on node loss — only cheap
        re-runnable aggregates may pin; see util.pin_small docstring)."""
        import pytest as _pytest
        import ray

        from posm_ray.util import pin_small

        big = ray.data.range(1_000)
        with _pytest.raises(ValueError, match="sketch-size"):
            pin_small(big, max_rows=100)
        with _pytest.raises(ValueError, match="sketch-size"):
            pin_small(big, max_bytes=16)
        # at/below the bounds it pins normally
        assert pin_small(big, max_rows=1_000).count() == 1_000


class TestRadiusJoin:
    def test_matches_brute_force(self, ray_session):
        import pyarrow.compute as pc

        from posm_ray.functions import text  # noqa: F401 (import check)
        from posm_ray.geom.kernels import haversine_m
        from posm_ray.sources import synth
        from posm_ray.stages import extract as ex, knn

        sf = "/root/testdata/sf0.001"
        R = 750_000.0
        ds = ex.extracted_pages(synth.read_pages(sf)).map_batches(
            lambda b: b.filter(pc.equal(b["geocoded"], True)),
            batch_format="pyarrow")
        qid = np.arange(1, 17, dtype=np.int64)
        q = {"id": qid, "lat": synth.derive_lat(qid),
             "lon": synth.derive_lon(qid)}
        got = knn.radius_join(ds, q, R).to_pandas()
        got_pairs = set(map(tuple, got[["query_id", "doc_id"]]
                            .itertuples(index=False)))
        # brute force over the same extracted points (same quantized
        # millimetre membership compare as knn._RadiusFilter)
        pts = ds.to_pandas()
        want = set()
        for i, qi in enumerate(qid):
            dq = knn.quantize_dist_m(haversine_m(
                q["lat"][i], q["lon"][i],
                pts["lat"].to_numpy(), pts["lon"].to_numpy()))
            for did in pts["doc_id"].to_numpy()[dq <= int(R * 1000)]:
                if did != qi:
                    want.add((qi, did))
        assert got_pairs == want
        assert len(want) > 0
        # the bucketed large-Q scale path is EXACT: identical pair set
        got_b = knn.radius_join_bucketed(ds, q, R, cell_res=2).to_pandas()
        got_b_pairs = set(map(tuple, got_b[["query_id", "doc_id"]]
                              .itertuples(index=False)))
        assert got_b_pairs == want

    def test_bucket_covering_superset_extreme_latitudes(self):
        """The query-disc covering must be a SUPERSET prefilter everywhere —
        including high latitudes where a naive linear dlat/cos longitude
        bound under-covers (the asin bound's cubic term grows as 1/cos^3)
        and across the antimeridian. Pure numpy: every candidate within
        the radius must land in a cell mapped to its query."""
        from posm_ray import cells
        from posm_ray.geom.kernels import haversine_m
        from posm_ray.stages.knn import _radius_query_buckets

        rng = np.random.RandomState(0)
        R = 750_000.0
        res = 2
        qlat = np.array([0.0, 45.0, 75.0, 85.0, 88.0, -86.0, 60.0, -45.0])
        qlon = np.array([0.0, 10.0, -170.0, 179.5, 100.0, -179.9, 1.0, 30.0])
        q = {"id": np.arange(len(qlat), dtype=np.int64),
             "lat": qlat, "lon": qlon}
        buckets = _radius_query_buckets(q, R, res)
        # candidates scattered around each query inside the disc
        for i in range(len(qlat)):
            for _ in range(200):
                # random bearing/distance within R (slight margin inside)
                br = rng.uniform(0, 2 * np.pi)
                dist = rng.uniform(0, R * 0.999)
                # spherical destination point
                phi1, lam1 = np.radians(qlat[i]), np.radians(qlon[i])
                delta = dist / 6371000.0
                phi2 = np.arcsin(np.sin(phi1) * np.cos(delta)
                                 + np.cos(phi1) * np.sin(delta) * np.cos(br))
                lam2 = lam1 + np.arctan2(
                    np.sin(br) * np.sin(delta) * np.cos(phi1),
                    np.cos(delta) - np.sin(phi1) * np.sin(phi2))
                plat = np.degrees(phi2)
                plon = (np.degrees(lam2) + 540.0) % 360.0 - 180.0
                if haversine_m(qlat[i], qlon[i], plat, plon) > R:
                    continue  # spherical-destination rounding — skip edge
                c = int(cells.cell_id(np.array([plat]), np.array([plon]),
                                      res)[0])
                assert c in buckets and i in buckets[c], (
                    f"query {i} ({qlat[i]},{qlon[i]}) missing candidate "
                    f"cell for point ({plat},{plon})")
