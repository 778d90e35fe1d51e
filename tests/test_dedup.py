"""Distributed dedup tail (round-2): hash-partitioned Jaccard verify,
label-propagation clustering, hash-partitioned exact-dedup rows — each
pinned equal to its driver-side / SQL oracle on the sf0.001 fixture."""

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


class TestDistributedVerify:
    def test_equals_driver_verify(self, ray_session):
        """verify_jaccard_pairs_distributed must produce the exact same
        (a, b, jaccard) set as the driver-side reference implementation."""
        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        docs = textops.noisy_documents(SF)
        pairs = dedup.minhash_candidate_pairs(docs).materialize()
        want = dedup.verify_jaccard_pairs(
            pairs, textops.noisy_documents(SF), threshold=0.35)
        got = dedup.verify_jaccard_pairs_distributed(
            pairs, textops.noisy_documents(SF), threshold=0.35).to_pandas()
        g = got.sort_values(["a", "b"]).reset_index(drop=True)
        w = want.sort_values(["a", "b"]).reset_index(drop=True)
        assert len(g) == len(w) > 0
        assert (g["a"].to_numpy() == w["a"].to_numpy()).all()
        assert (g["b"].to_numpy() == w["b"].to_numpy()).all()
        # same gram sets, same integer division -> bitwise-equal doubles
        assert (g["jaccard"].to_numpy() == w["jaccard"].to_numpy()).all()


class TestDistributedClusters:
    def test_equals_driver_union_find(self, ray_session):
        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        verified_ds = textops.minhash_verified_pairs(SF).materialize()
        got = dedup.near_dup_clusters_distributed(verified_ds).to_pandas()
        want = dedup.near_dup_clusters(verified_ds.to_pandas())
        got_map = dict(zip(got["doc_id"], got["cluster_rep"]))
        assert len(got_map) == len(got)  # no duplicate nodes
        assert got_map == {int(k): int(v) for k, v in want.items()}
        assert len(got_map) > 0

    def test_chain_converges(self, ray_session):
        """A long chain (diameter > 1) collapses to the min id."""
        import ray.data as rd

        from posm_ray.stages import dedup

        chain = pa.table({
            "a": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9], pa.int64()),
            "b": pa.array([2, 3, 4, 5, 6, 7, 8, 9, 10], pa.int64()),
        })
        out = dedup.near_dup_clusters_distributed(
            rd.from_arrow(chain)).to_pandas()
        assert sorted(out["doc_id"]) == list(range(2, 11))
        assert (out["cluster_rep"] == 1).all()


class TestDegenerateBucketCap:
    """A mass-duplicate corpus (identical boilerplate -> identical minhash
    signatures in ONE bucket per band) must not explode into C(n,2)
    candidate pairs — and the star-pairing fallback must still produce the
    same single cluster with the min-id representative."""

    N = 60
    CAP = 8

    def _docs(self):
        import ray.data as rd

        text = "parked domain placeholder page contact the registrar now"
        return rd.from_items(
            [{"doc_id": i + 100, "text": text} for i in range(self.N)])

    def test_pair_count_bounded_and_cluster_exact(self, ray_session):
        from posm_ray.stages import dedup

        pairs = dedup.minhash_candidate_pairs(
            self._docs(), bucket_cap=self.CAP).materialize()
        n_pairs = pairs.count()
        # O(cap^2 + n), never C(n, 2)
        full = self.N * (self.N - 1) // 2
        star = self.CAP * (self.CAP - 1) // 2 + (self.N - self.CAP)
        assert n_pairs == star < full
        # identical texts: every candidate verifies at jaccard 1.0, and the
        # star topology keeps the component connected through the hub
        verified = dedup.verify_jaccard_pairs_distributed(
            pairs, self._docs(), threshold=0.9)
        out = dedup.near_dup_clusters_distributed(verified).to_pandas()
        assert sorted(out["doc_id"]) == list(range(101, 100 + self.N))
        assert (out["cluster_rep"] == 100).all()

    def test_uncapped_pairs_identical_below_cap(self, ray_session):
        """Buckets smaller than the cap produce byte-identical pair sets
        with and without the cap parameter (the sf corpora stay below it,
        so oracle hashes cannot move)."""
        import ray.data as rd

        from posm_ray.stages import dedup

        docs = rd.from_items(
            [{"doc_id": i, "text": f"shared prefix shingle text {i % 3}"}
             for i in range(12)])
        a = dedup.minhash_candidate_pairs(
            docs, bucket_cap=dedup.MINHASH_BUCKET_CAP).to_pandas()
        b = dedup.minhash_candidate_pairs(docs, bucket_cap=10**9).to_pandas()
        a = a.sort_values(["a", "b"]).reset_index(drop=True)
        b = b.sort_values(["a", "b"]).reset_index(drop=True)
        assert a.equals(b) and len(a) > 0


class TestDedupExactRows:
    def test_matches_qualify_oracle(self, ray_session):
        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        got = dedup.dedup_exact_rows(
            textops.noisy_documents(SF)).to_pandas()
        want = _con().execute(textops.DEDUP_EXACT_ROWS_SQL).df()
        g = got.sort_values("doc_id").reset_index(drop=True)
        w = want.sort_values("doc_id").reset_index(drop=True)
        assert len(g) == len(w) > 0
        assert (g["doc_id"].to_numpy() == w["doc_id"].to_numpy()).all()
        assert (g["text"].to_numpy() == w["text"].to_numpy()).all()

    def test_exact_dup_injections_removed(self, ray_session):
        """Every injected exact copy (doc_id+1M) loses to its original."""
        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        got = dedup.dedup_exact_rows(
            textops.noisy_documents(SF)).to_pandas()
        ids = set(got["doc_id"])
        base = [i for i in ids if i < 1_000_000
                and i % textops.EXACT_DUP_MOD == 0]
        assert len(base) > 0
        for i in base:
            assert i + 1_000_000 not in ids


class TestCoveringAntimeridian:
    def test_wrapped_bbox_splits(self):
        from posm_ray import cells

        # Fiji-like bbox: 177E .. 178W
        cover = cells.covering(177.0, -19.0, -178.0, -16.0, 4)
        assert len(cover) > 0
        lons_w = cells.covering(177.0, -19.0, 180.0, -16.0, 4)
        lons_e = cells.covering(-180.0, -19.0, -178.0, -16.0, 4)
        assert set(int(c) for c in cover) == (
            set(int(c) for c in lons_w) | set(int(c) for c in lons_e))
        # both sides of the antimeridian are registered
        c_west = cells.cell_id(np.array([-17.0]), np.array([178.0]), 4)[0]
        c_east = cells.cell_id(np.array([-17.0]), np.array([-179.0]), 4)[0]
        ids = set(int(c) for c in cover)
        assert int(c_west) in ids and int(c_east) in ids


class TestPrepareOsmIdBothSet:
    def test_both_ids_discarded(self):
        """Reference exposm/utils.py:26-27 else-branch: a multipolygons row
        with BOTH osm_id and osm_way_id set is discarded (None)."""
        from posm_ray.functions import ids

        got = ids.prepare_osm_id(
            pa.array(["multipolygons", "multipolygons", "multipolygons"]),
            pa.array(["1", None, "3"]),
            pa.array(["2", "4", None]))
        assert got.to_pylist() == [None, "W4", "R3"]


class TestSqlExactTwins:
    """Round-2: the md5/splitmix64 hash family makes the full minhash /
    simhash / HLL chains SQL-expressible — pin bit-exact equality with the
    DuckDB twins on the sf0.001 fixture (the driver re-checks at sf0.01)."""

    def test_minhash_near_dups_sql_twin(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.minhash_near_dups(SF)
        want = _con().execute(textops.minhash_near_dups_sql()).df()
        assert len(got) == len(want) > 0
        assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
        assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
        assert (got["jaccard"].to_numpy() == want["jaccard"].to_numpy()).all()

    def test_minhash_clusters_sql_twin(self, ray_session):
        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        verified = textops.minhash_verified_pairs(SF)
        got = dedup.near_dup_clusters_distributed(verified).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = _con().execute(textops.minhash_clusters_sql()).df()
        assert len(got) == len(want) > 0
        assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
        assert (got["cluster_rep"].to_numpy()
                == want["cluster_rep"].to_numpy()).all()

    def test_simhash_sql_twin(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.simhash_near_dups(SF).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        want = _con().execute(textops.simhash_near_dups_sql()).df()
        assert len(got) == len(want) > 0
        assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
        assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
        assert (got["hamming"].to_numpy() == want["hamming"].to_numpy()).all()


class TestDedupIncremental:
    def test_equals_full_recompute(self, ray_session):
        from posm_ray.pipelines import textops
        from posm_ray.stages.dedup import dedup_exact

        sf = "/root/testdata/sf0.001"
        inc = textops.dedup_incremental(sf).to_pandas() \
            .sort_values("content_hash").reset_index(drop=True)
        full = dedup_exact(textops.noisy_documents(sf)).to_pandas() \
            .sort_values("content_hash").reset_index(drop=True)
        assert inc.equals(full)
        # the delta path contributed: some hash's winner is a base-corpus
        # id that beat its injected copy, and near-dup hashes exist only
        # in the delta (winner id >= 2_000_000)
        assert (inc["keep_id"] >= 2_000_000).any()
        assert (inc["keep_id"] < 1_000_000).any()


class TestBucketCapSqlMirror:
    """The SQL twin must replay the SAME capped pair graph above the cap:
    a corpus whose noisy view puts >CAP docs in one bucket per band must
    produce identical verified pairs in Ray and DuckDB."""

    def test_twin_matches_above_cap(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        # shrink the cap for the test via the module constant the SQL
        # builder reads (restored after)
        old_cap = dedup.MINHASH_BUCKET_CAP
        dedup.MINHASH_BUCKET_CAP = 6
        try:
            n = 20
            text = ("parked domain placeholder page contact the registrar "
                    "now for this premium name")
            pq.write_table(pa.table({
                "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
                "text": pa.array([text] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
            }), str(tmp_path / "documents.parquet"))

            docs = textops.noisy_documents(str(tmp_path))
            pairs = dedup.minhash_candidate_pairs(
                docs, bucket_cap=dedup.MINHASH_BUCKET_CAP)
            got = dedup.verify_jaccard_pairs_distributed(
                pairs, textops.noisy_documents(str(tmp_path)),
                threshold=textops.MINHASH_VERIFY_THRESHOLD).to_pandas()
            got = got.sort_values(["a", "b"]).reset_index(drop=True)

            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
            want = con.execute(textops.minhash_near_dups_sql()).df()
            assert len(got) == len(want)
            assert list(got["a"]) == list(want["a"])
            assert list(got["b"]) == list(want["b"])
            # above-cap shape really engaged: far fewer than C(m, 2)
            m = len(set(got["a"]) | set(got["b"]))
            assert len(got) < m * (m - 1) // 2
        finally:
            dedup.MINHASH_BUCKET_CAP = old_cap

class TestSimhashBucketCap:
    """Degenerate simhash prefix bucket (mass-identical corpus): the pair
    OUTPUT must be O(cap^2 + n), never C(n,2) — same star-to-hub shape as
    the minhash candidate cap — while keeping the component connected."""

    N = 60
    CAP = 8

    def _docs(self):
        import ray.data as rd

        text = "parked domain placeholder page contact the registrar now"
        return rd.from_items(
            [{"doc_id": i + 100, "text": text} for i in range(self.N)])

    def test_pair_count_bounded_and_cluster_exact(self, ray_session):
        from posm_ray.stages import dedup

        pairs = dedup.simhash_pairs(
            self._docs(), max_hamming=3, bucket_cap=self.CAP).materialize()
        n_pairs = pairs.count()
        full = self.N * (self.N - 1) // 2
        star = self.CAP * (self.CAP - 1) // 2 + (self.N - self.CAP)
        assert n_pairs == star < full
        # identical texts: hamming 0 everywhere, star keeps it one cluster
        out = dedup.near_dup_clusters_distributed(pairs).to_pandas()
        assert sorted(out["doc_id"]) == list(range(101, 100 + self.N))
        assert (out["cluster_rep"] == 100).all()

    def test_uncapped_pairs_identical_below_cap(self, ray_session):
        """Buckets below the cap emit byte-identical pairs with and without
        the cap (sf corpora stay below it -> oracle hashes cannot move)."""
        import ray.data as rd

        from posm_ray.stages import dedup

        docs = rd.from_items(
            [{"doc_id": i, "text": f"shared boilerplate text body {i % 3}"}
             for i in range(12)])
        a = dedup.simhash_pairs(
            docs, max_hamming=6,
            bucket_cap=dedup.SIMHASH_BUCKET_CAP).to_pandas()
        b = dedup.simhash_pairs(docs, max_hamming=6,
                                bucket_cap=10**9).to_pandas()
        a = a.sort_values(["a", "b"]).reset_index(drop=True)
        b = b.sort_values(["a", "b"]).reset_index(drop=True)
        assert a.equals(b) and len(a) > 0

    def test_twin_matches_above_cap(self, ray_session, tmp_path):
        """The SQL twin replays the SAME capped pair graph above the cap."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from posm_ray.pipelines import textops
        from posm_ray.stages import dedup

        old_cap = dedup.SIMHASH_BUCKET_CAP
        dedup.SIMHASH_BUCKET_CAP = 6  # the SQL builder reads it at call time
        try:
            n = 20
            text = ("parked domain placeholder page contact the registrar "
                    "now for this premium name")
            pq.write_table(pa.table({
                "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
                "text": pa.array([text] * n, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
            }), str(tmp_path / "documents.parquet"))

            got = dedup.simhash_pairs(
                textops.noisy_documents(str(tmp_path)),
                max_hamming=textops.SIMHASH_MAX_HAMMING,
                prefix_bits=textops.SIMHASH_PREFIX_BITS,
                bucket_cap=dedup.SIMHASH_BUCKET_CAP).to_pandas()
            got = got.sort_values(["a", "b"]).reset_index(drop=True)

            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
            want = con.execute(textops.simhash_near_dups_sql()).df()
            assert len(got) == len(want) > 0
            assert list(got["a"]) == list(want["a"])
            assert list(got["b"]) == list(want["b"])
            assert list(got["hamming"]) == list(want["hamming"])
            m = len(set(got["a"]) | set(got["b"]))
            assert len(got) < m * (m - 1) // 2
        finally:
            dedup.SIMHASH_BUCKET_CAP = old_cap


class TestDupSpans:
    def test_matches_oracle(self, ray_session):
        """Exact substring-span dedup hash-matches its SQL twin (the
        driver contract, pinned at sf0.001)."""
        from posm_ray.pipelines import textops

        got = textops.dup_spans(SF).to_pandas() \
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
        want = _con().execute(textops.dup_spans_sql()).df() \
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
        assert len(got) == len(want) > 0
        for c in ("doc_id", "span_start", "span_len"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_exact_dup_docs_fully_covered(self, ray_session):
        """An injected exact copy shares its whole text with the base doc,
        so its duplicated region must be ONE maximal span covering the
        full text (start 1, len = doc length)."""
        import duckdb

        from posm_ray.pipelines import textops

        got = textops.dup_spans(SF).to_pandas()
        lens = _con().execute(
            "SELECT doc_id, length(text) AS n FROM documents "
            f"WHERE doc_id % {textops.EXACT_DUP_MOD} = 0 "
            f"AND length(text) >= {textops.DUP_SPAN_L}").df()
        assert len(lens) > 0
        for _, r in lens.iterrows():
            copy_id = int(r["doc_id"]) + 1_000_000
            rows = got[got["doc_id"] == copy_id]
            assert len(rows) == 1, copy_id
            assert int(rows["span_start"].iloc[0]) == 1
            assert int(rows["span_len"].iloc[0]) == int(r["n"])

    def test_spans_are_maximal_and_disjoint(self, ray_session):
        """No two spans of one doc touch or overlap (maximality): the next
        span starts strictly after prev_end + 1."""
        from posm_ray.pipelines import textops

        got = textops.dup_spans(SF).to_pandas() \
            .sort_values(["doc_id", "span_start"])
        prev_doc, prev_end = None, None
        for _, r in got.iterrows():
            if r["doc_id"] == prev_doc:
                assert int(r["span_start"]) > prev_end + 1
            prev_doc, prev_end = r["doc_id"], int(r["span_start"]) \
                + int(r["span_len"]) - 1
            assert int(r["span_len"]) >= textops.DUP_SPAN_L
