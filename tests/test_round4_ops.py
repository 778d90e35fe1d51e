"""Round-4 operators: BM25 retrieval, winnowing fingerprints, count-min
sketch + heavy hitters, URL revisit collapse, semantic dedup, polygon fill.

Each op is oracle-compared at sf0.001 (same row/value semantics as the
driver) plus property tests pinning the algorithmic guarantees the oracle
can't express (winnowing's shared-substring guarantee, CMS over-estimate
bound, SemDeDup keep-first semantics, cell-center/edge separation)."""

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


def _cmp(got_df, sql, keys):
    want = _con().execute(sql).df()
    assert len(got_df) == len(want)
    g = got_df.sort_values(keys).reset_index(drop=True)
    w = want.sort_values(keys).reset_index(drop=True)
    for c in g.columns:
        assert c in w.columns
        if g[c].dtype.kind in "if":
            assert np.allclose(g[c].to_numpy(), w[c].to_numpy(),
                               rtol=0, atol=0), c
        else:
            assert (g[c].astype(str) == w[c].astype(str)).all(), c


class TestBM25:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.bm25_topk(SF).to_pandas()
        _cmp(got, textops.bm25_topk_sql(), ["rank"])

    def test_rank_order_and_overflow_headroom(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.bm25_topk(SF).to_pandas().sort_values("rank")
        s = got["score"].to_numpy()
        assert (s > 0).all() and (np.diff(s) <= 0).all()
        # int64 headroom: documented safe to N ~ 1e6 docs
        assert int(s.max()) < 1 << 62


class TestWinnowing:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.winnow_fingerprints(SF).to_pandas()
        _cmp(got, textops.winnow_fingerprints_sql(), ["doc_id", "pos"])

    def test_shared_substring_guarantee(self):
        """Any shared substring of length >= k + w - 1 yields a shared
        fingerprint VALUE (the winnowing correctness theorem)."""
        from posm_ray.pipelines.textops import (WINNOW_K, WINNOW_W,
                                                _winnow_picks)

        shared = "x" * 0 + "the quick brown fox jumps over it"
        assert len(shared) >= WINNOW_K + WINNOW_W - 1
        a = f"AAAA {shared} BBBB"
        b = f"zzzzzzzz {shared}"
        _, fa = _winnow_picks(a)
        _, fb = _winnow_picks(b)
        assert set(fa.tolist()) & set(fb.tolist())

    def test_short_doc_paths(self):
        from posm_ray.pipelines.textops import WINNOW_K, _winnow_picks

        # shorter than one k-gram: single whole-text hash at pos 1
        pos, fp = _winnow_picks("abc")
        assert len(pos) == 1 and pos[0] == 1
        # >= k but fewer than w grams: single global-min pick
        pos2, fp2 = _winnow_picks("a" * (WINNOW_K + 1))
        assert len(pos2) == 1

    def test_position_decode_roundtrip(self):
        from posm_ray.pipelines.textops import _winnow_grams, _winnow_picks

        text = "the quick brown fox jumps over the lazy dog " * 3
        pos, fp = _winnow_picks(text)
        grams = _winnow_grams(text.encode()) & ((1 << 40) - 1)
        for p, f in zip(pos, fp):
            assert grams[p - 1] == f  # fp really is the hash at pos


class TestCountMin:
    def test_registers_match_oracle(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.countmin_registers(SF).to_pandas()
        _cmp(got, textops.countmin_registers_sql(), ["d", "col"])

    def test_estimate_upper_bounds_truth(self, ray_session):
        from posm_ray.pipelines import textops

        regs = textops.countmin_registers(SF).to_pandas()
        reg = np.zeros((textops.CMS_D, textops.CMS_W), dtype=np.int64)
        reg[regs["d"], regs["col"]] = regs["cnt"]
        truth = _con().execute("""
            SELECT tok, COUNT(*) n FROM (SELECT unnest(list_filter(
              str_split(text,' '), x->x<>'')) AS tok FROM documents)
            GROUP BY tok""").df()
        for tok, n in truth.itertuples(index=False):
            est = min(reg[d, textops._cms_col(d, tok)]
                      for d in range(textops.CMS_D))
            assert est >= n

    def test_heavy_hitters_exact(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.heavy_hitters(SF).to_pandas()
        _cmp(got, textops.heavy_hitters_sql(), ["token"])
        assert len(got) > 0


class TestUrlRevisits:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.url_revisits(SF).to_pandas()
        _cmp(got, textops.url_revisits_sql(), ["url"])

    def test_fetch_counts(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.url_revisits(SF).to_pandas()
        n = got.set_index("url")["n_fetches"]
        assert n["https://example-0.test/page/0"] == 3   # 0 % 21 == 0
        assert n["https://example-7.test/page/7"] == 2   # 7 % 7, not % 21
        assert n["https://example-1.test/page/1"] == 1


class TestSemanticDedup:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import vectors

        got = vectors.semantic_dedup(SF).to_pandas()
        _cmp(got, vectors.semantic_dedup_sql(), ["vec_id"])

    def test_keep_first_semantics(self, ray_session):
        """Exact injected copies (vec_id + 1M) quantize to the same cluster
        as their base and must be dropped; the base (lower id) survives
        unless it has an even-lower near neighbor."""
        from posm_ray.pipelines import vectors

        got = vectors.semantic_dedup(SF).to_pandas().set_index("vec_id")
        base = [v for v in got.index if v < 1_000_000
                and v % vectors.DUP_EXACT_MOD == 0]
        assert base
        for v in base:
            copy = v + 1_000_000
            assert got.loc[copy, "cluster"] == got.loc[v, "cluster"]
            assert got.loc[copy, "kept"] == 0
        # every cluster's minimum vec_id is always kept
        first = got.reset_index().sort_values("vec_id") \
            .groupby("cluster").first()
        assert (first["kept"] == 1).all()


class TestPolygonFill:
    def test_matches_oracle(self, ray_session):
        from posm_ray.stages import tiles
        from posm_ray.sources import boundaries as bsrc

        got = tiles.polygon_fill(bsrc.clean_boundaries()).to_pandas()
        _cmp(got, tiles.polygon_fill_sql(), ["osm_id", "cell"])

    def test_center_edge_separation(self):
        """Strictness audit (the polygon-fill analogue of the knn quantum
        audit): no cell center at POLYFILL_RES coincides with any fixture
        rectangle edge, so the strict PIP decision can never be
        float-fragile between numpy and DuckDB."""
        from posm_ray import cells
        from posm_ray.sources import boundaries as bsrc
        from posm_ray.stages.tiles import POLYFILL_RES

        res = POLYFILL_RES
        nx, ny = cells.ncols(res), cells.nrows(res)
        cx = (np.arange(nx, dtype=np.int64) + 0.5) / nx * 360.0 - 180.0
        cy = (np.arange(ny, dtype=np.int64) + 0.5) / ny * 180.0 - 90.0
        for r in bsrc.iter_clean():
            minx, miny, maxx, maxy = r["bbox"]
            for edge in (minx, maxx):
                assert np.abs(cx - edge).min() > 1e-9
            for edge in (miny, maxy):
                assert np.abs(cy - edge).min() > 1e-9

    def test_brute_force_one_county(self, ray_session):
        from posm_ray import cells
        from posm_ray.sources import boundaries as bsrc
        from posm_ray.stages import tiles

        got = tiles.polygon_fill(bsrc.clean_boundaries()).to_pandas()
        county = [r for r in bsrc.iter_clean() if r["adminlevel"] == 2][0]
        minx, miny, maxx, maxy = county["bbox"]
        res = tiles.POLYFILL_RES
        nx, ny = cells.ncols(res), cells.nrows(res)
        ix = np.arange(nx, dtype=np.int64)
        iy = np.arange(ny, dtype=np.int64)
        cx = (ix + 0.5) / nx * 360.0 - 180.0
        cy = (iy + 0.5) / ny * 180.0 - 90.0
        gx = ix[(cx > minx) & (cx < maxx)]
        gy = iy[(cy > miny) & (cy < maxy)]
        mx, my = np.meshgrid(gx, gy, indexing="ij")
        want = set(cells.pack(res, mx.ravel(), my.ravel()).tolist())
        have = set(got.loc[got["osm_id"] == county["osm_id"], "cell"]
                   .tolist())
        assert have == want and len(want) > 100


class TestHostComponents:
    def test_matches_oracle(self, ray_session):
        import __ray_entry__ as e

        got = e.queries()["host_components"](SF).to_pandas()
        _cmp(got, e.oracle_sql()["host_components"], ["node"])

    def test_star_and_bridge_structure(self, ray_session):
        """Decade members share their hub's component; bridged decades
        merge; unbridged decades stay apart."""
        import __ray_entry__ as e

        got = e.queries()["host_components"](SF).to_pandas() \
            .set_index("node")["component"]
        # every node's label is <= itself (min-reachable id)
        assert (got.values <= got.index.to_numpy()).all()
        # same decade -> same component (star edges)
        for hub in set((n // 10) * 10 for n in got.index):
            members = [n for n in got.index if (n // 10) * 10 == hub]
            assert len(set(got[m] for m in members)) == 1
        # doc 0 exists at every sf -> bridge hub 0 <-> hub 20
        if 20 in got.index:
            assert got[20] == got[0] == 0


class TestPrioritySample:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import relational

        got = relational.priority_sample(SF).to_pandas()
        _cmp(got, relational.priority_sample_sql(), ["rank"])

    def test_priority_formula_and_order(self, ray_session):
        from posm_ray.functions.hashing import splitmix64
        from posm_ray.pipelines import relational

        got = relational.priority_sample(SF).to_pandas().sort_values("rank")
        did = got["doc_id"].to_numpy()
        w = got["weight"].to_numpy()
        pr = (splitmix64(did.astype(np.uint64)) >> np.uint64(1)) \
            .astype(np.int64) // np.maximum(w, 1)
        assert (pr == got["priority"].to_numpy()).all()
        assert (np.diff(got["priority"].to_numpy()) >= 0).all()


class TestPropagationPaths:
    def test_single_task_equals_exchange_loop(self, ray_session, monkeypatch):
        """The small-graph single-task fast path and the per-round exchange
        loop must produce identical fixpoint labelings (the fixpoint is
        unique), including representatives under emit_all."""
        import pyarrow as pa
        import ray.data as rd

        from posm_ray.stages import dedup, graph

        pairs = pa.table({"a": pa.array([1, 2, 5, 10, 11], pa.int64()),
                          "b": pa.array([2, 3, 6, 11, 12], pa.int64())})
        fast = graph.connected_components(rd.from_arrow(pairs)) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        monkeypatch.setattr(dedup, "SINGLE_TASK_EDGE_ROWS", 0)
        loop = graph.connected_components(rd.from_arrow(pairs)) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        assert fast.equals(loop)
        assert dict(zip(fast["node"], fast["component"])) == {
            1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 11: 10, 12: 10}


class TestWinnowDups:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.winnow_dups(SF).to_pandas()
        _cmp(got, textops.winnow_dups_sql(), ["a", "b"])
        assert len(got) > 0

    def test_exact_copies_pair(self, ray_session):
        """Injected exact copies share every fingerprint; the rare ones
        (df <= max_df) must push the pair over min_shared."""
        from posm_ray.pipelines import textops

        got = textops.winnow_dups(SF).to_pandas()
        pairs = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
        vid = _con().execute(
            f"SELECT doc_id FROM documents WHERE doc_id % "
            f"{textops.EXACT_DUP_MOD} = 0").df()["doc_id"]
        found = sum((int(v), int(v) + 1_000_000) in pairs for v in vid)
        assert found == len(vid)


class TestZonalStats:
    def test_matches_oracle(self, ray_session):
        import __ray_entry__ as e

        got = e.queries()["zonal_stats"](SF).to_pandas()
        _cmp(got, e.oracle_sql()["zonal_stats"], ["zone"])

    def test_counts_cover_county_docs(self, ray_session):
        import __ray_entry__ as e
        from posm_ray.pipelines import flagship

        got = e.queries()["zonal_stats"](SF).to_pandas()
        jr = flagship.join_rows(SF).to_pandas()
        want = int(jr["level2_id"].notna().sum())
        assert int(got["n_docs"].sum()) == want > 0
        assert (got["sum_chars"] > 0).all()


class TestRectJoin:
    def test_matches_oracle(self, ray_session):
        import __ray_entry__ as e

        got = e.queries()["rect_join"](SF).to_pandas()
        _cmp(got, e.oracle_sql()["rect_join"], ["doc_id", "osm_id"])
        assert len(got) > 0

    def test_report_once_no_duplicates(self, ray_session):
        """A pair sharing many covering cells must be emitted exactly once
        (the report-once trick), including pairs whose overlap spans
        multiple cells (4-degree boxes over 0.176-degree cells always do)."""
        import __ray_entry__ as e

        got = e.queries()["rect_join"](SF).to_pandas()
        assert not got.duplicated(["doc_id", "osm_id"]).any()

    def test_brute_force_equality(self, ray_session):
        import __ray_entry__ as e
        import numpy as np

        from posm_ray.sources import boundaries as bsrc, synth

        got = e.queries()["rect_join"](SF).to_pandas()
        pairs = set(map(tuple, got[["doc_id", "osm_id"]]
                        .itertuples(index=False)))
        did = _con().execute(
            f"SELECT doc_id FROM documents WHERE doc_id % "
            f"{e._RECT_JOIN_MOD} = 0").df()["doc_id"].to_numpy()
        lat, lon = synth.derive_lat(did), synth.derive_lon(did)
        h = e._RECT_HALF
        want = set()
        for r in bsrc.iter_clean():
            if r["adminlevel"] != 2:
                continue
            minx, miny, maxx, maxy = r["bbox"]
            hit = ((lon - h < maxx) & (lon + h > minx)
                   & (lat - h < maxy) & (lat + h > miny))
            for d in did[hit]:
                want.add((int(d), r["osm_id"]))
        assert pairs == want
