import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from posm_ray.functions import hashing, ids, text
from posm_ray.sources import synth


def _docs_table(n=200):
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    return t.slice(0, n)


class TestSynthExtraction:
    def test_byte_identical_roundtrip(self):
        """The per-row invariant: extracted text per url == source text,
        byte for byte — including malformed pages (BASELINE.json)."""
        pages = synth.pages_batch(_docs_table(300))
        htmls = pages.column("html").to_pylist()
        texts = pages.column("text").to_pylist()
        for h, t in zip(htmls, texts):
            assert text.extract_text(h) == t

    def test_weird_chars_roundtrip(self):
        tricky = 'a < b & "c" > d; <script>alert(1)</script> éने'
        docs = pa.table({"doc_id": pa.array([3], pa.int64()),
                         "text": pa.array([tricky]),
                         "lang": pa.array(["en"])})
        pages = synth.pages_batch(docs)
        assert text.extract_text(pages.column("html")[0].as_py()) == tricky

    def test_geocode_meta_roundtrip(self):
        pages = synth.pages_batch(_docs_table(100))
        doc_id = pages.column("doc_id").to_numpy()
        lat = synth.derive_lat(doc_id)
        lon = synth.derive_lon(doc_id)
        for i, h in enumerate(pages.column("html").to_pylist()):
            got = text.geocode_meta(h)
            assert got == (lat[i], lon[i])

    def test_skew_megacell(self):
        doc_id = np.arange(100)
        lat = synth.derive_lat(doc_id)
        assert (lat[doc_id % 5 == 0] == synth.MEGA_LAT).all()
        assert (np.abs(lat) <= 90).all()
        lon = synth.derive_lon(doc_id)
        assert (np.abs(lon) <= 180).all()

    def test_fallback_extraction_no_article(self):
        html = b"<html><body><p>Hello <b>world</b></p><script>x=1</script></body></html>"
        assert text.extract_text(html) == "Hello world"

    def test_sql_twins_match(self):
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        q = con.execute(
            f"SELECT doc_id, {synth.url_sql()} AS url, {synth.lat_sql()} AS lat, "
            f"{synth.lon_sql()} AS lon, {synth.domain_sql()} AS domain, "
            f"{synth.warc_ts_sql()} AS warc_ts FROM documents ORDER BY doc_id"
        ).fetch_arrow_table()
        doc_id = q.column("doc_id").to_numpy()
        np.testing.assert_array_equal(
            np.asarray(q.column("lat").to_numpy()), synth.derive_lat(doc_id))
        np.testing.assert_array_equal(
            np.asarray(q.column("lon").to_numpy()), synth.derive_lon(doc_id))
        assert q.column("url").to_pylist() == synth.derive_url(doc_id)
        assert q.column("domain").to_pylist() == synth.derive_domain(doc_id)
        np.testing.assert_array_equal(
            q.column("warc_ts").to_numpy().astype("datetime64[us]"),
            synth.derive_warc_ts(doc_id))


class TestTextAnalysis:
    def test_geocode_text(self):
        s = "Visit us at 27.7172, 85.3240 or -36.85, 174.76 (HQ)."
        got = text.geocode_text(s)
        assert (27.7172, 85.324) in got

    def test_token_count_twin_sql(self):
        import duckdb

        samples = ["a b  c", "", "  ", "one", "x " * 50]
        con = duckdb.connect()
        con.register("t", pa.table({"s": samples}))
        got = con.execute(
            "SELECT len(list_filter(str_split(s, ' '), x -> x <> ''))::BIGINT AS n FROM t"
        ).fetchnumpy()["n"]
        expected = [text.token_count(s) for s in samples]
        assert list(got) == expected

    def test_lang_id(self):
        assert text.lang_id("the cat and the dog is on the mat") == "en"
        assert text.lang_id("le chat est sur la table avec les livres") == "fr"
        assert text.lang_id("zzzz qqqq") == "und"

    def test_quality_metrics(self):
        m = text.quality_metrics("Ab1, c.")
        assert m == {"n_chars": 7, "n_punct": 2, "n_upper": 1,
                     "n_digit": 1, "n_spaces": 1}

    def test_fingerprints(self):
        assert text.fingerprint_md5("abc") == "900150983cd24fb0d6963f7d28e17f72"
        a = text.rolling_fingerprint("the quick brown fox jumps over the lazy dog")
        b = text.rolling_fingerprint("the quick brown fox jumps over the lazy dog")
        assert a == b
        assert text.rolling_fingerprint("short") == text.rolling_fingerprint("short")

    def test_bpe_ish(self):
        assert text.bpe_ish_token_count("hello world42!") == 4

    def test_rolling_fingerprint_sql_twin(self):
        """The power-sum DuckDB twin equals the Horner rolling kernel on
        every length class: empty, sub-window, exactly-window, long."""
        import duckdb
        import pyarrow as pa

        from posm_ray.pipelines.textops import rolling_fingerprints_sql

        samples = ["", "a", "short", "0123456789abcdef",
                   "the quick brown fox jumps over the lazy dog",
                   "x" * 100]
        con = duckdb.connect()
        con.register("documents", pa.table({
            "doc_id": list(range(len(samples))), "text": samples}))
        got = dict(con.execute(rolling_fingerprints_sql()).fetchall())
        expected = {i: text.rolling_fingerprint(s)
                    for i, s in enumerate(samples)}
        assert got == expected


class TestHashing:
    def test_minhash_similar_texts_agree_more(self):
        base = "the quick brown fox jumps over the lazy dog " * 10
        near = base.replace("lazy", "sleepy")
        far = "completely different content about databases " * 10
        s1 = hashing.minhash_signature(hashing.shingles(base))
        s2 = hashing.minhash_signature(hashing.shingles(near))
        s3 = hashing.minhash_signature(hashing.shingles(far))
        sim12 = (s1 == s2).mean()
        sim13 = (s1 == s3).mean()
        assert sim12 > sim13
        # true Jaccard of the two shingle sets is ~0.3; minhash should be near
        assert 0.15 < sim12 < 0.65
        assert sim13 == 0.0

    def test_minhash_deterministic(self):
        s1 = hashing.minhash_signature_batch(["hello world foo bar baz"] * 2)
        np.testing.assert_array_equal(s1[0], s1[1])

    def test_lsh_band_keys_match_for_identical(self):
        sig = hashing.minhash_signature(hashing.shingles("a b c d e f g h"))
        k1 = hashing.lsh_band_keys(sig)
        k2 = hashing.lsh_band_keys(sig.copy())
        assert k1 == k2 and len(k1) == 16

    def test_simhash_near(self):
        a = hashing.simhash("the quick brown fox jumps over the lazy dog " * 5)
        b = hashing.simhash("the quick brown fox jumps over the lazy cat " * 5)
        c = hashing.simhash("astronomy telescope galaxy nebula quasar " * 5)
        assert hashing.hamming64(a, b) < hashing.hamming64(a, c)

    def test_jaccard(self):
        assert hashing.jaccard({1, 2}, {1, 2}) == 1.0
        assert hashing.jaccard({1, 2}, {3, 4}) == 0.0
        assert hashing.jaccard(set(), set()) == 1.0


class TestIds:
    def test_prepare_osm_id(self):
        layer = pa.array(["points", "lines", "multipolygons", "multipolygons",
                          "multipolygons", "other_relations", "bogus"])
        osm = pa.array(["1", "2", "3", None, None, "6", "7"])
        way = pa.array([None, None, None, "4", None, None, None])
        got = ids.prepare_osm_id(layer, osm, way)
        assert got.to_pylist() == ["N1", "W2", "R3", "W4", None, "R6", None]

    def test_coalesce_and_upper(self):
        ne = pa.array([None, "En", None])
        nm = pa.array(["Local", "Loc", None])
        assert ids.coalesce_name(ne, nm).to_pylist() == ["Local", "En", None]
        assert ids.iso_upper(pa.array(["np", None])).to_pylist() == ["NP", None]

    def test_decode_utf8_escapes(self):
        got = ids.decode_utf8_escapes([r"caf\xc3\xa9", None, "plain"])
        assert got == ["café", None, "plain"]


class TestDecodeDoubleUtf8:
    """M10 (extract_overpass.py:41-52): doubly-encoded UTF-8 un-escape."""

    def test_escaped_bytes(self):
        assert text.decode_double_utf8('Z\\xc3\\xbcrich') == 'Zürich'

    def test_passthrough(self):
        assert text.decode_double_utf8('plain') == 'plain'
        assert text.decode_double_utf8('') == ''
        assert text.decode_double_utf8(None) is None

    def test_batch_guards_bad_rows(self):
        got = text.decode_double_utf8_batch(
            ['Z\\xc3\\xbcrich', None, 'a"b', 'न\\xe0\\xa5\\x87'])
        assert got[0] == 'Zürich'
        assert got[2] == 'a"b'  # unparseable escape passes through


class TestPiiRedact:
    def test_matches_duckdb_twin(self, ray_session):
        import duckdb

        from posm_ray.pipelines import textops

        got = (textops.pii_redact("/root/testdata/sf0.001")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = (con.execute(textops.PII_REDACT_SQL + " ORDER BY doc_id").df()
                .reset_index(drop=True))
        assert got["n_emails"].tolist() == want["n_emails"].tolist()
        assert got["n_phones"].tolist() == want["n_phones"].tolist()
        assert got["text_redacted"].tolist() == want["text_redacted"].tolist()

    def test_redaction_removes_all_pii(self, ray_session):
        import re

        from posm_ray.pipelines import textops

        df = textops.pii_redact("/root/testdata/sf0.001").to_pandas()
        em = re.compile(textops.PII_EMAIL_RE)
        ph = re.compile(textops.PII_PHONE_RE)
        assert (df["n_emails"] > 0).any() and (df["n_phones"] > 0).any()
        for t in df["text_redacted"]:
            assert not em.search(t) and not ph.search(t)


class TestRepetitionStats:
    def test_matches_duckdb_twin(self, ray_session):
        import duckdb

        from posm_ray.pipelines import textops

        got = (textops.repetition_stats("/root/testdata/sf0.001")
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = (con.execute("SELECT * FROM (" + textops.REPETITION_STATS_SQL
                            + ") ORDER BY doc_id").df().reset_index(drop=True))
        for c in ("n_words", "n_distinct_words", "top_word_n", "top_bigram_n"):
            assert got[c].tolist() == want[c].tolist(), c

    def test_hand_cases(self):
        import pyarrow.parquet as pq

        from posm_ray.pipelines import textops

        # run the batch kernel standalone on crafted rows (no Ray needed):
        # reuse the operator's inner logic via a tiny fixture parquet.
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["the cat sat on the mat the cat",
                              "a a a b", "one", ""]),
        })
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(tbl, os.path.join(d, "documents.parquet"))
            df = (textops.repetition_stats(d).to_pandas()
                  .sort_values("doc_id").reset_index(drop=True))
        assert df["n_words"].tolist() == [8, 4, 1, 0]
        assert df["n_distinct_words"].tolist() == [5, 2, 1, 0]
        assert df["top_word_n"].tolist() == [3, 3, 1, 0]
        assert df["top_bigram_n"].tolist() == [2, 2, 0, 0]


class TestSurtCanonicalize:
    """functions/urls.py: Python canonicalizer and the DuckDB expression
    twins must agree on adversarial URLs, not just the fixture shape."""

    CASES = [
        "https://example-3.test/page/17",
        "http://User:pw@WWW.Example.COM:80/A/B?b=2&a=1#frag",
        "https://host.test:443/",
        "https://host.test:8443/x?z&&y=1",
        "ftp://files.example.org/pub/file.txt",
        "no-scheme.example/path?k=v",
        "https://single/",
        "",
        "https://example.test/page?",
        # '?' inside the fragment is NOT a query start — the twin must
        # strip the fragment before extracting the query
        "http://h.test/p#f?a=1",
        "https://h.test/p?real=1#frag?fake=2",
        "https://h.test/#?only-in-frag",
    ]

    def test_sql_twin_on_adversarial_urls(self):
        import duckdb

        from posm_ray.functions import urls

        vals = ", ".join(
            "('" + c.replace("'", "''") + "')" for c in self.CASES)
        rows = duckdb.sql(f"""
WITH u(url) AS (SELECT * FROM (VALUES {vals})),
h0 AS (SELECT url, {urls.surt_host_sql('url')} AS h FROM u)
SELECT url, h, {urls.surt_sql('url', 'h')} AS s FROM h0
""").fetchall()
        for url, h, s in rows:
            assert (h, s) == urls.canonicalize(url), url

    def test_sorts_query_and_strips_default_port(self):
        from posm_ray.functions import urls

        host, surt = urls.canonicalize(
            "http://WWW.Site.COM:80/p?b=2&a=1#x")
        assert host == "www.site.com"
        assert surt == "com,site,www)/p?a=1&b=2"


class TestPostings:
    def test_segments_match_pandas_rebuild(self, ray_session):
        import pandas as pd

        from posm_ray.pipelines import textops

        out = textops.postings("/root/testdata/sf0.001", seg_size=8) \
            .to_pandas()
        assert (out["df_seg"] == out["doc_list"].str.count(",") + 1).all()
        assert int(out["df_seg"].max()) <= 8
        # independent pandas rebuild: segmented sorted posting lists
        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
        want = {}
        for did, t in zip(docs["doc_id"], docs["text"]):
            for w in set(x for x in t.split(" ") if x):
                want.setdefault(w, []).append(int(did))
        got = {(r.token, r.seg): r.doc_list for r in out.itertuples()}
        n_segs = 0
        for tok, ids in want.items():
            ids = sorted(ids)
            for s in range((len(ids) + 7) // 8):
                n_segs += 1
                assert got[(tok, s)] == ",".join(
                    map(str, ids[s * 8:(s + 1) * 8]))
        assert n_segs == len(out)
        # segmentation actually bites (some token spans multiple segments)
        assert int(out["seg"].max()) > 0


class TestPercentileGate:
    def test_threshold_semantics(self, ray_session):
        import numpy as np
        import pandas as pd

        from posm_ray.pipelines import textops

        out = textops.percentile_gate("/root/testdata/sf0.001").to_pandas()
        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "lang", "text"])
        docs["n_chars"] = docs["text"].str.len()
        for lang, sub in docs.groupby("lang"):
            a = np.sort(sub["n_chars"].to_numpy())
            thr = a[(len(a) + 3) // 4 - 1]
            kept = out[out["lang"] == lang]
            want = sub[sub["n_chars"] >= thr]
            assert set(kept["doc_id"]) == set(want["doc_id"]), lang
            # the gate keeps at least ~75% of each language
            assert len(kept) >= 0.7 * len(sub)


class TestHostQuota:
    def test_cap_and_min_id_winners(self, ray_session):
        from posm_ray.pipelines import textops

        out = textops.host_quota("/root/testdata/sf0.001", k=3).to_pandas()
        per = out.groupby("host")
        assert int(per.size().max()) <= 3
        for host, g in per:
            g = g.sort_values("rank")
            assert g["rank"].tolist() == list(range(1, len(g) + 1))
            assert g["doc_id"].is_monotonic_increasing
        # winners are the smallest ids per host: doc_id % 100 == host index
        d = int(out["host"].iloc[0].split("-")[1].split(".")[0])
        ids = sorted(out.loc[out["host"] == out["host"].iloc[0], "doc_id"])
        assert ids == [d, d + 100, d + 200]


class TestLinkExtract:
    """stages/extract.LinkExtract href parsing + resolution rules."""

    def test_resolution_rules(self):
        import pyarrow as pa

        from posm_ray.stages.extract import LinkExtract

        html = (b'<a href="/x">a</a> <a href="/x?q=1#f">b</a> '
                b'<a href="https://Other.COM:443/y?b=2">c</a> '
                b'<a href="//proto-rel.test/z">d</a> '
                b'<a href="mailto:a@b.c">e</a> <a href="#frag">f</a> '
                b'<a href="relative/page">g</a>')
        batch = pa.table({
            "url": pa.array(["http://WWW.Site.COM:80/p"]),
            "html": pa.array([html], pa.binary()),
        })
        out = LinkExtract()(batch).to_pandas()
        got = {(r.host, r.path): r.n_in for r in out.itertuples()}
        # /x and /x?q=1#f both resolve to (www.site.com, /x) -> count 2
        assert got == {("www.site.com", "/x"): 2,
                       ("other.com", "/y"): 1}


class TestCurationPipeline:
    def test_stages_all_bite(self, ray_session):
        import pandas as pd

        from posm_ray.pipelines import textops

        out = textops.curation_pipeline(
            "/root/testdata/sf0.001", host_k=2, lang_n=10).to_pandas()
        # mix caps at lang_n per language with contiguous ranks
        per = out.groupby("lang")
        assert int(per.size().max()) <= 10
        for _, g in per:
            assert sorted(g["mix_rank"]) == list(range(1, len(g) + 1))
        # quota: never more than host_k docs of one host survive
        assert int(out.groupby("host").size().max()) <= 2
        # dedup: no surviving exact-duplicate pair (text equality by id
        # construction: +1_000_000 ids are exact copies)
        ids = set(out["doc_id"])
        assert not {i for i in ids if i >= 1_000_000 and i - 1_000_000 in ids}


class TestUnigramSurprisal:
    def test_scores_match_pandas_rebuild(self, ray_session):
        from collections import Counter

        import pandas as pd

        from posm_ray.pipelines import textops

        out = textops.unigram_surprisal("/root/testdata/sf0.001", v=5) \
            .to_pandas().set_index("doc_id")
        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"])
        counts = Counter(w for t in docs["text"] for w in t.split(" ") if w)
        vocab = {tok: i + 1 for i, (tok, _) in enumerate(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5])}
        for did, t in zip(docs["doc_id"], docs["text"]):
            toks = [w for w in t.split(" ") if w]
            want = sum(vocab.get(w, 6) for w in toks)
            assert out.loc[did, "surprisal"] == want
            assert out.loc[did, "n_tokens"] == len(toks)
        # OOV must actually occur (the model is a strict subset of vocab)
        assert len(counts) > 5


class TestCountingMedian:
    def test_matches_numpy_lower_median(self, ray_session):
        import numpy as np
        import pandas as pd

        from posm_ray.pipelines import textops

        out = textops.counting_median("/root/testdata/sf0.001") \
            .to_pandas().set_index("lang")
        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["lang", "text"])
        docs["n"] = docs["text"].str.len()
        for lang, sub in docs.groupby("lang"):
            a = np.sort(sub["n"].to_numpy())
            assert out.loc[lang, "median_chars"] == a[(len(a) + 1) // 2 - 1]
            assert out.loc[lang, "n_docs"] == len(a)


class TestRangePartition:
    def test_buckets_are_balanced_and_ordered(self, ray_session):
        import pandas as pd

        from posm_ray.pipelines import textops

        out = textops.range_partition("/root/testdata/sf0.001", buckets=4) \
            .to_pandas()
        assert set(out["bucket"]) <= set(range(4))
        # range property: every doc in bucket b is <= every doc in b+1
        maxes = out.groupby("bucket")["n_chars"].max()
        mins = out.groupby("bucket")["n_chars"].min()
        for b in range(int(out["bucket"].max())):
            assert maxes[b] <= mins[b + 1]
        # near-balance: exact quantile splits keep buckets within the
        # duplicate-value slack of n/4 each
        sizes = out.groupby("bucket").size()
        n = len(out)
        dup_slack = int(out["n_chars"].value_counts().max())
        assert (sizes <= n // 4 + dup_slack).all()


class TestPackSequences:
    def test_prefix_sum_exact_and_chunks_consistent(self, ray_session):
        import pandas as pd

        from posm_ray.functions import text as textfn
        from posm_ray.pipelines import textops

        out = textops.pack_sequences("/root/testdata/sf0.001", budget=256) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"]) \
            .sort_values("doc_id").reset_index(drop=True)
        nt = docs["text"].map(textfn.token_count).to_numpy()
        import numpy as np

        start = np.concatenate(([0], np.cumsum(nt)[:-1]))
        keep = nt > 0
        assert (out["doc_id"].to_numpy() ==
                docs["doc_id"].to_numpy()[keep]).all()
        # the distributed two-phase scan equals the single-machine prefix
        assert (out["tok_start"].to_numpy() == start[keep]).all()
        assert (out["n_tokens"].to_numpy() == nt[keep]).all()
        # chunk arithmetic invariants
        cf, cl = out["chunk_first"].to_numpy(), out["chunk_last"].to_numpy()
        assert (cf == out["tok_start"].to_numpy() // 256).all()
        assert (cl >= cf).all()
        assert (out["n_chunks"].to_numpy() == cl - cf + 1).all()
        # packing is gap-free: consecutive docs are token-adjacent
        ts, ntk = out["tok_start"].to_numpy(), out["n_tokens"].to_numpy()
        assert (ts[1:] == ts[:-1] + ntk[:-1]).all()

    def test_partition_count_invariance(self, ray_session):
        from posm_ray.pipelines import textops

        a = textops.pack_sequences("/root/testdata/sf0.001", nparts=3) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = textops.pack_sequences("/root/testdata/sf0.001", nparts=16) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestMixtureSchedule:
    def test_matches_twin_and_mix_proportions(self, ray_session):
        import duckdb

        from posm_ray.pipelines import textops

        sf = "/root/testdata/sf0.001"
        got = textops.mixture_schedule(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf}/documents.parquet')")
        want = con.execute(textops.mixture_schedule_sql()).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(want)
        for c in ("doc_id", "lang_rank", "vt"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all()
        # stride property: within a training window of vt <= T, language l
        # contributes ~ w_l * T / LCM docs (exact until a stream runs dry)
        w = textops.MIX_WEIGHTS
        T = 40
        head = got[got["vt"] <= T]
        for lang, sub in head.groupby("lang"):
            wl = w.get(lang, 1)
            assert len(sub) == T // (textops.MIX_LCM // wl)


class TestChunkOccupancy:
    def test_token_conservation_and_budget_bounds(self, ray_session):
        from posm_ray.functions import text as textfn
        from posm_ray.pipelines import textops

        import pandas as pd

        sf = "/root/testdata/sf0.001"
        occ = textops.chunk_occupancy(sf).to_pandas() \
            .sort_values("chunk").reset_index(drop=True)
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        total = int(docs["text"].map(textfn.token_count).sum())
        # every token lands in exactly one chunk
        assert int(occ["n_tokens"].sum()) == total
        # every chunk except the last is exactly full
        assert (occ["n_tokens"].to_numpy()[:-1] == textops.PACK_BUDGET).all()
        assert 0 < occ["n_tokens"].iloc[-1] <= textops.PACK_BUDGET
        # chunks are contiguous from 0
        assert (occ["chunk"].to_numpy() ==
                np.arange(len(occ), dtype=np.int64)).all()
        assert (occ["n_docs"] >= 1).all()
