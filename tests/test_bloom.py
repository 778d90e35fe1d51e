"""Bloom prefilter + exact anti-join (stages/bloom.py)."""

import numpy as np
import pyarrow as pa


def _mk(urls, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(urls)))
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "url": pa.array(urls, pa.string()),
    }))


class TestBloomUnseen:
    def test_matches_oracle_sf0001(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        got = e.queries()["bloom_unseen"]("/root/testdata/sf0.001") \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        want = con.execute(e.oracle_sql()["bloom_unseen"]).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert len(got) == len(want) > 0
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["url"]) == list(want["url"])

    def test_exact_under_heavy_false_positives(self, ray_session):
        """A 128-bit bitmap over 60 seen urls saturates (most probes
        collide), so nearly every new url is a bloom candidate — the
        co-partitioned confirm must rescue all of them; output stays the
        exact anti-join for any m."""
        from posm_ray.stages import bloom

        seen_urls = [f"https://s.test/{i}" for i in range(60)]
        new_urls = [f"https://n.test/{i}" for i in range(80)] + seen_urls[:20]
        out = bloom.bloom_unseen(_mk(new_urls), _mk(seen_urls),
                                 m_bits=128, k=4).to_pandas()
        assert sorted(out["url"]) == sorted(f"https://n.test/{i}"
                                            for i in range(80))

    def test_bloom_has_no_false_negatives(self, ray_session):
        from posm_ray.stages import bloom

        urls = [f"https://x.test/{i}" for i in range(500)]
        bits = bloom.build_bloom(_mk(urls), m_bits=1 << 14, k=4)
        hit = bloom._test_bloom(bits, urls, 1 << 14, 4)
        assert bool(hit.all())

    def test_fpr_bounded(self, ray_session):
        """At m/n ~ 26 bits/key with k=4 the false-positive rate should be
        well under 5%."""
        from posm_ray.stages import bloom

        seen = [f"https://s.test/{i}" for i in range(600)]
        other = [f"https://other.test/{i}" for i in range(2000)]
        bits = bloom.build_bloom(_mk(seen), m_bits=1 << 14, k=4)
        fp = bloom._test_bloom(bits, other, 1 << 14, 4).mean()
        assert fp < 0.05, fp
