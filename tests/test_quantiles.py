"""log2-histogram quantile sketch (textops.log_quantiles): oracle parity,
the 2x relative-error guarantee vs exact quantiles, and block-layout
invariance (the mergeability property that makes the sketch a sketch)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con.execute(sql).df()


class TestLogQuantiles:
    def test_matches_oracle(self, ray_session):
        from posm_ray.pipelines import textops

        got = textops.log_quantiles(SF).to_pandas() \
            .sort_values("lang").reset_index(drop=True)
        want = _oracle(textops.LOG_QUANTILES_SQL) \
            .sort_values("lang").reset_index(drop=True)
        assert len(got) == len(want)
        for c in ("lang", "n_docs", "p50_lb", "p90_lb", "p99_lb"):
            assert (got[c].astype(str) == want[c].astype(str)).all(), c

    def test_relative_error_bound_vs_exact(self, ray_session):
        """Bucket lower bound lb satisfies lb <= exact_q < 2*lb — the
        sketch's whole guarantee, checked against true order statistics."""
        from posm_ray.pipelines import textops

        got = textops.log_quantiles(SF).to_pandas()
        exact = _oracle("""
            SELECT lang, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars)
                     AS rnk,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM documents""")
        for _, r in got.iterrows():
            sub = exact[exact["lang"] == r["lang"]]
            n = int(sub["n"].iloc[0])
            for nm, num, den in (("p50_lb", 1, 2), ("p90_lb", 9, 10),
                                 ("p99_lb", 99, 100)):
                rank = (n * num + den - 1) // den
                true_q = int(sub[sub["rnk"] == rank]["n_chars"].iloc[0])
                lb = int(r[nm])
                assert lb <= true_q < 2 * lb, (r["lang"], nm, lb, true_q)

    def test_block_layout_invariance(self, ray_session):
        """The histogram is a mergeable register set: tiny blocks (many
        partial merges) must produce the identical readout."""
        import ray.data as rd

        from posm_ray.pipelines import textops

        base = textops.log_quantiles(SF).to_pandas() \
            .sort_values("lang").reset_index(drop=True)

        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/documents.parquet",
                          columns=["lang", "n_chars"])
        orig = rd.read_parquet
        try:
            rd.read_parquet = lambda *a, **k: \
                rd.from_arrow(t).repartition(37)
            many = textops.log_quantiles(SF).to_pandas() \
                .sort_values("lang").reset_index(drop=True)
        finally:
            rd.read_parquet = orig
        assert base.equals(many)

    def test_registers_bounded(self, ray_session):
        """No value domain can widen the sketch past langs x 64 registers
        (int64 bit lengths) — the scale invariant."""
        x = np.array([1, 2, 3, 2**52, 577, 44], dtype=np.int64)
        bits = np.frexp(np.maximum(x, 1).astype(np.float64))[1]
        assert bits.max() <= 64
        assert [int(v).bit_length() for v in x] == bits.tolist()
