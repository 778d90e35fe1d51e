"""Driver-contract regression: __ray_entry__'s surface stays intact."""

import importlib

import pandas as pd
import pyarrow as pa


def _entrymod():
    import __ray_entry__

    return importlib.reload(__ray_entry__)


class TestDriverContract:
    def test_entry_runs_and_is_consumable(self, ray_session):
        e = _entrymod()
        ds = e.entry()
        n = ds.count() if hasattr(ds, "count") else len(ds)
        assert n > 0
        names = (ds.schema().names if hasattr(ds, "schema")
                 else list(ds.columns))
        assert set(names) == {"cell", "doc_count", "distinct_domains"}

    def test_every_oracle_has_a_query(self, ray_session):
        e = _entrymod()
        qs, os_ = e.queries(), e.oracle_sql()
        assert set(os_) <= set(qs)
        assert len(qs) >= 48 and len(os_) >= 31

    def test_queries_return_consumable_types(self, ray_session):
        """Spot-run a representative sample through the contract surface."""
        e = _entrymod()
        qs = e.queries()
        for name in ("tiles_r7", "dedup_exact", "sessionize",
                     "gadm_hierarchy", "media_decode"):
            r = qs[name]("/root/testdata/sf0.001")
            assert (hasattr(r, "iter_batches") or isinstance(r, pd.DataFrame)
                    or isinstance(r, pa.Table)), name
            n = r.count() if hasattr(r, "count") else len(r)
            assert n >= 0, name
