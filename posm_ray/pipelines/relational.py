"""Relational pipelines over the driver tables — Ray-Data-first.

These prove the engine's general operator coverage (groupby/aggregate,
broadcast joins, sort/top-k, filter pushdown, window-ish time bucketing,
SURVEY.md §2.5-2.7) and are all DuckDB-oracle-checked.

Money/metric aggregation rule: sums of doubles are NOT associative, and Ray's
reduction order is nondeterministic — so every summed metric is integer-scaled
per row (cents / 1e-4 units) BEFORE the aggregate, summed exactly as int64,
and unscaled at the end. The oracle SQL applies the identical transform, so
results are bit-identical regardless of reduction order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def _gb(t: pa.Table, keys: list[str], aggs: list, names: list[str]) -> pa.Table:
    """Arrow-native grouped aggregate with explicit output names: keys come
    first in pyarrow's TableGroupBy result, then the aggregates in call
    order. Replaces the pandas round-trip the partials used before — no
    Arrow->pandas->Arrow conversion tax in the per-batch combiners."""
    g = pa.TableGroupBy(t, keys).aggregate(aggs)
    return g.rename_columns(keys + names)


def _merge_small(partials, merge_fn):
    """Final combine for BOUNDED-cardinality aggregates: the per-batch
    partials are already reduced to (few groups x num blocks) rows, so the
    final merge is one task over a repartition(1) — no sort-shuffle
    machinery (which costs seconds of fixed overhead per groupby at any
    scale). Valid only while (groups x blocks) fits one task — true for
    single-digit/thousand-group rollups even at 10^12 input rows; for
    unbounded keys (per-customer, per-content-hash) use the real
    groupby shuffle instead."""
    return partials.repartition(1).map_batches(
        merge_fn, batch_format="pyarrow", batch_size=None)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped: per (returnflag, linestatus) sums/avgs/count with a
    date filter, partial-aggregated inside map_batches before the (tiny)
    groupby shuffle."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        qty_c = _cents(batch["l_quantity"])
        price_c = _cents(batch["l_extendedprice"])
        # per-row double product first (identical op order in SQL twin)
        disc_price = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        disc_e4 = pc.cast(pc.round(pc.multiply(disc_price, pa.scalar(10000.0))), pa.int64())
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_c": qty_c, "price_c": price_c, "disc_e4": disc_e4,
        })
        return _gb(t, ["l_returnflag", "l_linestatus"],
                   [("qty_c", "sum"), ("price_c", "sum"),
                    ("disc_e4", "sum"), ([], "count_all")],
                   ["qty_c", "price_c", "disc_e4", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        batch = _gb(batch, ["l_returnflag", "l_linestatus"],
                    [("qty_c", "sum"), ("price_c", "sum"),
                     ("disc_e4", "sum"), ("n", "sum")],
                    ["qty_c", "price_c", "disc_e4", "count_order"])
        qty = pc.divide(pc.cast(batch["qty_c"], pa.float64()), pa.scalar(100.0))
        price = pc.divide(pc.cast(batch["price_c"], pa.float64()), pa.scalar(100.0))
        disc = pc.divide(pc.cast(batch["disc_e4"], pa.float64()), pa.scalar(10000.0))
        n = pc.cast(batch["count_order"], pa.float64())
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": qty,
            "sum_base_price": price,
            "sum_disc_price": disc,
            "avg_qty": pc.divide(qty, n),
            "avg_price": pc.divide(price, n),
            "count_order": batch["count_order"],
        })

    return _merge_small(partials, merge)


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0 AS sum_qty,
       SUM(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000.0) AS BIGINT)) / 10000.0 AS sum_disc_price,
       (SUM(CAST(round(l_quantity * 100.0) AS BIGINT)) / 100.0) / COUNT(*) AS avg_qty,
       (SUM(CAST(round(l_extendedprice * 100.0) AS BIGINT)) / 100.0) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def top_customers(sf_dir: str, k: int = 10):
    """Broadcast hash join (orders big side streamed, customer broadcast via
    ray.put) -> groupby customer -> deterministic top-k sort."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    name_map = dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))
    ref = ray.put(name_map)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_custkey": batch["o_custkey"],
            "price_c": _cents(batch["o_totalprice"]),
        })
        return _gb(t, ["o_custkey"],
                   [("price_c", "sum"), ([], "count_all")], ["price_c", "n"])

    # partials are pre-reduced (one row per custkey per block); hash-exchange
    # on custkey, vectorized per-partition merge (unbounded key cardinality
    # -> real shuffle, npartitions is the scale knob)
    from ..util import hash_rollup

    def merge(t: pa.Table) -> pa.Table:
        return _gb(t, ["o_custkey"], [("price_c", "sum"), ("n", "sum")],
                   ["price_c", "n_orders"])

    agg = hash_rollup(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], merge, npartitions=None, batch_format="pyarrow")

    def finalize(batch: pa.Table) -> pa.Table:
        nm = ray.get(ref) if not isinstance(ref, dict) else ref
        keys = batch["o_custkey"].to_pylist()
        return pa.table({
            "c_custkey": batch["o_custkey"],
            "c_name": pa.array([nm.get(int(x)) for x in keys], pa.string()),
            "revenue": pc.divide(pc.cast(batch["price_c"], pa.float64()),
                                 pa.scalar(100.0)),
            "n_orders": batch["n_orders"],
        })

    out = agg.map_batches(finalize, batch_format="pyarrow")
    return out.sort(["revenue", "c_custkey"], descending=[True, False]).limit(k)


def top_customers_sql(k: int = 10) -> str:
    return f"""
SELECT o.o_custkey AS c_custkey, c.c_name AS c_name,
       SUM(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) / 100.0 AS revenue,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey, c.c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT {k}
"""


def region_rollup(sf_dir: str):
    """3-way dim join (region<-nation<-customer) with both dims broadcast —
    J4 ancestry-join analogue (proc_functions.sql:337-362)."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    ref = ray.put((n2r, r2name))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        maps = ray.get(ref) if not isinstance(ref, tuple) else ref
        n2r_, r2name_ = maps
        # dims are tiny (25 nations): vectorized lookup via a dense
        # nationkey->region-name array instead of a per-row dict probe
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        lut = np.empty(max(n2r_) + 1, dtype=object)
        for key, rk in n2r_.items():
            lut[key] = r2name_[rk]
        t = pa.table({
            "r_name": pa.array(lut[nk], pa.string()),
            "bal_c": _cents(batch["c_acctbal"]),
        })
        return _gb(t, ["r_name"], [("bal_c", "sum"), ([], "count_all")],
                   ["bal_c", "n"])

    partials = cust.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        batch = _gb(batch, ["r_name"], [("bal_c", "sum"), ("n", "sum")],
                    ["bal_c", "n_customers"])
        return pa.table({
            "r_name": batch["r_name"],
            "n_customers": batch["n_customers"],
            "total_acctbal": pc.divide(pc.cast(batch["bal_c"], pa.float64()),
                                       pa.scalar(100.0)),
        })

    return _merge_small(partials, merge)


REGION_ROLLUP_SQL = """
SELECT r.r_name AS r_name, COUNT(*) AS n_customers,
       SUM(CAST(round(c.c_acctbal * 100.0) AS BIGINT)) / 100.0 AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def order_priority(sf_dir: str):
    """Filter (pushed into the read) + groupby count — O2/M5 analogue."""
    import ray.data as rd
    from ray.data.aggregate import Count

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi)),
    )

    def partial(batch: pa.Table) -> pa.Table:
        return _gb(batch.select(["o_orderpriority"]), ["o_orderpriority"],
                   [([], "count_all")], ["n"])

    def merge(batch: pa.Table) -> pa.Table:
        return _gb(batch, ["o_orderpriority"], [("n", "sum")], ["n_orders"])

    return _merge_small(ds.map_batches(partial, batch_format="pyarrow"), merge)


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate (streaming-shaped, SURVEY.md §2.10): events
    bucketed to the hour, per (event_type, hour) count + exact value sum."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({
            "event_type": batch["event_type"],
            "hour": hour,
            "value_c": _cents(batch["value"]),
        })
        return _gb(t, ["event_type", "hour"],
                   [("value_c", "sum"), ([], "count_all")], ["value_c", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        # bounded cardinality: (#event_types x #hours) — single merge task
        batch = _gb(batch, ["event_type", "hour"],
                    [("value_c", "sum"), ("n", "sum")],
                    ["value_c", "n_events"])
        return pa.table({
            "event_type": batch["event_type"],
            # pin the unit to timestamp[us] so the schema matches the
            # DuckDB oracle exactly
            "hour": pc.cast(batch["hour"], pa.timestamp("us")),
            "n_events": batch["n_events"],
            "total_value": pc.divide(pc.cast(batch["value_c"], pa.float64()),
                                     pa.scalar(100.0)),
        })

    return _merge_small(partials, merge)


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
       SUM(CAST(round(value * 100.0) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


def type_revenue(sf_dir: str, num_partitions: int = 16):
    """Per-p_type revenue via Ray Data's NATIVE hash join (Dataset.join,
    lineitem ⋈ part on partkey) — the one place we use the built-in join
    operator instead of a broadcast map (part is small enough to broadcast,
    but this query exists to exercise/verify the native exchange path).
    Revenue e4-scaled to exact int64 before summing (module docstring
    rule)."""
    import ray.data as rd

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice", "l_discount"])

    def pre(batch: pa.Table) -> pa.Table:
        disc = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        rev = pc.cast(pc.round(pc.multiply(disc, pa.scalar(10000.0))), pa.int64())
        return pa.table({"l_partkey": batch["l_partkey"], "rev_e4": rev})

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    joined = li.map_batches(pre, batch_format="pyarrow").join(
        part, join_type="inner", num_partitions=num_partitions,
        on=("l_partkey",), right_on=("p_partkey",))

    def partial(batch: pa.Table) -> pa.Table:
        return _gb(batch.select(["p_type", "rev_e4"]), ["p_type"],
                   [("rev_e4", "sum")], ["rev_e4"])

    partials = joined.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        batch = _gb(batch, ["p_type"], [("rev_e4", "sum")], ["rev_e4"])
        return pa.table({
            "p_type": batch["p_type"],
            "revenue": pc.divide(pc.cast(batch["rev_e4"], pa.float64()),
                                 pa.scalar(10000.0)),
        })

    return _merge_small(partials, merge)


TYPE_REVENUE_SQL = """
SELECT p.p_type,
       SUM(CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000.0)
                AS BIGINT)) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_type
"""


def doc_sample(sf_dir: str, pct: int = 10):
    """Deterministic hash sampling (O3 graft): keep docs whose multiplicative
    hash lands under ``pct``%. Exact int arithmetic, SQL-expressible.
    (At 10^12-id scale the multiply must be done mod 2^64 on both sides —
    here ids are small enough that BIGINT never overflows.)"""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def fn(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (did * 2654435761) % 100 < pct
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


DOC_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE (doc_id * 2654435761) % 100 < 10
"""


STRATA_N = 20
_STRATA_KEY_MOD = 1 << 31


def stratified_sample(sf_dir: str, n_per_lang: int = STRATA_N):
    """Deterministic stratified sampling for training-data mixing: the
    first ``n_per_lang`` docs per language in pseudo-random hash order
    (key = doc_id * 2654435761 mod 2^31, tie-broken by doc_id). Exact
    integer arithmetic on both sides, so rank-exact vs the SQL twin.

    Scale shape: per-block partial top-N per lang (vectorized lexsort +
    groupby-head — a combiner, so at most langs x N rows leave each
    block), then one bounded-cardinality merge task (`_merge_small`): the
    exchange ships O(langs x N x blocks) rows no matter the corpus size."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(dtype=np.int64)
        df = df.assign(key=(did * 2654435761) % _STRATA_KEY_MOD)
        df = df.sort_values(["lang", "key", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(n_per_lang)

    partials = ds.map_batches(topn, batch_format="pandas")

    def merge(t: pa.Table) -> pa.Table:
        df = topn(t.to_pandas())
        df["rank"] = df.groupby("lang", sort=False).cumcount() + 1
        return pa.Table.from_pandas(
            df[["lang", "doc_id", "rank"]], preserve_index=False)

    return _merge_small(partials, merge)


def stratified_sample_sql(n_per_lang: int = STRATA_N) -> str:
    return f"""
SELECT lang, doc_id, rank FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % {_STRATA_KEY_MOD}, doc_id) AS rank
  FROM documents)
WHERE rank <= {n_per_lang}
"""


PRIORITY_SAMPLE_K = 100


def priority_sample(sf_dir: str, k: int = PRIORITY_SAMPLE_K):
    """Weighted sampling without replacement — the libm-free integer
    analogue of Efraimidis-Spirakis priority sampling: priority =
    splitmix64(doc_id) // weight (weight = n_chars), keep the k SMALLEST
    priorities. A doc with twice the weight halves its priority range, so
    heavier docs win proportionally more often, while the order is pure
    integer arithmetic (the textbook u^(1/w) keys need pow/log — exactly
    the libm fragility the repo's float rule bans from oracles).

    Scale shape: per-block top-k partial (tie-deterministic lexsort on
    (priority, doc_id)), ONE single-task merge — identical to the bm25 /
    top_customers final; no shuffle of corpus rows."""
    import ray.data as rd

    from ..functions.hashing import splitmix64

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False)
        w = b.column("n_chars").to_numpy(zero_copy_only=False)
        pr = (splitmix64(did.astype(np.uint64)) >> np.uint64(1)) \
            .astype(np.int64) // np.maximum(w, 1)
        top = np.lexsort((did, pr))[:k]
        return pa.table({"doc_id": pa.array(did[top], pa.int64()),
                         "weight": pa.array(w[top], pa.int64()),
                         "priority": pa.array(pr[top], pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("weight").to_numpy(zero_copy_only=False)
        pr = t.column("priority").to_numpy(zero_copy_only=False)
        top = np.lexsort((did, pr))[:k]
        return pa.table({
            "doc_id": pa.array(did[top], pa.int64()),
            "weight": pa.array(w[top], pa.int64()),
            "priority": pa.array(pr[top], pa.int64()),
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        })

    return _merge_small(ds.map_batches(partial, batch_format="pyarrow"),
                        final)


def priority_sample_sql(k: int = PRIORITY_SAMPLE_K) -> str:
    from ..functions import hashing
    from .textops import _mulw_sql

    c0 = 0x9E3779B97F4A7C15
    return f"""
WITH v0 AS (
  SELECT doc_id, n_chars,
         {_mulw_sql('doc_id::UBIGINT', c0)} AS v
  FROM documents),
v1 AS (SELECT doc_id, n_chars, xor(v, v >> 30) AS v FROM v0),
v2 AS (SELECT doc_id, n_chars, {_mulw_sql('v', hashing.MIX_C1)} AS v FROM v1),
v3 AS (SELECT doc_id, n_chars, xor(v, v >> 27) AS v FROM v2),
v4 AS (SELECT doc_id, n_chars, {_mulw_sql('v', hashing.MIX_C2)} AS v FROM v3),
v5 AS (SELECT doc_id, n_chars, xor(v, v >> 31) AS v FROM v4),
pr AS (
  SELECT doc_id, n_chars AS weight,
         ((v >> 1)::BIGINT) // GREATEST(n_chars, 1) AS priority
  FROM v5)
SELECT doc_id, weight, priority, rank FROM (
  SELECT doc_id, weight, priority,
         ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS rank
  FROM pr)
WHERE rank <= {k}
"""
