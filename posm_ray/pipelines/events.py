"""Event-stream operators Ray Data lacks natively (SURVEY custom-operator
mandate: as-of join, range join, windowed aggregate), built as
hash-exchange + vectorized per-partition kernels over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

All three partition by ``user_id`` (or broadcast the small side), so the
partitioning assumption is: one user's history fits one partition — true
by construction for bounded per-user event counts; a mega-user would be
salted by time range first.

Every operator here is DuckDB-oracle-checked exactly (window functions /
ASOF JOIN / BETWEEN join twins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import hash_rollup

SESSION_GAP_MIN = 30


def _events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# ---------------------------------------------------------------------------
# gap-based sessionization (windowed aggregate)
# ---------------------------------------------------------------------------

def sessionize(sf_dir: str, gap_min: int = SESSION_GAP_MIN):
    """Per-user session assignment: a new session starts when the gap to the
    previous event exceeds ``gap_min`` minutes. Output
    (event_id, user_id, session_id, session_seq) with session_id numbered
    1.. per user in time order and session_seq the 1-based position within
    the session — all integers, exact oracle twin."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_min)
        new_sess = (new_user | gap).astype("int64")
        sess = new_sess.groupby(g["user_id"]).cumsum()
        seq = g.groupby([g["user_id"], sess], sort=False).cumcount() + 1
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "session_id": sess.astype("int64"),
            "session_seq": seq.astype("int64"),
        })

    return hash_rollup(ds, ["user_id"], per_part, npartitions=None)


SESSIONIZE_SQL = f"""
WITH marked AS (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT event_id, user_id, ts,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM marked
)
SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id, session_id ORDER BY ts, event_id)
         AS BIGINT) AS session_seq
FROM sess
"""


# ---------------------------------------------------------------------------
# backward as-of join
# ---------------------------------------------------------------------------

def asof_prior_click(sf_dir: str):
    """Backward as-of join: every event matched to the most recent 'click'
    event (at-or-before its ts) by the same user. NULL match coalesced to
    -1 so the value hash stays integer-typed. Both sides hash-partition on
    user_id, then one vectorized ``pd.merge_asof`` per partition."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        clicks = g[g["event_type"] == "click"][
            ["ts", "user_id", "event_id"]].rename(
            columns={"event_id": "prior_click"})
        # ties on (user_id, ts) resolve to max(event_id) on BOTH sides —
        # pandas merge_asof would pick the last-sorted row while DuckDB
        # ASOF JOIN's pick among equal-ts matches is unspecified, so make
        # the tie impossible instead (same GROUP BY in the SQL twin).
        clicks = clicks.drop_duplicates(subset=["user_id", "ts"],
                                        keep="last")
        out = pd.merge_asof(g[["ts", "user_id", "event_id"]], clicks,
                            on="ts", by="user_id", direction="backward",
                            allow_exact_matches=True)
        return pd.DataFrame({
            "event_id": out["event_id"].astype("int64"),
            "user_id": out["user_id"].astype("int64"),
            "prior_click": out["prior_click"].fillna(-1).astype("int64"),
        })

    return hash_rollup(ds, ["user_id"], per_part, npartitions=None)


ASOF_PRIOR_CLICK_SQL = """
SELECT e.event_id, e.user_id,
       COALESCE(c.event_id, -1) AS prior_click
FROM events e ASOF LEFT JOIN (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts) c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


# ---------------------------------------------------------------------------
# range join (broadcast small side)
# ---------------------------------------------------------------------------

VALUE_TIERS = [
    ("low", 0.0, 25.0),
    ("mid", 25.0, 100.0),
    ("high", 100.0, 1e18),
]


def value_range_join(sf_dir: str):
    """Range join of events against a tiny tier table
    (value in [lo, hi)): the small side is broadcast and resolved with one
    ``np.searchsorted`` per batch — no shuffle at all. Output
    (event_id, tier)."""
    import pyarrow.compute as pc  # noqa: F401

    ds = _events(sf_dir, ["event_id", "value"])
    bounds = np.array([t[1] for t in VALUE_TIERS] + [VALUE_TIERS[-1][2]])
    names = np.array([t[0] for t in VALUE_TIERS], dtype=object)

    def fn(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(bounds, v, side="right") - 1,
                      0, len(names) - 1)
        return pa.table({
            "event_id": batch["event_id"],
            "tier": pa.array(names[idx], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def value_range_join_sql() -> str:
    vals = ", ".join(f"('{n}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
                     for n, lo, hi in VALUE_TIERS)
    return f"""
SELECT e.event_id, t.tier
FROM events e JOIN (VALUES {vals}) t(tier, lo, hi)
  ON e.value >= t.lo AND e.value < t.hi
"""


def props_k(sf_dir: str):
    """Scalar JSON extraction (SURVEY §2.9 json): props '{"k": n}' -> k as
    int64 (vectorized pandas str parse would be brittle; per-batch
    json.loads is the faithful kernel; DuckDB twin json_extract)."""
    import json

    ds = _events(sf_dir, ["event_id", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        ks = [json.loads(p)["k"] if p else None
              for p in batch.column("props").to_pylist()]
        return pa.table({"event_id": batch["event_id"],
                         "k": pa.array(ks, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


PROPS_K_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
"""


SLIDE_WINDOW_MIN = 60


def sliding_window_counts(sf_dir: str, window_min: int = SLIDE_WINDOW_MIN):
    """Sliding (trailing) window aggregate: for every event, the count of
    the SAME user's events in [ts - window, ts] — the RANGE-window op Ray
    Data lacks natively. Hash-partition by user, sort once per partition,
    then a vectorized ``searchsorted`` finds each event's window start;
    count = position - start + 1. Equal timestamps all fall inside each
    other's windows, matching SQL RANGE semantics exactly (side='right'
    vs 'left' bounds)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        ts = g["ts"].to_numpy()
        out = np.empty(len(g), dtype=np.int64)
        users = g["user_id"].to_numpy()
        bounds = np.flatnonzero(np.diff(users)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(g)]))
        w = np.timedelta64(window_min, "m")
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            first = np.searchsorted(seg, seg - w, side="left")
            last = np.searchsorted(seg, seg, side="right")
            out[s:e] = last - first
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "n_window": out,
        })

    return hash_rollup(ds, ["user_id"], per_part, npartitions=None)


SLIDING_WINDOW_SQL = f"""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL {SLIDE_WINDOW_MIN} MINUTE PRECEDING
               AND CURRENT ROW) AS BIGINT) AS n_window
FROM events
"""


LATENESS_MIN = 60
DISORDER_MOD = 13       # event_id % 13 == 0 -> ts shifted back 90 minutes
DISORDER_SHIFT_MIN = 90


def _disordered(sf_dir: str):
    """The synthetic stream is perfectly ordered, so inject deterministic
    disorder (SQL-expressible, like noisy_documents): every DISORDER_MOD-th
    event's ts is shifted back DISORDER_SHIFT_MIN minutes."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        shift = np.where(eid % DISORDER_MOD == 0,
                         np.timedelta64(DISORDER_SHIFT_MIN, "m"),
                         np.timedelta64(0, "m"))
        ts = batch.column("ts").to_numpy(zero_copy_only=False) - shift
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts": pa.array(ts)})

    return ds.map_batches(fn, batch_format="pyarrow")


def _max_event_id(path: str) -> int:
    """Max event_id from parquet row-group statistics — metadata only, no
    column read (the checkpoint module's cell_lo/cell_hi pattern,
    state/checkpoint.py). Falls back to a distributed ``ds.max`` if any
    row group lacks stats; never a full-column driver read."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    names = md.schema.to_arrow_schema().names
    ci = names.index("event_id")
    hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            hi = None
            break
        hi = st.max if hi is None else max(hi, st.max)
    if hi is None:
        import ray.data as rd

        hi = rd.read_parquet(path, columns=["event_id"]).max("event_id")
    return int(hi)


def late_events(sf_dir: str, lateness_min: int = LATENESS_MIN,
                nparts: int = 16):
    """Watermark-style late-data flagging over a disordered stream
    (streaming semantics the reference lacks; SURVEY §2.10 graft).
    ``event_id`` is arrival order; the watermark is the running max ts over
    ALL prior arrivals; an event is LATE iff its ts trails the watermark by
    more than ``lateness_min`` minutes.

    A global running max is a **distributed prefix scan**, built in the
    classic two-phase shape:
    1. range-partition by arrival (contiguous event_id ranges, co-located
       with one hash exchange on the range id); per partition compute the
       local running max AND the partition max (the latter pre-reduced per
       block before the exchange);
    2. the K partition maxima (tiny) prefix-max on the driver and broadcast
       back; watermark_i = max(prefix_before_partition, local running max).

    Output (event_id, user_id, is_late) — exact window-function oracle."""
    import ray

    max_id = _max_event_id(f"{sf_dir}/events.parquet")
    span = max_id + 1

    ds = _disordered(sf_dir)

    def add_part(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        part = np.minimum(eid * nparts // span, nparts - 1)
        return b.append_column("part", pa.array(part.astype(np.int64)))

    keyed = ds.map_batches(add_part, batch_format="pyarrow")

    # phase 1a: per-block partial -> (part, max_ts); tiny driver collect
    def part_max(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("part", sort=False)["ts"].max() \
            .reset_index(name="max_ts")
        return pa.Table.from_pandas(df, preserve_index=False)

    maxima = keyed.map_batches(part_max, batch_format="pyarrow").to_pandas()
    maxima = maxima.groupby("part", sort=True)["max_ts"].max()
    # exclusive prefix max per partition
    prefix = {}
    running = None
    for p in range(nparts):
        prefix[p] = running
        m = maxima.get(p)
        if m is not None:
            running = m if running is None or m > running else running
    prefix_ref = ray.put(prefix)

    # phase 2: co-locate ranges, local scan + broadcast prefix
    def scan(g: pd.DataFrame) -> pd.DataFrame:
        pre = ray.get(prefix_ref) if not isinstance(prefix_ref, dict) else prefix_ref
        frames = []
        for p, sub in g.groupby("part", sort=False):
            sub = sub.sort_values("event_id", kind="mergesort")
            local_wm = sub["ts"].cummax().shift()
            p0 = pre.get(int(p))
            if p0 is not None:
                local_wm = local_wm.fillna(p0).where(local_wm > p0, p0)
            late = sub["ts"] < local_wm - pd.Timedelta(minutes=lateness_min)
            frames.append(pd.DataFrame({
                "event_id": sub["event_id"].astype("int64"),
                "user_id": sub["user_id"].astype("int64"),
                "is_late": late.fillna(False).astype(bool),
            }))
        return pd.concat(frames, ignore_index=True)

    return hash_rollup(keyed, ["part"], scan, npartitions=nparts)


LATE_EVENTS_SQL = f"""
WITH d AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % {DISORDER_MOD} = 0
              THEN ts - INTERVAL {DISORDER_SHIFT_MIN} MINUTE ELSE ts END AS ts
  FROM events)
SELECT event_id, user_id,
       COALESCE(ts < MAX(ts) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         - INTERVAL {LATENESS_MIN} MINUTE, FALSE) AS is_late
FROM d
"""
