"""Distributed graph computation: integer fixed-point PageRank.

The link-analysis companion to ``stages/extract.link_graph``: once a crawl
has an edge list, the next thing a curation pipeline wants is a centrality
score per site (spam demotion, crawl prioritisation). PageRank is the
canonical case of an ITERATIVE distributed computation — per round, every
node's rank flows along its out-edges and re-aggregates at the target —
i.e. two hash exchanges per iteration, the same tagged-union co-partition
primitive the near-dup label propagation uses (stages/dedup.py), but with
weighted sums instead of min-labels.

All arithmetic is integer fixed-point (rank scaled by ``SCALE``, floor
division for the damping and the per-edge split), so a DuckDB recursive
CTE replays the identical iteration and the oracle is bit-exact — the
replicate-the-generator pattern the minhash/media twins use, applied to an
iterative algorithm.

Bounds: intermediate products are ``r * n_edge`` with r <= total mass
(n_nodes x SCALE); with SCALE=10^9 this stays inside int64 up to ~10^9
nodes x 10 edge-weight — document-corpus-safe. Dangling nodes keep the
teleport term only (their mass leaks; the classic simplification, stated
rather than hidden).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 10**9
DAMP_NUM = 85          # damping 0.85 as an integer percentage
DAMP_DEN = 100
PAGERANK_ITERS = 10


def pagerank(edges, *, n_iter: int = PAGERANK_ITERS,
             npartitions: int | None = None):
    """edges Dataset (src:int64, dst:int64, n:int64 multiplicity) ->
    Dataset (node:int64, r:int64) after ``n_iter`` synchronous iterations.

    Per iteration: ONE exchange co-partitions each node's rank with the
    edges that READ it (tagged union on src), a vectorized kernel splits
    ``floor(r * n / out_weight)`` along each edge, and a second exchange
    on dst sums the inflow and applies the damped teleport. Rank rows and
    edge rows both stream — nothing lands on the driver; the rank table
    materializes between rounds (it is read twice per round: once as the
    flow source, once as the node list for the teleport term)."""
    from ..util import hash_rollup, pin_small

    # Normalize to ONE row per (src, dst): producers pre-count per read
    # block, so the same edge can arrive as several partial-n rows — and
    # sum(floor(r*n_i/wt)) != floor(r*sum(n_i)/wt). The floor split must
    # happen once per globally-summed edge (exactly what the SQL twin's
    # grouped edge table does), else results depend on block layout.
    def sum_pairs(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["src", "dst"]).aggregate([("n", "sum")])
        return g.rename_columns(["src", "dst", "n"])

    edges = pin_small(hash_rollup(edges, ["src", "dst"], sum_pairs,
                                  npartitions=npartitions,
                                  batch_format="pyarrow"))

    # node set = distinct src ∪ dst (teleport applies to every node)
    def node_halves(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([s, d]), pa.int64())})

    def distinct_nodes(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["node"]).aggregate([])
        return g

    nodes = pin_small(hash_rollup(
        edges.map_batches(node_halves, batch_format="pyarrow"),
        ["node"], distinct_nodes, npartitions=npartitions,
        batch_format="pyarrow"))

    def init_rank(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({"node": b["node"],
                         "r": pa.array(np.full(n, SCALE, dtype=np.int64))})

    ranks = pin_small(nodes.map_batches(init_rank, batch_format="pyarrow"))

    def edge_side(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b["src"], "dst": b["dst"], "n": b["n"],
            "r": pa.nulls(b.num_rows, pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def rank_side(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b["node"],
            "dst": pa.nulls(b.num_rows, pa.int64()),
            "n": pa.nulls(b.num_rows, pa.int64()),
            "r": b["r"],
            "side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
        })

    def flow(g: pd.DataFrame) -> pd.DataFrame:
        """Per partition: out-weight per src, then the integer split of the
        src's rank along each edge — all vectorized."""
        rmap = g.loc[g["side"] == 1, ["key", "r"]].set_index("key")["r"]
        e = g[g["side"] == 0]
        if not len(e):
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "inflow": pd.Series([], dtype=np.int64)})
        n = e["n"].to_numpy(dtype=np.int64)
        wt = e.groupby("key", sort=False)["n"].transform("sum") \
            .to_numpy(dtype=np.int64)
        r = e["key"].map(rmap).to_numpy(dtype=np.int64)
        contrib = (r * n) // wt
        out = pd.DataFrame({"node": e["dst"].to_numpy(dtype=np.int64),
                            "inflow": contrib})
        return out.groupby("node", sort=False)["inflow"].sum().reset_index()

    def teleport_zero(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"],
                         "inflow": pa.array(
                             np.zeros(b.num_rows, dtype=np.int64))})

    def damp(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", sort=False)["inflow"].sum()
        r = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN \
            + DAMP_NUM * s.to_numpy(dtype=np.int64) // DAMP_DEN
        return pd.DataFrame({"node": s.index.to_numpy(dtype=np.int64),
                             "r": r.astype(np.int64)})

    for _ in range(n_iter):
        tagged = edges.map_batches(edge_side, batch_format="pyarrow").union(
            ranks.map_batches(rank_side, batch_format="pyarrow"))
        inflow = hash_rollup(tagged, ["key"], flow, npartitions=npartitions)
        # nodes with no in-edges still get the teleport term: union a zero
        # row per node so the damp groupby covers every node
        allflow = inflow.union(
            nodes.map_batches(teleport_zero, batch_format="pyarrow"))
        ranks = pin_small(hash_rollup(allflow, ["node"], damp,
                                      npartitions=npartitions))

    return ranks


def pagerank_sql(edges_sql: str, *, n_iter: int = PAGERANK_ITERS) -> str:
    """DuckDB twin replaying the identical integer iteration over
    ``edges_sql`` (a query yielding src, dst, n). The iterations UNROLL
    into chained CTEs (pr0..prN) rather than a recursive CTE — the
    recursive form would need two references to the working table (flow
    source + teleport node list), which standard SQL forbids; unrolling
    keeps each round a plain aggregate-join, trivially auditable against
    the Ray kernel."""
    tel = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN
    parts = [
        # one row per (src, dst), mirroring pagerank()'s edge
        # normalization: the floor split happens once per summed edge
        f"e AS (SELECT src, dst, SUM(n) AS n FROM ({edges_sql})"
        " GROUP BY src, dst)",
        "w AS (SELECT src, SUM(n) AS wt FROM e GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node FROM e"
        " UNION SELECT DISTINCT dst FROM e)",
        f"pr0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"""pr{i} AS (
  SELECT nodes.node,
         CAST({tel} + {DAMP_NUM} * COALESCE(f.insum, 0) // {DAMP_DEN}
              AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, SUM((p.r * e.n) // w.wt) AS insum
    FROM pr{i - 1} p JOIN e ON p.node = e.src JOIN w ON w.src = e.src
    GROUP BY e.dst) f USING (node))""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT node, r FROM pr{n_iter}")


def connected_components(pairs, *, max_rounds: int = 50,
                         npartitions: int | None = None):
    """Distributed connected components over an undirected (a, b) edge
    Dataset: (node, component) for EVERY node, component = the minimum
    node id reachable. The min-label propagation kernel is shared with
    the near-dup clustering (stages/dedup.near_dup_clusters_distributed,
    ``emit_all`` — small graphs resolve in one vectorized Ray task, large
    ones in the per-round exchange loop); every propagated node carries a
    label at the fixpoint, so no re-attach pass is needed."""
    from .dedup import near_dup_clusters_distributed

    labels = near_dup_clusters_distributed(
        pairs, max_rounds=max_rounds, npartitions=npartitions,
        emit_all=True)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["doc_id"], "component": b["cluster_rep"]})

    return labels.map_batches(rename, batch_format="pyarrow")


def connected_components_sql(edges_sql: str) -> str:
    """DuckDB twin: recursive min-label reachability (the fixpoint of the
    Ray kernel's propagation is the unique component labeling, so the
    round-by-round replay is unnecessary — unlike pagerank, which compares
    a FIXED iteration count). ``edges_sql`` yields (a, b)."""
    return f"""
WITH RECURSIVE e0 AS ({edges_sql}),
edges AS (SELECT a AS x, b AS y FROM e0 UNION SELECT b, a FROM e0),
nodes AS (SELECT DISTINCT x FROM edges),
reach(x, lab) AS (
    SELECT x, x FROM nodes
    UNION
    SELECT e.y, r.lab FROM reach r JOIN edges e ON e.x = r.x)
SELECT x AS node, MIN(lab)::BIGINT AS component FROM reach GROUP BY x
"""
