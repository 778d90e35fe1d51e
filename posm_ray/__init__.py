"""posm_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch rebuild of the query/data-processing capabilities of
nyaruka/posm (OSM admin-boundary extraction: hierarchical point-in-polygon
joins, validity gating, dissolve/simplify, partition-by-level outputs),
generalized to a spatial-join + tiling engine over Parquet web-page tables:

- hierarchical cell index (H3-style res 0-15 grid, S2-style bbox covering)
- point-in-polygon joins against broadcast boundary tables (ray-crossing
  kernel + per-actor grid index, the Ray analogue of posm's rtree+prepared
  geometry state, reference extract.py:75-77,152-158)
- kNN (haversine, per-cell-shard with halo), ANN over embeddings
- raster<->vector tile aggregation (groupby cell with pre-aggregation)
- training-data ops: exact/MinHash-LSH/SimHash dedup, language id,
  quality scoring, token counts, fingerprints
- per-partition lineage manifests for resumable runs

Everything is expressed as ray.data.Dataset pipelines over zero-copy Arrow
batches; stateful stages are actor pools via map_batches(Cls, concurrency=N).
No module in this package calls ray.init()/ray.shutdown() — sessions are
owned by bench.py / the test fixture / the driver.
"""

__version__ = "0.1.0"


def _configure_data_context() -> None:
    """Engine-level execution config (import-time, no ray.init needed):
    hash-partitioned shuffles. The sort-based default costs O(blocks^2)
    tiny-object exchanges per groupby (measured: 20s+ on a 320k-row rollup
    that hash partitioning does in 3s), and key-based
    ``repartition(keys=...)`` — the primitive our aggregations are built
    on — requires HASH_SHUFFLE. ``Dataset.sort`` still uses the sort path
    where ordering genuinely matters (top-k output edges)."""
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # default 200 hash partitions spawn aggregator actors whose summed
        # CPU reservation starves small sessions outright (hangs at
        # num_cpus=4); 32 partitions is plenty at single-node scale and the
        # per-query knob (groupby(num_partitions=...) / hash_rollup
        # npartitions) overrides where a wider exchange is wanted
        ctx.default_hash_shuffle_parallelism = 32
        # Aggregator actors reserve min(1, cpus/2/partitions)*ratio CPUs
        # EACH and pools whose (materialized) outputs are still referenced
        # stay alive — a pipeline chaining several distinct shuffle shapes
        # accumulates pools until new ones wait out the 300 s
        # aggregator-health timeout (measured: the distributed minhash
        # verify crawled 10x slower, then deadlocked at num_cpus=4).
        # Aggregator work is memory-bound concat, not CPU-bound, so reserve
        # a nominal CPU share; the SPREAD strategy still distributes the
        # actors across nodes on a real cluster.
        import os
        _ov = os.environ.get("POSM_AGG_CPU_OVERRIDE", "0.001")
        if _ov != "off":
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = float(_ov)
    except Exception:  # pragma: no cover - older ray without the enum
        pass


_configure_data_context()
