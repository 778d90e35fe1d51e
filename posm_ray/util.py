"""Shared execution-tuning helpers."""

from __future__ import annotations


def default_npartitions(scale: float = 0.5, floor: int = 8) -> int:
    """Hash-exchange partition count scaled to the session: ``scale`` ×
    cluster CPUs, never below ``floor``. A literal per-box default (16)
    under-partitions a multi-node cluster — at 100× data that is ~TB
    blocks per partition — so every exchange derives its width from
    ``ray.cluster_resources()`` the same way ``default_pool`` sizes actor
    pools. ``scale=0.5`` (half the CPUs) rather than 1.0: each hash
    partition spawns an aggregator actor, and on a saturated box a full
    CPU-count of extra aggregator processes contends with the map-side
    pools (measured on the flagship at 32 CPUs: 32 partitions ~14.1 s
    median vs 16 partitions ~12.7 s, clean windows) — half-width still
    grows linearly with cluster size, which is what multi-node scaling
    needs. Partitioning only co-locates keys; merge results are
    partition-count-independent, so oracle hashes do not move with this."""
    try:
        import ray

        if ray.is_initialized():
            n = int(ray.cluster_resources().get("CPU", 4))
            return max(floor, int(n * scale))
    except Exception:
        pass
    return 16


def hash_rollup(ds, keys: list[str], merge_fn, *, npartitions: int | None = None,
                batch_format: str = "pandas"):
    """The engine's aggregation primitive: hash-co-locate rows on ``keys``
    (one all-to-all, HASH_SHUFFLE), then ONE vectorized ``merge_fn`` call
    per partition block. Replaces groupby().map_groups (python call per
    group — seconds at 10k+ groups) and chained sort-aggregates.
    ``npartitions`` (default: ``default_npartitions()`` = ~cluster CPUs)
    is the scale knob; skewed keys spread by the hash, and a single
    mega-key still bounds at one partition's rows — pre-reduce per block
    upstream before calling this.

    ``batch_format="pyarrow"`` + an Arrow-native ``merge_fn``
    (pa.TableGroupBy) skips the Arrow->pandas->Arrow conversion tax; the
    hot rollups (tiles, raster, dedup_exact, top_tokens counts) use it."""
    if npartitions is None:
        npartitions = default_npartitions()
    return ds.repartition(npartitions, keys=keys).map_batches(
        merge_fn, batch_format=batch_format, batch_size=None)


def pin_small(ds):
    """Materialize a SKETCH-SIZE dataset and CUT its lineage: the blocks
    stay distributed in the object store (``to_arrow_refs`` →
    ``from_arrow_refs``, no driver collect), but the returned dataset no
    longer references the upstream execution plan. Without the cut, a
    materialized hash-shuffle output referenced by a long-lived consumer
    keeps its aggregator-actor pool alive until the consumer is GC'd —
    pools accumulate across pipelines in one session and measurably slow
    every later execution (tile_pyramid back-to-back: 11→18→21 s leaking
    vs flat ~8 s collected). Only ever use this on bounded/sketch-size
    aggregates (the same rule as ``.materialize()`` per CLAUDE.md);
    the raw stream must never be pinned."""
    import ray

    mat = ds.materialize()
    return ray.data.from_arrow_refs(mat.to_arrow_refs())


def default_pool(min_size: int = 1) -> tuple[int, int]:
    """Default actor-pool ``concurrency`` for stateful map_batches stages:
    autoscale between ``min_size`` and the cluster CPU count (Ray only adds
    actors under load, so a generous max costs nothing when idle). A fixed
    small max silently caps throughput as CPUs grow — the single biggest
    anti-scaling footgun we hit."""
    try:
        import ray

        if ray.is_initialized():
            n = int(ray.cluster_resources().get("CPU", 4))
            # min = n//8: pre-warms a few actors so the pool ramp doesn't
            # serialize behind the first blocks at high CPU counts
            return (max(min_size, n // 8), max(4, n))
    except Exception:
        pass
    return (min_size, 8)
