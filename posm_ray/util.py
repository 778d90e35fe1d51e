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


# pin_small is for SKETCH-SIZE aggregates only; the guard makes misuse on
# a raw stream a hard error instead of a silent scale/fault-tolerance bug.
PIN_SMALL_MAX_ROWS = 2_000_000
PIN_SMALL_MAX_BYTES = 256 * 1024 * 1024


def pin_small(ds, *, max_rows: int = PIN_SMALL_MAX_ROWS,
              max_bytes: int = PIN_SMALL_MAX_BYTES):
    """Materialize a SKETCH-SIZE dataset and CUT its lineage: the blocks
    stay distributed in the object store (``to_arrow_refs`` →
    ``from_arrow_refs``, no driver collect), but the returned dataset no
    longer references the upstream execution plan. Without the cut, a
    materialized hash-shuffle output referenced by a long-lived consumer
    keeps its aggregator-actor pool alive until the consumer is GC'd —
    pools accumulate across pipelines in one session and measurably slow
    every later execution (tile_pyramid back-to-back: 11→18→21 s leaking
    vs flat ~8 s collected).

    FAULT-TOLERANCE CONTRACT (multi-node): cutting lineage makes the
    pinned blocks UNRECOVERABLE on node loss — Ray cannot recompute a
    block whose plan was dropped, so a consumer hits an object-lost error
    instead of a transparent re-execution. That trade is acceptable only
    because pin_small is restricted to bounded sketch-size aggregates
    (thresholds, vocab tables, centroids, label maps): the recovery story
    is re-running the cheap producer pipeline, not recovering the block.
    The guard below enforces the restriction — a dataset above
    ``max_rows``/``max_bytes`` raises instead of pinning, so the helper
    can never be misapplied to a raw stream."""
    import ray

    mat = ds.materialize()
    rows, nbytes = mat.count(), mat.size_bytes()
    if rows > max_rows or (nbytes or 0) > max_bytes:
        raise ValueError(
            f"pin_small is for sketch-size aggregates only: got {rows} rows"
            f" / {nbytes} bytes (caps {max_rows} rows / {max_bytes} bytes)."
            " Pinning a raw stream would cut its lineage (unrecoverable on"
            " node loss) and hold the full dataset in the object store —"
            " keep the stream lazy instead.")
    return ray.data.from_arrow_refs(mat.to_arrow_refs())


def list_to_matrix(col, dtype=None) -> "np.ndarray":
    """(N, D) numpy matrix view of an Arrow ``list<T>`` /
    ``fixed_size_list<T>`` column WITHOUT the per-row ``to_pylist()``
    round-trip (measured: the pylist path dominated per-batch time in the
    embedding stages). ``flatten()`` handles chunk offsets/slices; the
    reshape is valid iff all rows share one width, which is asserted via
    the offsets. Zero-copy from the Arrow buffer when the values are
    null-free primitives and no dtype change is needed; otherwise one
    contiguous copy (never a python object per element)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        # preserve the row width where the TYPE still carries it — a
        # (0, 0) result silently loses D and downstream reshapes/offset
        # arithmetic break (the r4 driver ZeroDivisionError, VERDICT #1);
        # variable-width list types don't encode D, so 0 is the honest
        # answer there and callers must special-case empty batches
        w = col.type.list_size if pa.types.is_fixed_size_list(col.type) else 0
        return np.empty((0, w), dtype=dtype or np.float64)
    if col.null_count:  # nulls can't view as a dense matrix
        return np.asarray(col.to_pylist(), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        width = col.type.list_size
    else:
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if not (widths == widths[0]).all():
            return np.asarray(col.to_pylist(), dtype=dtype)
        width = int(widths[0])
    flat = col.flatten().to_numpy(zero_copy_only=False)
    mat = flat.reshape(n, width)
    return mat if dtype is None else mat.astype(dtype, copy=False)


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
