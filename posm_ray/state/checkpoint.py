"""Per-partition lineage manifests + resumable partitioned writes.

North-rule requirement: every stage checkpoints per-partition lineage
(cell-range manifests + row counts) so a killed run resumes without
recomputing completed cells. Reference analogues (SURVEY.md §4): posm's
resumable topology build driven id-by-id against a log table
(POSMmanagement/process.py:121-154, proc_functions.sql:20,47,74) and its
idempotent OVERWRITE=YES PostGIS writes (exposm/writer.py:39).

Layout::

    out_dir/
      <part_col>=<key>/ *.parquet      (hive-partitioned data)
      _manifest/<key>.json             (written AFTER the partition's data)

A partition is COMPLETE iff its manifest exists; the manifest is written
only after the partition's parquet files are durably on disk, so a kill
between data and manifest just re-runs that partition (replace = delete dir
then rewrite → idempotent). Manifest fields: key, rows, bytes, files,
cell_lo/cell_hi (min/max of the partition key-source column from parquet
column statistics — free, no data read), checksum (blake2b over the sorted
(file, size, rows) triples — write-integrity, order-insensitive).

Resume path: ``completed_keys`` is read once on the driver, broadcast as a
frozenset, and the input Dataset is filtered per batch BEFORE any expensive
stage runs — completed cell ranges never leave the read stage.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifest"


# ---------------------------------------------------------------------------
# manifest primitives
# ---------------------------------------------------------------------------

def completed_keys(out_dir: str) -> frozenset[str]:
    """Keys with a finalized manifest (the resume set)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return frozenset()
    return frozenset(
        f[:-5] for f in os.listdir(mdir) if f.endswith(".json"))


def read_manifests(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                out.append(json.load(fh))
    return out


def _partition_stats(part_dir: str, stat_col: str | None) -> dict:
    rows = 0
    size = 0
    files = []
    lo, hi = None, None
    for name in sorted(os.listdir(part_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(part_dir, name)
        md = pq.read_metadata(path)
        rows += md.num_rows
        fsize = os.path.getsize(path)
        size += fsize
        files.append((name, fsize, md.num_rows))
        if stat_col is not None:
            schema_names = md.schema.to_arrow_schema().names
            if stat_col in schema_names:
                ci = schema_names.index(stat_col)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is not None and st.has_min_max:
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
    checksum = hashlib.blake2b(
        json.dumps(files, sort_keys=True).encode(), digest_size=16
    ).hexdigest()
    return {"rows": rows, "bytes": size, "files": len(files),
            "cell_lo": lo, "cell_hi": hi, "checksum": checksum}


def finalize_manifests(out_dir: str, part_col: str,
                       stat_col: str | None = None,
                       write_sec: float | None = None) -> list[str]:
    """Write manifests for every partition dir that lacks one. Returns the
    newly finalized keys. Call AFTER a write completes. ``write_sec`` (the
    run's write wall time) lands in each manifest — the per-item duration
    log of the reference's resumable topology build
    (proc_functions.sql:20,47), at partition granularity."""
    import time as _time

    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    done = completed_keys(out_dir)
    new = []
    prefix = f"{part_col}="
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith(prefix):
            continue
        key = name[len(prefix):]
        if key in done:
            continue
        stats = _partition_stats(os.path.join(out_dir, name), stat_col)
        stats["key"] = key
        stats["finalized_unix"] = int(_time.time())
        if write_sec is not None:
            stats["run_write_sec"] = round(write_sec, 3)
        tmp = os.path.join(mdir, f".{key}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(stats, fh, sort_keys=True)
        os.replace(tmp, os.path.join(mdir, f"{key}.json"))  # atomic publish
        new.append(key)
    return new


def clean_incomplete(out_dir: str, part_col: str) -> list[str]:
    """Delete partition dirs with no manifest (killed mid-write) — the
    idempotent partition-replace step. Returns removed keys."""
    done = completed_keys(out_dir)
    removed = []
    prefix = f"{part_col}="
    if not os.path.isdir(out_dir):
        return removed
    for name in sorted(os.listdir(out_dir)):
        if name.startswith(prefix):
            key = name[len(prefix):]
            if key not in done:
                shutil.rmtree(os.path.join(out_dir, name))
                removed.append(key)
    return removed


# ---------------------------------------------------------------------------
# resumable write pipeline
# ---------------------------------------------------------------------------

def add_partition_key(ds, cell_col: str, *, range_res: int = 2,
                      part_col: str = "cell_range"):
    """Derive the checkpoint partition key: the coarse (res ``range_res``)
    ancestor of ``cell_col`` — one partition per cell *range*, keeping
    partition count bounded (not one dir per fine cell)."""
    from .. import cells

    def fn(batch: pa.Table) -> pa.Table:
        cell = batch.column(cell_col).to_numpy(zero_copy_only=False)
        part = cells.parent(cell, range_res)
        return batch.append_column(part_col, pa.array(part))

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_completed(ds, done: frozenset[str], part_col: str = "cell_range"):
    """Drop rows whose partition is already complete (broadcast-set filter
    inside map_batches — runs right after the read, SURVEY.md §4 resume)."""
    if not done:
        return ds
    done_ints = frozenset(int(k) for k in done)

    def fn(batch: pa.Table) -> pa.Table:
        part = batch.column(part_col).to_numpy(zero_copy_only=False)
        mask = np.array([int(p) not in done_ints for p in part])
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def resumable_write(ds, out_dir: str, *, cell_col: str = "cell_r7",
                    range_res: int = 2, part_col: str = "cell_range",
                    stat_col: str | None = None) -> dict:
    """Resumable partitioned parquet write:

    1. clean partition dirs killed mid-write (no manifest);
    2. filter out completed cell ranges (broadcast set, pre-stage);
    3. hive-partitioned write by the coarse cell range;
    4. finalize manifests for the newly written partitions.

    Returns {"skipped": n_complete, "written": newly_finalized_keys}.
    """
    import time as _time

    os.makedirs(out_dir, exist_ok=True)
    clean_incomplete(out_dir, part_col)
    done = completed_keys(out_dir)
    keyed = add_partition_key(ds, cell_col, range_res=range_res,
                              part_col=part_col)
    remaining = filter_completed(keyed, done, part_col)
    t0 = _time.perf_counter()
    # min_rows_per_file keeps one file per partition dir for small outputs
    remaining.write_parquet(out_dir, partition_cols=[part_col])
    write_sec = _time.perf_counter() - t0
    new = finalize_manifests(out_dir, part_col, stat_col or cell_col,
                             write_sec=write_sec)
    return {"skipped": len(done), "written": new}


def read_resumed(out_dir: str):
    """Read back the full (completed) output as a Dataset."""
    import ray.data as rd

    return rd.read_parquet(out_dir)
