"""Fixture audit for the integer-quantized geo ranking (repo float rule).

The geo queries (knn_geo, knn_geo_sharded, geo_radius_join) rank/filter on
``floor(dist_m * 1000)`` (knn.quantize_dist_m) instead of the raw float64
haversine, because numpy's and DuckDB's libm sin/asin can differ by ~1 ulp
and flip a near-tie rank between environments (the round-3 driver red on
knn_geo_sharded). Quantized int64 ranks are libm-independent PROVIDED the
fixture keeps distances apart:

1. per query, adjacent sorted distinct distances differ by > 2x the 1 mm
   quantum -> the quantized order equals the raw order and a +-few-ulp
   wobble cannot cross a shared millimetre boundary into reordering;
2. every exact distance tie comes from bitwise-identical coordinates, so
   both engines compute the identical distance and break the tie by
   neighbor_id the same way;
3. radius membership: every pair distance stays > 2 mm away from the
   750 km radius, so the quantized compare can't flip at the boundary.

Pure numpy — no Ray session needed. Measured margins (2026-08): min
adjacent gap 0.046 m (sf0.1 knn_geo), min radius margin 34.1 m (sf0.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from posm_ray import cells
from posm_ray.geom.kernels import haversine_m
from posm_ray.sources import synth
from posm_ray.stages.knn import DIST_SCALE, quantize_dist_m

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]
GAP_MIN_M = 2.0 / DIST_SCALE  # 2x the 1 mm quantum
RADIUS_M = 750_000.0          # __ray_entry__.GEO_RADIUS_M


def _points(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    did = t["doc_id"].to_numpy()
    return did, synth.derive_lat(did), synth.derive_lon(did)


def _audit_sorted(d: np.ndarray, latc: np.ndarray, lonc: np.ndarray):
    """Assert rule 1 (gap) and rule 2 (ties only from identical coords)
    for one query's candidate distances."""
    order = np.argsort(d, kind="stable")
    dd, la, lo = d[order], latc[order], lonc[order]
    gaps = np.diff(dd)
    tied = gaps == 0.0
    assert (gaps[~tied] > GAP_MIN_M).all()
    if tied.any():
        i = np.nonzero(tied)[0]
        assert (la[i] == la[i + 1]).all() and (lo[i] == lo[i + 1]).all()


@pytest.mark.parametrize("sf_dir", SFS)
def test_knn_geo_gaps_exceed_quantum(sf_dir):
    did, lat, lon = _points(sf_dir)
    qid = np.arange(1, 17, dtype=np.int64)
    qlat, qlon = synth.derive_lat(qid), synth.derive_lon(qid)
    for i in range(len(qid)):
        m = did != qid[i]
        d = haversine_m(qlat[i], qlon[i], lat[m], lon[m])
        _audit_sorted(d, lat[m], lon[m])
        # rule 3: radius membership margin (same query/candidate family)
        assert np.abs(d - RADIUS_M).min() > GAP_MIN_M


@pytest.mark.parametrize("sf_dir", SFS)
def test_knn_sharded_gaps_exceed_quantum(sf_dir):
    did, lat, lon = _points(sf_dir)
    home = cells.cell_id(lat, lon, 2)
    ix, iy = cells.cell_ixy(home)
    nx = cells.ncols(2)
    for i in range(len(did)):
        dx = np.minimum((ix - ix[i]) % nx, (ix[i] - ix) % nx)
        m = (dx <= 1) & (np.abs(iy - iy[i]) <= 1) & (did != did[i])
        if not m.any():
            continue
        d = haversine_m(lat[i], lon[i], lat[m], lon[m])
        _audit_sorted(d, lat[m], lon[m])


def test_quantize_matches_sql_floor():
    """numpy quantizer == the SQL twin expression CAST(FLOOR(d*1000) AS
    BIGINT) on representative values, including exact-integer inputs."""
    import duckdb

    d = np.array([0.0, 0.001, 0.0009999, 123.456789, 750000.0,
                  2.0e7 + 1 / 3], dtype=np.float64)
    got = quantize_dist_m(d)
    rows = ", ".join(f"({repr(float(x))}::DOUBLE)" for x in d)
    want = duckdb.sql(
        f"SELECT CAST(FLOOR(d * 1000.0) AS BIGINT) FROM (VALUES {rows}) "
        "t(d)").fetchnumpy()
    assert (got == list(want.values())[0]).all()
