"""Focal statistics (stages.tiles.focal_sum): oracle parity at sf0.001
plus the grid-edge semantics the oracle shares and a brute-force
convolution pin that it doesn't (wrap/drop rules verified independently
of the SQL twin)."""

import duckdb
import numpy as np
import pyarrow as pa

from posm_ray import cells

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con.execute(sql).df()


def _brute(cell_counts: dict[int, int], res: int) -> dict[int, tuple]:
    """Dict-based reference convolution: (cell) -> (center, focal, n)."""
    nx, ny = cells.ncols(res), cells.nrows(res)
    out: dict[int, list] = {}
    for cell, cnt in cell_counts.items():
        ix = (cell >> 24) & ((1 << 24) - 1)
        iy = cell & ((1 << 24) - 1)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jy = iy + dy
                if not (0 <= jy < ny):
                    continue
                tgt = (res << 48) | (((ix + dx) % nx) << 24) | jy
                e = out.setdefault(tgt, [0, 0, 0])
                e[1] += cnt
                e[2] += 1
                if dx == 0 and dy == 0:
                    e[0] += cnt
    return {k: tuple(v) for k, v in out.items()}


def _run(cell_ids: np.ndarray, res: int = 7):
    import ray.data as rd

    from posm_ray.stages import tiles

    ds = rd.from_arrow(pa.table({"cell_r7": pa.array(cell_ids, pa.int64())}))
    return tiles.focal_sum(ds, res=res).to_pandas()


class TestFocalSum:
    def test_matches_oracle_sf0001(self, ray_session):
        import importlib

        import __ray_entry__ as e

        e = importlib.reload(e)
        got = e.queries()["focal_sum"](SF)
        got = got.to_pandas().sort_values("cell").reset_index(drop=True)
        want = _oracle(e.oracle_sql()["focal_sum"]) \
            .sort_values("cell").reset_index(drop=True)
        assert len(got) == len(want)
        for c in ("cell", "center_count", "focal_sum", "n_contrib"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

    def test_brute_force_with_wrap_and_pole_edges(self, ray_session):
        res = 7
        nx, ny = cells.ncols(res), cells.nrows(res)
        # corner cells (all four), an antimeridian pair, and an interior
        # blob with a repeated cell (count 2)
        raw = np.array([
            cells.pack(res, 0, 0),
            cells.pack(res, nx - 1, 0),
            cells.pack(res, 0, ny - 1),
            cells.pack(res, nx - 1, ny - 1),
            cells.pack(res, 0, 100),
            cells.pack(res, nx - 1, 100),
            cells.pack(res, 500, 500),
            cells.pack(res, 500, 500),
            cells.pack(res, 501, 500),
        ], dtype=np.int64)
        counts: dict[int, int] = {}
        for c in raw.tolist():
            counts[c] = counts.get(c, 0) + 1
        want = _brute(counts, res)

        got = _run(raw, res=res)
        assert len(got) == len(want)
        for _, r in got.iterrows():
            c, f, n = want[int(r["cell"])]
            assert int(r["center_count"]) == c
            assert int(r["focal_sum"]) == f
            assert int(r["n_contrib"]) == n

        # wrap: the ix=0 cell at iy=100 must see its ix=nx-1 neighbor
        wrapped = got[got["cell"] == int(cells.pack(res, 0, 100))]
        assert int(wrapped["focal_sum"].iloc[0]) == 2
        # pole edge + wrap combined: the two populated iy=0 corners are
        # WRAP-adjacent (ix=0 and ix=nx-1), so each sees exactly 2
        # contributors -- itself and the wrapped corner -- and nothing
        # from the dropped below-grid row (a clamp would double-count)
        corner = got[got["cell"] == int(cells.pack(res, 0, 0))]
        assert int(corner["n_contrib"].iloc[0]) == 2
        assert int(corner["focal_sum"].iloc[0]) == 2

    def test_halo_cells_have_zero_center(self, ray_session):
        res = 7
        raw = np.array([cells.pack(res, 500, 500)] * 3, dtype=np.int64)
        got = _run(raw, res=res)
        # 3x3 = 9 output cells, one populated center, 8 halo
        assert len(got) == 9
        assert int(got["center_count"].sum()) == 3
        assert (got["focal_sum"] == 3).all()
        halo = got[got["center_count"] == 0]
        assert len(halo) == 8 and (halo["n_contrib"] == 1).all()
