"""Kill/resume semantics of the lineage-manifest checkpoint layer."""

import json
import os
import shutil

import pytest

from posm_ray.pipelines import flagship
from posm_ray.state import checkpoint


def _join_rows(sf_dir):
    return flagship.join_rows(sf_dir).drop_columns(["text"])


def test_resumable_write_and_manifests(ray_session, sf_smoke, tmp_path):
    out = str(tmp_path / "out")
    res = checkpoint.resumable_write(_join_rows(sf_smoke), out)
    assert res["skipped"] == 0
    assert len(res["written"]) > 1  # multiple cell-range partitions
    manifests = checkpoint.read_manifests(out)
    assert {m["key"] for m in manifests} == set(res["written"])
    total = sum(m["rows"] for m in manifests)
    assert total == _join_rows(sf_smoke).count()
    for m in manifests:
        assert m["bytes"] > 0 and m["files"] >= 1 and m["checksum"]
        # cell_lo/hi from parquet stats: a valid fine-cell range
        assert m["cell_lo"] is not None and m["cell_lo"] <= m["cell_hi"]


def test_kill_and_resume(ray_session, sf_smoke, tmp_path):
    out = str(tmp_path / "out")
    checkpoint.resumable_write(_join_rows(sf_smoke), out)
    full_count = checkpoint.read_resumed(out).count()
    keys = sorted(checkpoint.completed_keys(out))
    assert len(keys) >= 3

    # simulate a kill: one partition fully lost (dir+manifest), one written
    # but not finalized (manifest missing), rest intact
    lost, unfinalized = keys[0], keys[1]
    shutil.rmtree(os.path.join(out, f"cell_range={lost}"))
    os.unlink(os.path.join(out, checkpoint.MANIFEST_DIR, f"{lost}.json"))
    os.unlink(os.path.join(out, checkpoint.MANIFEST_DIR, f"{unfinalized}.json"))

    intact = keys[2]
    intact_dir = os.path.join(out, f"cell_range={intact}")
    mtime_before = {f: os.path.getmtime(os.path.join(intact_dir, f))
                    for f in os.listdir(intact_dir)}

    res = checkpoint.resumable_write(_join_rows(sf_smoke), out)
    # only the two damaged partitions were rewritten
    assert set(res["written"]) == {lost, unfinalized}
    assert res["skipped"] == len(keys) - 2
    # intact partitions untouched (no recompute)
    mtime_after = {f: os.path.getmtime(os.path.join(intact_dir, f))
                   for f in os.listdir(intact_dir)}
    assert mtime_after == mtime_before
    # output complete again
    assert checkpoint.read_resumed(out).count() == full_count
    assert sorted(checkpoint.completed_keys(out)) == keys


def test_clean_incomplete_removes_unmanifested(tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "cell_range=123"))
    os.makedirs(os.path.join(out, checkpoint.MANIFEST_DIR))
    removed = checkpoint.clean_incomplete(out, "cell_range")
    assert removed == ["123"]
    assert not os.path.exists(os.path.join(out, "cell_range=123"))
