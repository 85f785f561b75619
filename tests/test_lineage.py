"""Lineage checkpoint + exact-resume tests."""

import json
import os
import shutil

import pandas as pd
import pytest
import ray.data as rd

from linref_ray.lineage import (
    completed_partitions,
    read_resumable,
    validate_manifest,
    write_resumable,
)


@pytest.fixture
def events_df():
    return pd.DataFrame(
        {
            "event_id": range(100),
            "route_id": [f"R{i % 7}" for i in range(100)],
            "beg": [float(i) for i in range(100)],
            "end": [float(i) + 1.5 for i in range(100)],
        }
    )


def test_write_read_roundtrip(ray_session, events_df, tmp_path):
    out = str(tmp_path / "out")
    summary = write_resumable(
        rd.from_pandas(events_df), out, ("route_id",), num_partitions=4
    )
    assert summary["rows"] == 100
    assert summary["skipped"] == 0
    back = read_resumable(out).to_pandas().sort_values("event_id")
    assert len(back) == 100
    assert back.event_id.tolist() == list(range(100))
    assert validate_manifest(out) == []


def test_resume_skips_completed(ray_session, events_df, tmp_path):
    out = str(tmp_path / "out")
    write_resumable(rd.from_pandas(events_df), out, ("route_id",), 4)
    n_parts = len(completed_partitions(out))
    # Simulate a crash: delete one partition + its manifest.
    victim = sorted(completed_partitions(out))[0]
    shutil.rmtree(os.path.join(out, f"part={victim}"))
    os.remove(os.path.join(out, "_manifest", f"{victim}.json"))
    summary = write_resumable(rd.from_pandas(events_df), out, ("route_id",), 4)
    # Only the missing partition was rewritten.
    assert summary["skipped"] == n_parts - 1
    assert summary["written"] == 1
    back = read_resumable(out).to_pandas()
    assert len(back) == 100
    assert validate_manifest(out) == []


def test_rerun_after_success_writes_nothing(ray_session, events_df, tmp_path):
    out = str(tmp_path / "out")
    write_resumable(rd.from_pandas(events_df), out, ("route_id",), 4)
    summary = write_resumable(rd.from_pandas(events_df), out, ("route_id",), 4)
    assert summary["written"] == 0
    assert summary["rows"] == 0


def test_manifest_detects_corruption(ray_session, events_df, tmp_path):
    out = str(tmp_path / "out")
    write_resumable(rd.from_pandas(events_df), out, ("route_id",), 4)
    victim = sorted(completed_partitions(out))[0]
    man_path = os.path.join(out, "_manifest", f"{victim}.json")
    m = json.load(open(man_path))
    m["content_hash"] = 12345
    json.dump(m, open(man_path, "w"))
    assert validate_manifest(out) == [victim]
