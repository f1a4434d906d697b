"""V2 (UUID-named) checkpoints with sidecars, inline manifests, JSON
manifests, and classic multi-part checkpoints (plans/meta.py
_apply_checkpoint) — layouts beyond the reference's classic-only
support."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deltalake2db_spark import get_meta, scan_delta
from deltalake2db_spark.sources.delta_writer import DeltaWriter

_SCHEMA = {
    "type": "struct",
    "fields": [
        {"name": "x", "type": "long", "nullable": True, "metadata": {}},
        {"name": "y", "type": "string", "nullable": True, "metadata": {}},
    ],
}


def _two_commit_table(path: str) -> DeltaWriter:
    w = DeltaWriter(path)
    w.commit(
        [
            w.protocol_action(3, 7, ["v2Checkpoint"], ["v2Checkpoint"]),
            w.metadata_action(_SCHEMA),
            w.add_data_file(pa.table({"x": [1, 2, 3], "y": ["a", "b", "c"]})),
        ]
    )
    w.commit([w.add_data_file(pa.table({"x": [4, 5], "y": ["d", "e"]}))])
    return w


def _drop_json_commits(path: str) -> None:
    """Replay must come from the checkpoint alone."""
    for v in (0, 1):
        os.remove(f"{path}/_delta_log/{v:020d}.json")


@pytest.mark.parametrize(
    "use_sidecars,fmt",
    [(True, "parquet"), (False, "parquet"), (False, "json")],
    ids=["sidecar", "inline", "json-manifest"],
)
def test_v2_checkpoint_variants(spark, tmp_path, use_sidecars, fmt):
    path = str(tmp_path / "t")
    w = _two_commit_table(path)
    w.write_v2_checkpoint(use_sidecars=use_sidecars, fmt=fmt)
    _drop_json_commits(path)

    state = get_meta(path)
    assert state.version == 1
    assert len(state.add_actions) == 2
    assert "v2Checkpoint" in state.protocol["readerFeatures"]
    got = sorted(r["x"] for r in scan_delta(spark, path).collect())
    assert got == [1, 2, 3, 4, 5]


def test_v2_checkpoint_then_later_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _two_commit_table(path)
    w.write_v2_checkpoint()
    w.commit([w.add_data_file(pa.table({"x": [6], "y": ["f"]}))])
    _drop_json_commits(path)

    got = sorted(r["x"] for r in scan_delta(spark, path).collect())
    assert got == [1, 2, 3, 4, 5, 6]


def test_classic_multipart_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    w = _two_commit_table(path)
    # hand-rolled 2-part classic checkpoint: protocol+meta in part 1,
    # adds in part 2
    rows = w._checkpoint_rows_raw()
    meta_rows = [r for r in rows if not r.get("add")]
    add_rows = [r for r in rows if r.get("add")]
    from deltalake2db_spark.sources.delta_writer import _MAP_CHECKPOINT_SCHEMA

    log = f"{path}/_delta_log"
    for i, part in enumerate((meta_rows, add_rows), start=1):
        pq.write_table(
            pa.Table.from_pylist(part, schema=_MAP_CHECKPOINT_SCHEMA),
            f"{log}/{1:020d}.checkpoint.{i:010d}.{2:010d}.parquet",
        )
    with open(f"{log}/_last_checkpoint", "w") as fh:
        fh.write(json.dumps({"version": 1, "size": len(rows), "parts": 2}))
    _drop_json_commits(path)

    state = get_meta(path)
    assert len(state.add_actions) == 2
    got = sorted(r["x"] for r in scan_delta(spark, path).collect())
    assert got == [1, 2, 3, 4, 5]


def test_missing_checkpoint_falls_back_to_replay(spark, tmp_path):
    path = str(tmp_path / "t")
    _two_commit_table(path)
    log = f"{path}/_delta_log"
    with open(f"{log}/_last_checkpoint", "w") as fh:
        fh.write(json.dumps({"version": 1, "size": 4}))
    # no checkpoint file at all: full JSON replay must still work
    got = sorted(r["x"] for r in scan_delta(spark, path).collect())
    assert got == [1, 2, 3, 4, 5]
