"""merl-jsonlog: Python Data Source streaming writer — exactly-once via
batch-directory finalization (replayed epochs drop whole)."""

from __future__ import annotations

import glob
import json
import os

from merl_etl_spark.sources.datasource import register_sources
from merl_etl_spark.streaming.pipeline import stream_events


def _rows_written(path: str) -> list[dict]:
    rows = []
    for f in sorted(glob.glob(os.path.join(path, "batch=*", "*.jsonl"))):
        with open(f) as fh:
            rows.extend(json.loads(ln) for ln in fh if ln.strip())
    return rows


def test_stream_writer_writes_all_rows_exactly_once(spark, sf_dir, tmp_path):
    register_sources(spark)
    out = str(tmp_path / "log")
    q = (
        stream_events(spark, sf_dir)
        .writeStream.format("merl-jsonlog")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    from merl_etl_spark.sources.tables import load_table

    want = load_table(spark, sf_dir, "events").count()
    rows = _rows_written(out)
    assert len(rows) == want
    assert len({r["event_id"] for r in rows}) == want
    # no orphaned staging dirs after commit (per-writer staging swept)
    assert not glob.glob(os.path.join(out, "_staging", "*"))


def test_stream_writer_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Losing the checkpoint replays epoch 0 into the SAME output dir —
    the committed batch directory absorbs the replay with zero new rows."""
    register_sources(spark)
    out = str(tmp_path / "log")
    for attempt in range(2):
        q = (
            stream_events(spark, sf_dir)
            .writeStream.format("merl-jsonlog")
            .option("path", out)
            # fresh checkpoint per attempt = replay of the same epoch ids
            .option("checkpointLocation", str(tmp_path / f"ckpt{attempt}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    from merl_etl_spark.sources.tables import load_table

    want = load_table(spark, sf_dir, "events").count()
    rows = _rows_written(out)
    assert len(rows) == want, "replayed epoch must not double-write"
    assert not glob.glob(os.path.join(out, "_staging", "*"))
    assert not glob.glob(os.path.join(out, "batch=*.inprogress"))


def test_commit_raises_when_staged_part_is_missing(tmp_path):
    """A commit message naming a vanished part (staging dir disturbed by a
    second writer / manual sweep) must FAIL the batch so Spark replays it,
    not publish the surviving parts as a silently-incomplete batch
    (ADVICE r6 — was a silent skip)."""
    import pytest

    from merl_etl_spark.sources.datasource import JsonLogStreamWriter, LoggedPart

    out = tmp_path / "log"
    staging = out / "_staging"
    staging.mkdir(parents=True)
    present = staging / "part-aaaa.jsonl"
    present.write_text('{"event_id": 1}\n')
    w = JsonLogStreamWriter({"path": str(out)})
    msgs = [
        LoggedPart(str(present), 1),
        LoggedPart(str(staging / "part-swept.jsonl"), 1),  # never written
    ]
    with pytest.raises(RuntimeError, match="staged part"):
        w.commit(msgs, batchId=0)
    assert not (out / "batch=0").exists(), "incomplete batch must not publish"
    # the surviving part is left staged for the replay's abort/cleanup
    assert present.exists()

    # replayed epoch onto an ALREADY-committed dir still absorbs whole —
    # the missing-part check only gates first publication
    (out / "batch=1").mkdir()
    w.commit([LoggedPart(str(staging / "gone.jsonl"), 1)], batchId=1)
