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


class _Row:
    def __init__(self, i: int):
        self.i = i

    def asDict(self) -> dict:
        return {"event_id": self.i}


def test_second_concurrent_writer_fails_fast(tmp_path):
    """VERDICT r7 task #4: a second streaming query pointed at the same
    output path must fail BEFORE staging bytes (ownership marker claimed
    by the first writer), instead of racing the staging dir; concurrent
    tasks of the SAME query (same run_id) all proceed."""
    import pytest

    from merl_etl_spark.sources.datasource import JsonLogStreamWriter

    out = tmp_path / "log"
    a = JsonLogStreamWriter({"path": str(out), "owner": "query-A"}, run_id="aaa")
    m1 = a.write(iter([_Row(1)]))

    b = JsonLogStreamWriter({"path": str(out), "owner": "query-B"}, run_id="bbb")
    with pytest.raises(RuntimeError, match="owned by another"):
        b.write(iter([_Row(2)]))
    assert len(list((out / "_staging").glob("part-*.jsonl"))) == 1

    # a second task instance of the SAME query shares the claim
    a2 = JsonLogStreamWriter({"path": str(out), "owner": "query-A"}, run_id="aaa")
    m2 = a2.write(iter([_Row(3)]))
    a.commit([m1, m2], batchId=0)
    assert (out / "batch=0").is_dir()
    # commit's sweep releases the claim for the next batch cycle
    assert not (out / "_staging").exists()


def test_garbage_marker_is_reclaimed_not_wedged(tmp_path):
    """A zero-byte/garbage marker (crash debris — claims are content-
    atomic via temp+link, so it cannot be a live owner's mid-write) must
    not fence out a writer or wedge its cleanup (review r8 finding: the
    pre-atomic claim could strand an empty marker that every restart
    then misread as a foreign owner)."""
    from merl_etl_spark.sources.datasource import JsonLogStreamWriter

    out = tmp_path / "log"
    staging = out / "_staging"
    staging.mkdir(parents=True)
    (staging / ".owner").write_text("")  # crash-truncated claim
    w = JsonLogStreamWriter({"path": str(out)}, run_id="aaa")
    m = w.write(iter([_Row(1)]))  # reclaims instead of raising
    w.commit([m], batchId=0)
    assert (out / "batch=0").is_dir()
    assert not staging.exists()


def test_fenced_commit_refuses_to_publish_or_sweep(tmp_path):
    """If the marker stops being this query's own between staging and
    commit (a newer writer took over the path), commit must neither
    publish nor sweep — the staging contents belong to the new owner."""
    import json

    import pytest

    from merl_etl_spark.sources.datasource import JsonLogStreamWriter

    out = tmp_path / "log"
    a = JsonLogStreamWriter({"path": str(out)}, run_id="aaa")
    m1 = a.write(iter([_Row(1)]))
    # a newer query's takeover: marker now names a different run
    (out / "_staging" / ".owner").write_text(
        json.dumps({"run_id": "bbb", "owner": "usurper"})
    )
    foreign_part = out / "_staging" / "part-foreign.jsonl"
    foreign_part.write_text('{"event_id": 9}\n')
    with pytest.raises(RuntimeError, match="no longer this query's own"):
        a.commit([m1], batchId=0)
    assert not (out / "batch=0").exists()
    assert foreign_part.exists(), "fenced commit must not sweep the new owner's parts"
    # abort is fenced the same way: sweep only what is ours
    a.abort([m1], batchId=0)
    assert foreign_part.exists()
