"""Versioned-table protocol tests (SURVEY §2.13 M10): snapshot
isolation, time travel, optimistic-concurrency conflict, rollback
audit trail, and vacuum safety."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mvp_mini_etl_pipeline_1762911573_spark.sources import versioned
from mvp_mini_etl_pipeline_1762911573_spark.tables import load


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_append_overwrite_time_travel(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    t = str(tmp_path / "tbl")
    b0 = docs.where(F.col("doc_id") < 20)
    b1 = docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
    b2 = docs.where(F.col("doc_id") >= 90)

    v0 = versioned.commit(spark, t, b0)
    v1 = versioned.commit(spark, t, b1)                  # append
    v2 = versioned.commit(spark, t, b2, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)

    # latest = overwrite result; every old snapshot remains readable
    assert _ids(versioned.read(spark, t)) == _ids(b2)
    assert _ids(versioned.read(spark, t, 0)) == _ids(b0)
    assert _ids(versioned.read(spark, t, 1)) == _ids(b0.unionByName(b1))

    hist = versioned.history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["mode"] == "overwrite"
    assert hist[1]["added_rows"] == b1.count()


def test_commit_conflict_one_winner(spark, sf_dir, tmp_path):
    """Two writers racing to the same version: exactly one manifest
    wins; the loser raises and its data files are vacuum-reclaimable
    orphans, never silently merged."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    t = str(tmp_path / "tbl")
    versioned.commit(spark, t, docs.where(F.col("doc_id") < 10))

    # simulate the race: both writers planned against base version 0;
    # one commits v1 first, the second's O_EXCL manifest write loses
    loser = docs.where(F.col("doc_id") >= 490)
    versioned.commit(spark, t, docs.where(F.col("doc_id") < 15),
                     expect_base=0)
    with pytest.raises(versioned.CommitConflict):
        versioned.commit(spark, t, loser, expect_base=0)
    # retry on top of the new state succeeds as version 2
    assert versioned.commit(spark, t, loser) == 2


def test_rollback_is_a_new_version(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    t = str(tmp_path / "tbl")
    b0 = docs.where(F.col("doc_id") < 20)
    versioned.commit(spark, t, b0)
    versioned.commit(spark, t, docs.where(F.col("doc_id") >= 480),
                     mode="overwrite")

    v = versioned.rollback(spark, t, 0)
    assert v == 2
    assert _ids(versioned.read(spark, t)) == _ids(b0)
    # audit trail intact: the overwritten snapshot is still readable
    assert versioned.history(t)[1]["mode"] == "overwrite"


def test_vacuum_never_breaks_surviving_snapshots(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    t = str(tmp_path / "tbl")
    versioned.commit(spark, t, docs.where(F.col("doc_id") < 10))
    versioned.commit(spark, t, docs.where(F.col("doc_id") >= 495),
                     mode="overwrite")
    b2 = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    versioned.commit(spark, t, b2)

    want = _ids(versioned.read(spark, t))
    want_prev = _ids(versioned.read(spark, t, 1))
    # default retention keeps even unreferenced young files (an
    # in-flight commit's staged data looks exactly like an orphan)
    assert versioned.vacuum(t, keep_last=2) == 0
    deleted = versioned.vacuum(t, keep_last=2, retention_s=0)
    assert deleted > 0                     # v0's overwritten files died
    assert versioned.versions(t) == [1, 2]
    assert _ids(versioned.read(spark, t)) == want
    assert _ids(versioned.read(spark, t, 1)) == want_prev


def test_streaming_sink_exactly_once_under_replay(spark, sf_dir, tmp_path):
    """Failure-replay semantics: foreachBatch re-delivers a batch under
    the same id; the manifest's batch-id stamp must make the replay a
    no-op, so the data appears exactly once and the version history
    shows one snapshot per batch."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    t = str(tmp_path / "tbl")
    sink = versioned.streaming_sink(spark, t)

    b0 = docs.where(F.col("doc_id") < 25)
    b1 = docs.where((F.col("doc_id") >= 25) & (F.col("doc_id") < 50))
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)                            # replayed delivery
    sink(b0, 0)                            # late duplicate replay

    got = versioned.read(spark, t)
    assert got.count() == 50
    assert _ids(got) == _ids(b0.unionByName(b1))
    assert [h["version"] for h in versioned.history(t)] == [0, 1]
    assert versioned.committed_batch_ids(t) == {0, 1}


def test_torn_manifest_write_is_invisible(spark, sf_dir, tmp_path):
    """A crash mid-manifest-write must not brick the table: the
    publish protocol writes+fsyncs a temp file and hard-links it into
    place, so a leftover .tmp.json is never treated as a version."""
    import os
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    t = str(tmp_path / "tbl")
    versioned.commit(spark, t, docs.where(F.col("doc_id") < 10))
    # simulate the torn write: a partial temp manifest on disk
    torn = versioned._manifest_path(t, 1) + ".deadbeef.tmp.json"
    open(torn, "w").write('{"version": 1, "files": [')   # truncated
    assert versioned.versions(t) == [0]                  # ignored
    v = versioned.commit(spark, t, docs.where(F.col("doc_id") >= 495))
    assert v == 1
    assert versioned.read(spark, t).count() == 15


def test_incremental_recovers_from_crashed_swap(spark, sf_dir, tmp_path):
    """Crash window between moving the old state aside and publishing
    the new one: the .prev backup must be restored, not silently
    dropped (which would re-initialize history from one batch)."""
    import os
    from mvp_mini_etl_pipeline_1762911573_spark.plans import incremental
    docs = load(spark, sf_dir, "documents")
    state_path = str(tmp_path / "state")
    b0 = docs.where(F.col("doc_id") < 200)
    b1 = docs.where(F.col("doc_id") >= 200)
    incremental.refresh(spark, state_path, b0)
    # simulate the crash: state moved aside, new state never landed
    os.rename(state_path, state_path + ".prev")
    got = incremental.refresh(spark, state_path, b1)
    want = incremental.batch_state(docs)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
