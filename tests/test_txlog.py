"""Transaction-log parquet table: atomicity, snapshot isolation, time
travel, optimistic concurrency, merge, vacuum (sources/txlog.py)."""

from __future__ import annotations

import os

import pytest

from datalake_brief_spark.sources import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string, version int")


class TestTxLog:
    def test_append_and_read(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v1 = txlog.append(_df(spark, [(1, "a", 1), (2, "b", 1)]), path)
        v2 = txlog.append(_df(spark, [(3, "c", 1)]), path)
        assert (v1, v2) == (1, 2)
        got = {r.id for r in txlog.read(spark, path).collect()}
        assert got == {1, 2, 3}

    def test_time_travel_and_overwrite(self, spark, tmp_path):
        path = str(tmp_path / "t")
        txlog.append(_df(spark, [(1, "a", 1)]), path)
        txlog.overwrite(_df(spark, [(9, "z", 2)]), path)
        assert {r.id for r in txlog.read(spark, path).collect()} == {9}
        assert {r.id for r in txlog.read(spark, path, version=1).collect()} == {1}
        assert txlog.current_version(path) == 2

    def test_uncommitted_files_are_invisible(self, spark, tmp_path):
        """Atomicity: data files landed without a commit (a writer that died
        mid-transaction) must not appear in any read."""
        path = str(tmp_path / "t")
        txlog.append(_df(spark, [(1, "a", 1)]), path)
        # simulate a torn write: data group exists, no commit references it
        txlog._write_data_files(_df(spark, [(666, "junk", 1)]), path)
        got = {r.id for r in txlog.read(spark, path).collect()}
        assert got == {1}

    def test_commit_conflict_detected_and_appends_retry(self, spark, tmp_path):
        path = str(tmp_path / "t")
        txlog.append(_df(spark, [(1, "a", 1)]), path)
        # another writer steals version 2 out from under an overwrite
        txlog._try_commit(path, 2, [], [])
        with pytest.raises(txlog.CommitConflict):
            txlog._try_commit(path, 2, [], [])
        # blind append retries past the stolen version
        v = txlog.append(_df(spark, [(2, "b", 1)]), path)
        assert v == 3
        assert {r.id for r in txlog.read(spark, path).collect()} == {1, 2}

    def test_merge_latest_wins_is_one_commit(self, spark, tmp_path):
        path = str(tmp_path / "t")
        txlog.append(_df(spark, [(1, "a", 1), (2, "b", 1)]), path)
        pre = txlog.current_version(path)
        txlog.merge(
            spark,
            path,
            _df(spark, [(2, "b2", 2), (3, "c", 1)]),
            keys=["id"],
            order_col="version",
        )
        assert txlog.current_version(path) == pre + 1
        got = {r.id: r.v for r in txlog.read(spark, path).collect()}
        assert got == {1: "a", 2: "b2", 3: "c"}
        # snapshot isolation: pre-merge version still readable
        old = {r.id: r.v for r in txlog.read(spark, path, version=pre).collect()}
        assert old == {1: "a", 2: "b"}

    def test_vacuum_drops_only_unreferenced_files(self, spark, tmp_path):
        path = str(tmp_path / "t")
        txlog.append(_df(spark, [(1, "a", 1)]), path)
        txlog.overwrite(_df(spark, [(2, "b", 1)]), path)
        live_before = set(txlog.visible_files(path))
        deleted = txlog.vacuum(path, retain_versions=1)
        assert deleted, "the overwritten v1 files should be vacuumed"
        assert set(txlog.visible_files(path)) == live_before
        assert {r.id for r in txlog.read(spark, path).collect()} == {2}
        for rel in deleted:
            assert not os.path.exists(os.path.join(path, rel))
        # time travel to the vacuumed version is gone — documented behavior
        with pytest.raises(Exception):
            txlog.read(spark, path, version=1).collect()
