"""Round-11 additions (VERDICT r10 asks): log retention + the
``_last_checkpoint`` pointer (ask #1), identity-column MERGE INSERT via
per-attempt watermark reservation (ask #3), the persisted merge rewrite
frame (ask #4), scoped ``OPTIMIZE ZORDER ... WHERE`` (ask #5), and the
streaming ``schemaTrackingLocation`` restart (ask #6)."""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from datalake_brief_spark.sources import logstore, txlog


def _fresh(prefix="r11_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _batch(spark, n=10, tag=0):
    return (
        spark.range(n)
        .withColumnRenamed("id", "k")
        .withColumn("batch", F.lit(tag).cast("int"))
    )


class TestLastCheckpointPointer:
    def test_pointer_written_with_each_checkpoint_and_monotonic(self, spark):
        path = _fresh()
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path)
        assert txlog._pointer_version(path) == 20
        # pointer resolves the tip without listing: poison list_dir and
        # verify current_version still answers through probe-only reads
        store = logstore.for_path(path)
        real_list = store.list_dir
        calls = []

        def spy(d):
            calls.append(d)
            return real_list(d)

        store.list_dir = spy
        try:
            assert txlog.current_version(path) == 25
            assert txlog.visible_files(path)  # _replay pointer path
            assert calls == [], "pointer-accelerated resolution listed the log dir"
        finally:
            store.list_dir = real_list

    def test_torn_pointer_falls_back_to_listing(self, spark):
        path = _fresh()
        for i in range(12):
            txlog.append(_batch(spark, tag=i), path)
        with open(txlog._last_checkpoint_path(path), "w") as f:
            f.write("{not json")
        assert txlog.current_version(path) == 12
        assert txlog.read(spark, path).count() == 120

    def test_stale_pointer_to_reclaimed_checkpoint_falls_back(self, spark):
        path = _fresh()
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path)
        # hand-regress the pointer to a checkpoint, then delete that
        # checkpoint marker (simulates a crashed expire + stale pointer)
        with open(txlog._last_checkpoint_path(path), "w") as f:
            json.dump({"version": 10}, f)
        os.remove(txlog._checkpoint_path(path, 10))
        assert txlog.read(spark, path).count() == 250

    def test_time_travel_below_pointer_uses_older_checkpoint(self, spark):
        path = _fresh()
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path)
        assert txlog.read(spark, path, version=15).count() == 150


class TestExpireLog:
    def _table(self, spark, n_commits=25):
        path = _fresh("r11exp_")
        for i in range(n_commits):
            txlog.append(_batch(spark, tag=i), path, stats_cols=["k"])
        return path

    def test_expire_reclaims_below_horizon_and_reads_unaffected(self, spark):
        path = self._table(spark)
        pre = txlog.read(spark, path).count()
        dry = txlog.expire_log(path, retain_versions=10, dry_run=True)
        assert dry  # preview names the reclaimable files
        assert all(os.path.exists(os.path.join(path, "_txlog", b)) for b in dry)
        rec = txlog.expire_log(path, retain_versions=10)
        assert rec == dry
        assert txlog._versions(path)[0] == 10  # horizon = checkpoint ≤ tip-9
        assert txlog.read(spark, path).count() == pre
        assert txlog.fast_count(path) == pre
        assert txlog.read(spark, path, version=10).count() == 100
        assert txlog.table_changes(spark, path, 10, 12).count() == 20
        assert min(h["version"] for h in txlog.history(path)) == 10

    def test_below_horizon_fails_with_named_floor(self, spark):
        path = self._table(spark)
        txlog.expire_log(path, retain_versions=10)
        with pytest.raises(FileNotFoundError, match="earliest readable version is 10"):
            txlog.read(spark, path, version=3)
        with pytest.raises(FileNotFoundError, match="earliest readable"):
            txlog.fast_count(path, version=9)
        with pytest.raises(FileNotFoundError, match="earliest readable"):
            txlog.table_changes(spark, path, 2, 5)
        with pytest.raises(FileNotFoundError, match="earliest readable"):
            txlog.restore(path, 3, spark)

    def test_expire_is_idempotent_and_age_constraint_holds(self, spark):
        path = self._table(spark)
        assert txlog.expire_log(path, retain_versions=10)
        assert txlog.expire_log(path, retain_versions=10) == []
        # everything is seconds old: an age floor of 1h expires nothing
        assert (
            txlog.expire_log(path, retain_versions=1, retain_age=dt.timedelta(hours=1))
            == []
        )
        # age 0 + retain 1: horizon advances to the newest checkpoint
        assert txlog.expire_log(path, retain_versions=1, retain_age=dt.timedelta(0))
        assert txlog._versions(path)[0] == 20

    def test_expire_and_vacuum_compose(self, spark):
        path = _fresh("r11expvac_")
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path, stats_cols=["k"])
        txlog.delete_where(spark, path, F.col("batch") < 3)
        txlog.optimize(spark, path, target_file_bytes=1 << 30)
        expect = txlog.read(spark, path).count()
        txlog.expire_log(path, retain_versions=5)
        txlog.vacuum(path, retain_versions=1)
        assert txlog.read(spark, path).count() == expect
        # and the other order on a fresh table
        path2 = _fresh("r11vacexp_")
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path2, stats_cols=["k"])
        txlog.vacuum(path2, retain_versions=1)
        txlog.expire_log(path2, retain_versions=5)
        assert txlog.read(spark, path2).count() == 250

    def test_first_expiry_declares_log_retention_reader_feature(
        self, spark, monkeypatch
    ):
        """ADVICE r11: expiry is an irreversible layout change — gate it
        with a reader feature like DVs/column-mapping so pre-floor-check
        builds refuse the table instead of replaying a partial prefix."""
        path = self._table(spark)
        assert "log-retention" not in set(
            txlog.table_protocol(path).get("reader_features", [])
        )
        tip = txlog.current_version(path)
        assert txlog.expire_log(path, retain_versions=10)
        feats = set(txlog.table_protocol(path).get("reader_features", []))
        assert "log-retention" in feats
        assert txlog.current_version(path) == tip + 1  # one declaring commit
        # idempotent: a second effective expiry adds no protocol commit
        assert txlog.expire_log(path, retain_versions=5)
        assert txlog.current_version(path) == tip + 1
        assert txlog.read(spark, path).count() == 250
        # an "old build" (feature absent from its supported set) refuses
        # the whole table rather than mis-reading the reclaimed log
        monkeypatch.setattr(
            txlog,
            "_READER_FEATURES",
            txlog._READER_FEATURES - {"log-retention"},
        )
        with pytest.raises(ValueError, match="log-retention"):
            txlog.read(spark, path)

    def test_dry_run_and_noop_expiry_declare_nothing(self, spark):
        path = self._table(spark)
        tip = txlog.current_version(path)
        txlog.expire_log(path, retain_versions=10, dry_run=True)
        assert txlog.expire_log(path, retain_versions=25) == []  # no-op
        assert txlog.current_version(path) == tip
        assert "log-retention" not in set(
            txlog.table_protocol(path).get("reader_features", [])
        )

    def test_young_table_without_checkpoint_is_noop(self, spark):
        path = _fresh("r11young_")
        for i in range(4):
            txlog.append(_batch(spark, tag=i), path)
        assert txlog.expire_log(path, retain_versions=1) == []
        assert txlog.read(spark, path).count() == 40

    def test_needs_constraint(self, spark):
        path = _fresh("r11arg_")
        txlog.append(_batch(spark), path)
        with pytest.raises(ValueError, match="retain_versions and/or retain_age"):
            txlog.expire_log(path)
        with pytest.raises(ValueError, match=">= 1"):
            txlog.expire_log(path, retain_versions=0)

    def test_crash_mid_expire_fails_loudly_not_stale(self, spark):
        """A crashed expire_log leaves an ascending PREFIX of deleted
        commits (it reclaims commits in ascending order). A read inside
        the surviving un-anchored band — above the first surviving
        commit but below every surviving checkpoint — must raise the
        floor error, never silently replay from empty state at vs[0]
        (the round-11 advisor reproduced exactly that partial snapshot:
        commits 1-5 gone, checkpoint at 10, read(version=8) returned 3
        files instead of 8)."""
        path = self._table(spark, n_commits=15)
        for v in range(1, 6):
            os.remove(txlog._commit_path(path, v))
        # un-anchored band: no checkpoint at-or-below 6..9
        with pytest.raises(FileNotFoundError, match="expired-log horizon"):
            txlog.read(spark, path, version=8)
        with pytest.raises(FileNotFoundError, match="expired-log horizon"):
            txlog.read(spark, path, version=6)
        # anchored reads are unaffected: checkpoint 10 covers >= 10
        assert txlog.read(spark, path, version=10).count() == 100
        assert txlog.read(spark, path).count() == 150
        # crash even earlier — before any checkpoint anchor survives:
        # a LATEST read must also fail loudly, not return 10 commits of
        # state as if they were the whole table
        os.remove(txlog._last_checkpoint_path(path))
        os.remove(txlog._checkpoint_path(path, 10))
        with pytest.raises(FileNotFoundError, match="expired-log horizon"):
            txlog.read(spark, path)

    def test_interior_hole_still_fails_loudly(self, spark):
        """Defense in depth: an interior hole (not a shape expire_log
        produces, but e.g. manual tampering) keeps raising too."""
        path = self._table(spark, n_commits=15)
        os.remove(txlog._commit_path(path, 3))
        os.remove(txlog._last_checkpoint_path(path))
        os.remove(txlog._checkpoint_path(path, 10))
        with pytest.raises(FileNotFoundError, match="expired-log horizon"):
            txlog.read(spark, path, version=7)

    def test_streaming_source_unaffected_above_horizon(self, spark):
        from datalake_brief_spark.streaming.source import register_txlog_source

        path = self._table(spark)
        txlog.expire_log(path, retain_versions=10)
        register_txlog_source(spark)
        got = (
            spark.readStream.format("txlog")
            .option("path", path)
            .option("startingVersion", 10)
            .load()
        )
        q = (
            got.writeStream.format("memory")
            .queryName("r11_exp_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n = spark.sql("SELECT count(*) c FROM r11_exp_stream").collect()[0]["c"]
        # versions 10..25 inclusive = 16 commits x 10 rows
        assert n == 160


class TestIdentityMergeInsert:
    """VERDICT r10 ask #3: MERGE INSERT into identity tables via the
    per-attempt watermark reservation inside _commit_serializable."""

    def _table(self, spark, start=100, step=3):
        path = _fresh("r11idm_")
        txlog.add_identity_column(path, "rid", start=start, step=step)
        txlog.append(
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "k int, val string"
            ).repartition(2),
            path,
            stats_cols=["k"],
        )
        return path

    def test_insert_allocates_unique_on_lattice_fresh_ids(self, spark):
        path = self._table(spark)
        wm_pre = txlog.latest_meta(path, "identity")["rid"]["next"]
        pre = {r.k: r.rid for r in txlog.read(spark, path).collect()}
        src = spark.createDataFrame(
            [(2, "B"), (4, "d"), (5, "e")], "k int, val string"
        )
        v = txlog.merge_into(
            spark,
            path,
            src,
            keys=["k"],
            when_matched=[("update", {"val": "s.val"})],
            when_not_matched=True,
        )
        rows = {r.k: (r.val, r.rid) for r in txlog.read(spark, path).collect()}
        assert rows[2] == ("B", pre[2])  # matched row KEEPS its id
        ids = [rid for _, rid in rows.values()]
        assert len(set(ids)) == 5
        for k in (4, 5):
            rid = rows[k][1]
            assert rid >= wm_pre  # fresh above the pre-merge watermark
            assert (rid - 100) % 3 == 0  # on the start/step lattice
        assert txlog.latest_meta(path, "identity")["rid"]["next"] > max(ids)
        # the merge commit's change feed carries the inserted ids
        ch = {(r.k, r._change_type): r.rid for r in txlog.table_changes(spark, path, v - 1, v).collect()}
        assert ch[(4, "insert")] == rows[4][1]

    def test_two_writer_race_relands_with_fresh_ids(self, spark):
        """A concurrent identity append between the merge's file land and
        its commit must advance the watermark; the merge's retry re-lands
        the insert files with fresh ids — never duplicates, never refusal."""
        path = self._table(spark)
        orig = txlog._try_commit
        state = {"raced": False}

        def racing(path_, version, *a, **kw):
            if not state["raced"] and kw.get("meta", {}).get("op") == "merge":
                state["raced"] = True
                txlog._try_commit = orig
                try:
                    txlog.append(
                        spark.createDataFrame([(9, "z")], "k int, val string"),
                        path,
                    )
                finally:
                    txlog._try_commit = racing
            return orig(path_, version, *a, **kw)

        txlog._try_commit = racing
        try:
            txlog.merge_into(
                spark,
                path,
                spark.createDataFrame([(7, "g"), (8, "h")], "k int, val string"),
                keys=["k"],
                when_not_matched=True,
            )
        finally:
            txlog._try_commit = orig
        assert state["raced"]
        rows = {r.k: r.rid for r in txlog.read(spark, path).collect()}
        assert len(rows) == 6 and len(set(rows.values())) == 6
        assert all((rid - 100) % 3 == 0 for rid in rows.values())

    def test_always_mode_rejections(self, spark):
        path = self._table(spark)
        with_id = txlog.read(spark, path).limit(1)
        with pytest.raises(ValueError, match="ALWAYS AS IDENTITY"):
            txlog.merge_into(spark, path, with_id, keys=["k"], when_not_matched=True)
        src = spark.createDataFrame([(2, "B")], "k int, val string")
        with pytest.raises(ValueError, match="must not assign"):
            txlog.merge_into(
                spark, path, src, keys=["k"],
                when_matched=[("update", {"rid": "t.rid + 1"})],
            )
        with pytest.raises(ValueError, match="must not supply"):
            txlog.merge_into(
                spark, path, src, keys=["k"],
                when_not_matched=("insert", {"k": "s.k", "rid": "s.k"}),
            )

    def test_insert_only_merge_and_replay_noop(self, spark):
        path = self._table(spark)
        src = spark.createDataFrame([(6, "f")], "k int, val string")
        txlog.merge_into(spark, path, src, keys=["k"], when_not_matched=True)
        v0 = txlog.current_version(path)
        # re-delivered batch: all keys present, conditioned update fires
        # nowhere -> provably-empty merge commits NOTHING (replay no-op)
        v1 = txlog.merge_into(
            spark,
            path,
            src,
            keys=["k"],
            when_matched=[("update", {"val": "s.val"}, "t.val <> s.val")],
            when_not_matched=True,
        )
        assert v1 == v0
        rows = {r.k: r.rid for r in txlog.read(spark, path).collect()}
        assert len(set(rows.values())) == 4

    def test_identity_with_generated_column_insert(self, spark):
        """A generated column whose expression references the identity
        column must compute AFTER the per-attempt assignment (the factory
        orders identity → generated → constraints)."""
        path = _fresh("r11idg_")
        txlog.add_identity_column(path, "rid", start=10, step=1)
        txlog.add_generated_column(
            path, "rid2", "rid * CAST(2 AS BIGINT)", "bigint"
        )
        txlog.append(
            spark.createDataFrame([(1, "a")], "k int, val string"), path
        )
        txlog.merge_into(
            spark,
            path,
            spark.createDataFrame([(5, "e")], "k int, val string"),
            keys=["k"],
            when_not_matched=True,
        )
        rows = {r.k: r for r in txlog.read(spark, path).collect()}
        assert rows[5].rid2 == rows[5].rid * 2
        assert rows[1].rid2 == rows[1].rid * 2
        assert rows[1].rid != rows[5].rid


class TestScopedZorderWhere:
    """VERDICT r10 ask #5: OPTIMIZE ZORDER ... WHERE — re-cluster one hot
    band without rewriting cold history."""

    def _table(self, spark):
        path = _fresh("r11zw_")
        import random

        rng = random.Random(11)
        for band in range(4):
            rows = [
                (band * 1000 + rng.randrange(1000), rng.randrange(1000), i)
                for i in range(400)
            ]
            txlog.append(
                spark.createDataFrame(rows, "x long, y long, i long").repartition(3),
                path,
                stats_cols=["x", "y"],
            )
        return path

    def test_band_rewritten_cold_files_byte_identical(self, spark):
        path = self._table(spark)
        pre = {
            p: os.path.getmtime(p) for p in txlog.visible_files(path)
        }
        expect = sorted(txlog.read(spark, path).collect())
        v = txlog.optimize_zorder(
            spark, path, ["x", "y"], n_files=4, prune_col="x", lo=3000, hi=3999
        )
        assert v == txlog.current_version(path)
        post = txlog.visible_files(path)
        survivors = [p for p in post if p in pre]
        fresh = [p for p in post if p not in pre]
        # three cold bands' files survive untouched (same paths, same mtime)
        assert len(survivors) == 9
        assert all(os.path.getmtime(p) == pre[p] for p in survivors)
        assert len(fresh) == 4
        # content identical
        assert sorted(txlog.read(spark, path).collect()) == expect

    def test_scoped_rewrite_improves_pruning_on_both_dims_in_band(self, spark):
        path = self._table(spark)
        n_all = len(txlog.visible_files(path))
        txlog.optimize_zorder(
            spark, path, ["x", "y"], n_files=4, prune_col="x", lo=3000, hi=3999
        )
        # point-ish reads inside the band prune on BOTH clustered dims
        stats = txlog.visible_stats(path)
        in_band = [
            rel for rel, s in stats.items() if s.get("x") and s["x"][0] >= 3000
        ]
        assert len(in_band) == 4
        # y-stats exist on the fresh band files -> a y-range scopes to a
        # strict subset of the band (Morton clustering makes y selective)
        import datalake_brief_spark.sources.txlog as t

        kept = [
            rel
            for rel in in_band
            if not t._range_excludes(stats[rel].get("y"), 0, 99)
        ]
        assert 0 < len(kept) < 4
        got = txlog.read_pruned_multi(
            spark, path, {"x": (3000, 3999), "y": (0, 99)}
        )
        expect = [
            r
            for r in txlog.read(spark, path).collect()
            if 3000 <= r.x <= 3999 and 0 <= r.y <= 99
        ]
        assert sorted(
            (r.x, r.y, r.i)
            for r in got.filter("x >= 3000 and x <= 3999 and y <= 99").collect()
        ) == sorted((r.x, r.y, r.i) for r in expect)

    def test_empty_band_is_noop(self, spark):
        path = self._table(spark)
        v0 = txlog.current_version(path)
        assert (
            txlog.optimize_zorder(
                spark, path, ["x", "y"], n_files=2, prune_col="x", lo=99000, hi=99999
            )
            == v0
        )

    def test_scoped_zorder_applies_deletion_vectors(self, spark):
        path = self._table(spark)
        txlog.delete_where_dv(spark, path, F.col("x").between(3000, 3099))
        expect = sorted(txlog.read_mor(spark, path).collect())
        txlog.optimize_zorder(
            spark, path, ["x", "y"], n_files=4, prune_col="x", lo=3000, hi=3999
        )
        assert sorted(txlog.read(spark, path).collect()) == expect


class TestSchemaTrackingRestart:
    """VERDICT r10 ask #6: the Delta ``schemaTrackingLocation`` analog —
    a mid-stream rename/drop fails the stream (correct default), but a
    plain RESTART with the option resumes from the failure offset
    rendering the backlog under the new logical schema."""

    #: foreachBatch sink store — the memory sink cannot RECOVER from a
    #: checkpoint, and recovery is exactly what these tests exercise
    _SINK: dict = {}

    def _drain(self, spark, path, loc, ck, name, cdf=False):
        rows = self._SINK.setdefault(name, [])
        reader = (
            spark.readStream.format("txlog")
            .option("path", path)
            .option("schemaTrackingLocation", loc)
        )
        if cdf:
            reader = reader.option("readChangeFeed", "true")
        got = reader.load()
        q = (
            got.writeStream.foreachBatch(
                lambda df, _eid: rows.extend(df.collect())
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        # contention-proof drain (VERDICT r12 ask #5): poll until the
        # availableNow trigger terminates instead of a single wall-time
        # budget — a loadavg-8 box can stretch micro-batches well past a
        # fixed 180 s, and the old silent timeout returned a PARTIAL sink
        # that failed the assertions downstream. A still-active query
        # after the (generous) ceiling fails LOUDLY here instead.
        import time as _time

        deadline = _time.monotonic() + 600
        while q.isActive and _time.monotonic() < deadline:
            try:
                q.awaitTermination(5)
            except Exception:
                break  # stream failed: exception() below reports it
        if q.isActive:
            q.stop()
            raise AssertionError(
                "availableNow stream did not drain within the 600 s ceiling"
            )
        exc = q.exception()
        q.stop()
        return exc

    def test_restart_resumes_under_new_schema(self, spark):
        from datalake_brief_spark.streaming.source import register_txlog_source

        register_txlog_source(spark)
        path = _fresh("r11st_")
        loc = tempfile.mkdtemp(prefix="r11stloc_")
        ck = tempfile.mkdtemp(prefix="r11stck_")
        txlog.append(
            spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string"), path
        )
        # run 1: drains the backlog at the original schema
        assert self._drain(spark, path, loc, ck, "r11_track1") is None
        pre = self._SINK["r11_track1"]
        assert {(r.k, r.val) for r in pre} == {(1, "a"), (2, "b")}
        # mid-stream (stream stopped, offset checkpointed): rename + more data
        txlog.rename_column(path, "val", "v2")
        txlog.append(
            spark.createDataFrame([(3, "c")], "k int, v2 string"), path
        )
        # run 2: FAILS at the mapping commit, records the new schema
        exc = self._drain(spark, path, loc, ck, "r11_track2")
        assert exc is not None and "schemaTrackingLocation" in str(exc)
        assert self._SINK["r11_track2"] == []  # the failed batch emitted nothing
        # run 3: plain restart, same checkpoint — drains the backlog at
        # the NEW logical schema; nothing re-emitted, nothing lost
        assert self._drain(spark, path, loc, ck, "r11_track3") is None
        post = self._SINK["r11_track3"]
        assert {(r.k, r.v2) for r in post} == {(3, "c")}

    def test_without_tracking_still_fails_unconditionally(self, spark):
        from datalake_brief_spark.streaming.source import register_txlog_source

        register_txlog_source(spark)
        path = _fresh("r11st0_")
        txlog.append(
            spark.createDataFrame([(1, "a")], "k int, val string"), path
        )
        txlog.rename_column(path, "val", "v2")
        with pytest.raises(Exception, match="column mapping"):
            (
                spark.readStream.format("txlog")
                .option("path", path)
                .load()
            )

    def test_drop_column_tracks_and_resumes(self, spark):
        from datalake_brief_spark.streaming.source import register_txlog_source

        register_txlog_source(spark)
        path = _fresh("r11st2_")
        loc = tempfile.mkdtemp(prefix="r11st2loc_")
        ck = tempfile.mkdtemp(prefix="r11st2ck_")
        txlog.append(
            spark.createDataFrame([(1, "a", 5)], "k int, val string, n int"), path
        )
        assert self._drain(spark, path, loc, ck, "r11_drop1") is None
        txlog.drop_column(path, "n")
        txlog.append(
            spark.createDataFrame([(2, "b")], "k int, val string"), path
        )
        exc = self._drain(spark, path, loc, ck, "r11_drop2")
        assert exc is not None
        assert self._drain(spark, path, loc, ck, "r11_drop3") is None
        post = self._SINK["r11_drop3"]
        assert {tuple(r) for r in post} == {(2, "b")}
        assert "n" not in post[0].asDict()

    def test_cdf_stream_tracks_and_resumes(self, spark):
        from datalake_brief_spark.streaming.source import register_txlog_source

        register_txlog_source(spark)
        path = _fresh("r11st3_")
        loc = tempfile.mkdtemp(prefix="r11st3loc_")
        ck = tempfile.mkdtemp(prefix="r11st3ck_")
        txlog.append(
            spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string"), path
        )

        assert self._drain(spark, path, loc, ck, "r11_cdf1", cdf=True) is None
        txlog.rename_column(path, "val", "v2")
        txlog.delete_where(spark, path, F.col("k") == 1)
        assert self._drain(spark, path, loc, ck, "r11_cdf2", cdf=True) is not None
        assert self._drain(spark, path, loc, ck, "r11_cdf3", cdf=True) is None
        rows = self._SINK["r11_cdf3"]
        # the CoW delete renders under the NEW schema: pre-image of k=1
        assert {(r.k, r.v2, r._change_type) for r in rows} == {(1, "a", "delete")}


class TestPointerHotPath:
    def test_latest_meta_rides_pointer_without_listing(self, spark):
        """latest_meta runs on every logical-view build; with a valid
        pointer it must resolve meta (tail walk + marker fold) with ZERO
        log-directory listings."""
        path = _fresh("r11lm_")
        for i in range(23):
            txlog.append(_batch(spark, tag=i), path)
        store = logstore.for_path(path)
        real_list = store.list_dir
        calls = []
        store.list_dir = lambda d: (calls.append(d), real_list(d))[1]
        try:
            schema = txlog.latest_meta(path, "schema")
            assert schema and "k" in schema
            assert calls == [], "latest_meta listed the log dir under a pointer"
        finally:
            store.list_dir = real_list

    def test_describe_detail_reports_log_lifecycle(self, spark):
        path = _fresh("r11dd_")
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path)
        d = txlog.describe_detail(path)
        assert d["last_checkpoint_version"] == 20
        assert d["log_earliest_version"] == 1
        txlog.expire_log(path, retain_versions=10)
        d2 = txlog.describe_detail(path)
        assert d2["log_earliest_version"] == 10
        assert d2["num_rows"] == d["num_rows"]


class TestStreamBelowHorizon:
    def test_stream_offset_below_expiry_horizon_names_floor(self, spark):
        """A consumer down longer than the log retention: its checkpointed
        offset points below the expire_log horizon — the stream must fail
        with the named floor + recovery guidance, never a raw missing-file
        error."""
        from datalake_brief_spark.streaming.source import register_txlog_source

        register_txlog_source(spark)
        path = _fresh("r11sbh_")
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path)
        txlog.expire_log(path, retain_versions=10)
        got = (
            spark.readStream.format("txlog")
            .option("path", path)
            .option("startingVersion", 3)  # below the horizon (floor=10)
            .load()
        )
        q = (
            got.writeStream.format("memory")
            .queryName("r11_below_horizon")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        exc = q.exception()
        q.stop()
        assert exc is not None
        assert "earliest readable version is 10" in str(exc)
        assert "startingVersion" in str(exc)


class TestMaxFilesPerTrigger:
    def test_backlog_drains_in_file_bounded_batches(self, spark):
        """maxFilesPerTrigger (the Delta knob): a backlog of 6 commits x 3
        files drains in batches of at most ~4 files (>= 1 commit per batch
        for progress) — bounding DATA per trigger, not just commit count."""
        from datalake_brief_spark.streaming.source import register_txlog_source

        register_txlog_source(spark)
        path = _fresh("r11mft_")
        ck = tempfile.mkdtemp(prefix="r11mftck_")
        for i in range(6):
            txlog.append(_batch(spark, n=9, tag=i).repartition(3), path)
        stream = (
            spark.readStream.format("txlog")
            .options(path=path, maxFilesPerTrigger="4")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("r11_mft")
            .outputMode("append")
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("SELECT count(*) c FROM r11_mft").collect()[0]["c"]
            assert got == 54  # nothing lost
            batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
            # 6 commits / 2-commit cap (3 files + next commit reaches 4)
            assert len(batches) >= 3
            assert max(p["numInputRows"] for p in batches) <= 18  # <= 2 commits
        finally:
            q.stop()


class TestIdentityMergeCrossFeatures:
    def test_identity_insert_on_row_tracking_table(self, spark):
        """ins_factory + row tracking: the factory's per-attempt insert
        files must get row-base allocations (fresh stable ids) alongside
        their identity values, and matched rows keep BOTH identities."""
        path = _fresh("r11idrt_")
        txlog.add_identity_column(path, "rid", start=5, step=2)
        txlog.append(
            spark.createDataFrame([(1, "a"), (2, "b")], "k int, val string"), path
        )
        txlog.enable_row_tracking(path)
        pre = {
            r.k: (r.rid, r.row_id)
            for r in txlog.read_with_row_ids(spark, path).collect()
        }
        txlog.merge_into(
            spark,
            path,
            spark.createDataFrame([(2, "B"), (3, "c")], "k int, val string"),
            keys=["k"],
            when_matched=[("update", {"val": "s.val"})],
            when_not_matched=True,
        )
        post = {
            r.k: (r.rid, r.row_id, r.val)
            for r in txlog.read_with_row_ids(spark, path).collect()
        }
        assert post[2][:2] == pre[2][:2] and post[2][2] == "B"  # both ids stable
        assert post[1][:2] == pre[1][:2]
        rids = [v[0] for v in post.values()]
        rowids = [v[1] for v in post.values()]
        assert len(set(rids)) == 3 and len(set(rowids)) == 3
        assert post[3][0] not in {v[0] for v in pre.values()}
        assert post[3][1] not in {v[1] for v in pre.values()}
        assert (post[3][0] - 5) % 2 == 0  # identity lattice holds

    def test_restore_above_expiry_floor_still_works(self, spark):
        path = _fresh("r11rst_")
        for i in range(25):
            txlog.append(_batch(spark, tag=i), path)
        txlog.expire_log(path, retain_versions=10)
        # 25 appends + the feature-declaring commit (26) + restore (27)
        v = txlog.restore(path, 12, spark)
        assert v == 27
        assert txlog.read(spark, path).count() == 120


class TestCheckpointNow:
    def test_manual_checkpoint_enables_expiry_anywhere(self, spark):
        """checkpoint_now: the retention horizon can only be a checkpoint;
        a forced one at the tip lets expire_log reclaim a long
        un-checkpointed tail on demand."""
        path = _fresh("r11cn_")
        for i in range(17):  # cadence checkpoint at 10 only
            txlog.append(_batch(spark, tag=i), path)
        assert txlog.checkpoint_now(path) == 17
        assert txlog._pointer_version(path) == 17
        assert txlog.checkpoint_now(path) == 17  # idempotent
        txlog.expire_log(path, retain_versions=1)
        assert txlog._versions(path)[0] == 17
        assert txlog.read(spark, path).count() == 170
        assert txlog.checkpoint_now(_fresh("r11cn0_")) == 0  # empty log

    def test_pointer_resolves_multipart_checkpoint(self, spark):
        """The pointer fast path must load a MULTI-PART checkpoint (marker
        + parquet parts) exactly like the listing path."""
        path = _fresh("r11mp_")
        for i in range(3):
            txlog.append(_batch(spark, n=50, tag=i).repartition(2), path)
        old = txlog._CHECKPOINT_MULTIPART_MIN_FILES
        txlog._CHECKPOINT_MULTIPART_MIN_FILES = 1  # force parts
        try:
            assert txlog.checkpoint_now(path) == 3
        finally:
            txlog._CHECKPOINT_MULTIPART_MIN_FILES = old
        store = logstore.for_path(path)
        real_list = store.list_dir
        calls = []
        store.list_dir = lambda d: (calls.append(d), real_list(d))[1]
        try:
            assert txlog.read(spark, path).count() == 150
            assert txlog.fast_count(path) == 150
            assert calls == []
        finally:
            store.list_dir = real_list
