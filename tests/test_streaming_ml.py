"""Streaming (watermark + windowed counts + threshold alerts) and the ML
micro-pipeline (reference pyspark-3.ipynb shape with mandatory seeds)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.mlops import assemble_features, fit_linear_regression, train_test_split
from datalake_brief_spark.streaming import (
    alerts_to_parquet,
    dedup_stream,
    enrich_stream,
    running_user_stats,
    sessionize_stream,
    stream_events,
    threshold_alert_stream,
    windowed_counts,
)

from tests.conftest import SF_SMOKE


class TestStreaming:
    @pytest.fixture()
    def events_dir(self, spark, tmp_path):
        """Stage the events table as a file-stream source directory.

        load_table handles the ns→µs conversion, so re-land the converted
        table rather than copying the raw ns parquet."""
        out = str(tmp_path / "events_stream")
        load_table(spark, SF_SMOKE, "events").repartition(4).write.parquet(out)
        yield out
        shutil.rmtree(out, ignore_errors=True)

    def test_windowed_counts_match_batch(self, spark, events_dir):
        """Streaming windowed counts over the staged files must equal the
        batch group-by — same Catalyst semantics, incremental execution."""
        stream = stream_events(spark, events_dir)
        agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("wincounts")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (str(r.window_start), r.event_type): r.n
                for r in spark.sql("SELECT * FROM wincounts").collect()
            }
        finally:
            q.stop()

        batch = (
            spark.read.parquet(events_dir)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
        )
        want = {(str(r.window_start), r.event_type): r.n for r in batch.collect()}
        assert got == want

    def test_alerts_land_in_parquet_idempotently(self, spark, events_dir, tmp_path):
        """Durable alert sink: fired windows land once per epoch partition;
        the parquet contents equal the batch-computed fired set regardless
        of how many micro-batches the file source split the input into."""
        sink = str(tmp_path / "alerts")
        stream = stream_events(spark, events_dir)
        counts = windowed_counts(
            stream.filter(F.col("event_type") == "error"), window="1 hour"
        )
        q = alerts_to_parquet(counts, sink, threshold=2)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        landed = spark.read.parquet(sink)
        # update-mode re-emissions of the same window across epochs are
        # expected; the FINAL state per window must match batch truth
        final_per_window = (
            landed.groupBy("window_start").agg(F.max("n").alias("n")).collect()
        )
        got = {(str(r.window_start)): r.n for r in final_per_window}
        batch = (
            spark.read.parquet(events_dir)
            .filter(F.col("event_type") == "error")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
        )
        want = {str(r["w"]["start"]): r.n for r in batch.collect()}
        assert got == want
        assert got, "error volume must fire at least one alert window"

    def test_threshold_alert_fires(self, spark, events_dir):
        """Reference alert semantics (README.md:243-244): ≥N rows in the
        window ⇒ fire with severity."""
        fired: list = []
        stream = stream_events(spark, events_dir)
        counts = windowed_counts(
            stream.filter(F.col("event_type") == "error"), window="1 hour"
        )
        q = threshold_alert_stream(counts, threshold=1, on_alert=fired.extend, severity=1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert fired, "error events exist in every hour — alerts must fire"
        assert all(a.severity == 1 and a.n >= 1 for a in fired)


class TestStatefulStreaming:
    @pytest.fixture()
    def events_dir(self, spark, tmp_path):
        out = str(tmp_path / "events_stream")
        load_table(spark, SF_SMOKE, "events").repartition(4).write.parquet(out)
        yield out
        shutil.rmtree(out, ignore_errors=True)

    def test_session_window_stream_matches_batch(self, spark, events_dir):
        """Native session_window is the same expression in batch and stream —
        streaming complete-mode output must equal the batch evaluation."""
        stream = stream_events(spark, events_dir)
        q = (
            sessionize_stream(stream, gap="10 minutes")
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sessions")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r.user_id, str(r.session_start)): (r.n_events, round(r.total_value, 4))
                for r in spark.sql("SELECT * FROM sessions").collect()
            }
        finally:
            q.stop()
        batch = sessionize_stream(spark.read.parquet(events_dir), gap="10 minutes")
        want = {
            (r.user_id, str(r.session_start)): (r.n_events, round(r.total_value, 4))
            for r in batch.collect()
        }
        assert got == want
        assert got, "events table must produce sessions"

    def test_streaming_dedup_matches_batch(self, spark, tmp_path):
        """Exact dedup on a stream where every row lands twice (at-least-once
        redelivery shape): output keys must equal the batch dropDuplicates
        result, with no duplicates surviving."""
        src = str(tmp_path / "dup_events")
        ev = load_table(spark, SF_SMOKE, "events").limit(500).cache()
        ev.write.parquet(src)
        ev.write.mode("append").parquet(src)  # exact duplicate redelivery
        keys = ["user_id", "ts", "event_type"]
        stream = stream_events(spark, src)
        q = (
            dedup_stream(stream, keys)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("deduped")
            .start()
        )
        try:
            q.processAllAvailable()
            got = [
                (r.user_id, str(r.ts), r.event_type)
                for r in spark.sql("SELECT user_id, ts, event_type FROM deduped").collect()
            ]
        finally:
            q.stop()
        want = {
            (r.user_id, str(r.ts), r.event_type)
            for r in ev.dropDuplicates(keys).collect()
        }
        assert len(got) == len(set(got)), "duplicates survived the stream"
        assert set(got) == want
        ev.unpersist()

    def test_enrich_stream_static_join(self, spark, events_dir):
        """Stream-static broadcast join: every event picks up its dim row."""
        dim = spark.createDataFrame(
            [(i, f"tier_{i % 3}") for i in range(200)], "user_id long, tier string"
        )
        stream = stream_events(spark, events_dir)
        q = (
            enrich_stream(stream, dim, on="user_id")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("enriched")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT count(*) AS n, count(tier) AS with_tier FROM enriched"
            ).first()
        finally:
            q.stop()
        n_events = spark.read.parquet(events_dir).count()
        assert rows.n == n_events
        n_matched = (
            spark.read.parquet(events_dir).filter(F.col("user_id") < 200).count()
        )
        assert rows.with_tier == n_matched

    def test_running_user_stats_state_accumulates(self, spark, events_dir):
        """applyInPandasWithState: the last emitted row per user must carry
        the full running count/sum across all micro-batches (4 files →
        several batches; state survives between them)."""
        stream = stream_events(spark, events_dir)
        q = (
            running_user_stats(stream.select("user_id", "value"))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("userstats")
            .start()
        )
        try:
            q.processAllAvailable()
            per_user_max = {
                r.user_id: (r.n_events, round(r.total_value, 4))
                for r in spark.sql(
                    """
                    SELECT user_id, n_events, total_value FROM (
                      SELECT *, row_number() OVER (
                        PARTITION BY user_id ORDER BY n_events DESC) AS rn
                      FROM userstats
                    ) WHERE rn = 1
                    """
                ).collect()
            }
        finally:
            q.stop()
        batch = (
            spark.read.parquet(events_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        )
        want = {r.user_id: (r.n, r.total) for r in batch.collect()}
        assert per_user_max == want


class TestCheckpointRestart:
    def test_restart_from_checkpoint_no_reprocessing(self, spark, tmp_path):
        """Exactly-once across restarts: stop a checkpointed query, add new
        source files, restart with the same checkpoint — the sink must end
        up with each window's final count exactly once (old epochs not
        replayed into duplicates, new data picked up)."""
        import shutil as _shutil

        src = str(tmp_path / "cp_events")
        sink = str(tmp_path / "cp_alerts")
        ckpt = str(tmp_path / "cp_state")
        events = load_table(spark, SF_SMOKE, "events").filter(
            F.col("event_type") == "error"
        )
        # split by TIME, not randomly: the restart's new files must be newer
        # than the checkpointed watermark, else they are (correctly) dropped
        # as late data — which would test the watermark, not the restart.
        cutoff = events.agg(
            F.percentile(F.unix_seconds("ts"), F.lit(0.5)).alias("c")
        ).first().c
        first = events.filter(F.unix_seconds("ts") <= cutoff)
        second = events.filter(F.unix_seconds("ts") > cutoff)
        first.repartition(2).write.parquet(src)

        def run_until_drained():
            stream = stream_events(spark, src)
            counts = windowed_counts(stream, window="1 hour")

            def emit(batch_df, epoch_id):
                (
                    batch_df.filter(F.col("n") >= 1)
                    .withColumn("epoch", F.lit(epoch_id).cast("long"))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("epoch")
                    .parquet(sink)
                )

            q = (
                counts.writeStream.outputMode("update")
                .option("checkpointLocation", ckpt)
                .foreachBatch(emit)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        run_until_drained()
        n_epochs_first = (
            spark.read.parquet(sink).select("epoch").distinct().count()
        )
        # new files arrive while the query is DOWN; restart resumes from
        # the checkpoint and must process only the new files
        second.repartition(2).write.mode("append").parquet(src)
        run_until_drained()

        landed = spark.read.parquet(sink)
        assert landed.select("epoch").distinct().count() > n_epochs_first

        got = {
            str(r.window_start): r.n
            for r in landed.groupBy("window_start").agg(F.max("n").alias("n")).collect()
        }
        want = {
            str(r["w"]["start"]): r.n
            for r in spark.read.parquet(src)
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
        _shutil.rmtree(src, ignore_errors=True)


class TestStreamStreamJoin:
    def test_windowed_stream_stream_join_matches_batch(self, spark, tmp_path):
        """Stream-stream interval join (view→click within 10 min, same
        user): both sides watermarked so join state expires; streaming
        result must equal the same join run in batch."""
        import shutil as _shutil

        src = str(tmp_path / "ss_events")
        load_table(spark, SF_SMOKE, "events").repartition(4).write.parquet(src)
        try:
            views_s = (
                stream_events(spark, src)
                .filter(F.col("event_type") == "view")
                .select(
                    F.col("user_id").alias("v_user"),
                    F.col("ts").alias("v_ts"),
                    F.col("event_id").alias("v_id"),
                )
                .withWatermark("v_ts", "1 hour")
            )
            clicks_s = (
                stream_events(spark, src)
                .filter(F.col("event_type") == "click")
                .select(
                    F.col("user_id").alias("c_user"),
                    F.col("ts").alias("c_ts"),
                    F.col("event_id").alias("c_id"),
                )
                .withWatermark("c_ts", "1 hour")
            )
            cond = (
                (F.col("v_user") == F.col("c_user"))
                & (F.col("c_ts") >= F.col("v_ts"))
                & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES"))
            )
            q = (
                views_s.join(clicks_s, cond)
                .select("v_id", "c_id")
                .writeStream.outputMode("append")
                .format("memory")
                .queryName("ssjoin")
                .start()
            )
            try:
                q.processAllAvailable()
                got = {
                    (r.v_id, r.c_id) for r in spark.sql("SELECT * FROM ssjoin").collect()
                }
            finally:
                q.stop()

            ev = spark.read.parquet(src)
            views = ev.filter(F.col("event_type") == "view").select(
                F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
                F.col("event_id").alias("v_id"),
            )
            clicks = ev.filter(F.col("event_type") == "click").select(
                F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
                F.col("event_id").alias("c_id"),
            )
            want = {
                (r.v_id, r.c_id)
                for r in views.join(clicks, cond).select("v_id", "c_id").collect()
            }
            # watermark may drop some late pairs in streaming, never add:
            assert got <= want
            assert len(got) >= 0.9 * len(want), (len(got), len(want))
            assert want, "fixture must contain view→click pairs"
        finally:
            _shutil.rmtree(src, ignore_errors=True)


class TestMLPipeline:
    @pytest.fixture(scope="class")
    def people(self, spark):
        # reference pyspark-3.ipynb fixture shape (test1.csv): age/experience → salary
        rows = [
            ("Krish", 31, 10, 30000),
            ("Sudhanshu", 30, 8, 25000),
            ("Sunny", 29, 4, 20000),
            ("Paul", 24, 3, 20000),
            ("Harsha", 21, 1, 15000),
            ("Shubham", 23, 2, 18000),
        ]
        return spark.createDataFrame(rows, "name string, age int, experience int, salary int")

    def test_pipeline_shape_and_determinism(self, people):
        # reference pipeline: VectorAssembler → randomSplit → LR → evaluate
        # (pyspark-3.ipynb:124-137, 219-221, 270-314) — but seeded (M2).
        feats = assemble_features(people, ["age", "experience"], "features")
        assert "features" in feats.columns
        tr1, te1 = train_test_split(feats, (0.75, 0.25), seed=7)
        tr2, te2 = train_test_split(feats, (0.75, 0.25), seed=7)
        assert sorted(r.name for r in tr1.collect()) == sorted(r.name for r in tr2.collect())

        res = fit_linear_regression(tr1, te1, "features", "salary")
        assert len(res.coefficients) == 2
        assert res.mae >= 0 and res.mse >= 0
        assert "prediction" in res.predictions.columns

    def test_lr_recovers_exact_linear_relation(self, spark):
        # y = 1000*x1 + 500*x2 + 100 exactly → LR must recover it
        rows = [(float(a), float(b), 1000.0 * a + 500.0 * b + 100.0) for a in range(8) for b in range(4)]
        df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
        feats = assemble_features(df, ["x1", "x2"], "features")
        tr, te = train_test_split(feats, (0.8, 0.2), seed=11)
        res = fit_linear_regression(tr, te, "features", "y")
        assert res.coefficients[0] == pytest.approx(1000.0, abs=1e-4)
        assert res.coefficients[1] == pytest.approx(500.0, abs=1e-4)
        assert res.intercept == pytest.approx(100.0, abs=1e-3)
        assert res.mae == pytest.approx(0.0, abs=1e-5)


class TestNormalizeFeatures:
    def test_zscore_equals_standard_scaler(self, spark):
        """normalize_features('zscore') must equal
        ml.feature.StandardScaler(withMean=True, withStd=True) on the
        same column — the plan-expression form is a drop-in for the ml
        fit/transform pair."""
        from pyspark.ml.feature import StandardScaler

        from datalake_brief_spark.mlops import assemble_features, normalize_features

        rows = [(i, float(v)) for i, v in enumerate([3, 9, 1, 7, 5, 11, 2, 8])]
        df = spark.createDataFrame(rows, "id long, x double")
        ours = {
            r.id: r.x_norm
            for r in normalize_features(df, ["x"], method="zscore").collect()
        }
        feats = assemble_features(df, ["x"], "fv")
        model = StandardScaler(
            inputCol="fv", outputCol="sv", withMean=True, withStd=True
        ).fit(feats)
        theirs = {r.id: float(r.sv[0]) for r in model.transform(feats).collect()}
        for k in ours:
            assert ours[k] == pytest.approx(theirs[k], abs=1e-12)

    def test_grouped_minmax_and_degenerate_spread(self, spark):
        """Per-group [0,1] scaling; a constant group yields NULL (not
        ±inf), matching SQL division semantics."""
        from datalake_brief_spark.mlops import normalize_features

        df = spark.createDataFrame(
            [("a", 10.0), ("a", 20.0), ("a", 15.0), ("b", 7.0), ("b", 7.0)],
            "g string, x double",
        )
        out = normalize_features(df, ["x"], method="minmax", group_col="g").collect()
        a = sorted(r.x_norm for r in out if r.g == "a")
        assert a == [0.0, 0.5, 1.0]
        assert all(r.x_norm is None for r in out if r.g == "b")


class TestStreamingNearDup:
    def test_stream_equals_one_shot_increment(self, spark, tmp_path):
        """Documents streamed through neardup_stream_to_index in two
        micro-batches must yield the same pair set as one batch-mode
        incremental_dedup over the whole increment — batch 2 sees batch 1
        through the index append, and the txlog pairs table is the
        exactly-once record."""
        from datalake_brief_spark.operators import dedup
        from datalake_brief_spark.sources import txlog
        from datalake_brief_spark.streaming.sinks import neardup_stream_to_index

        d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
        base = d.filter(F.pmod("doc_id", F.lit(2)) == 0)
        inc = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
        idx = str(tmp_path / "idx")
        dedup.build_dedup_index(base, idx, k=3)
        inc_dir = str(tmp_path / "inc_stream")
        inc.repartition(2).write.parquet(inc_dir)
        stream = (
            spark.readStream.schema(inc.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(inc_dir)
        )
        pairs_path = str(tmp_path / "pairs")
        q = neardup_stream_to_index(
            stream, idx, pairs_path, str(tmp_path / "ckpt"), k=3, threshold=0.8
        )
        q.awaitTermination()
        got = {(r.id_a, r.id_b) for r in txlog.read(spark, pairs_path).collect()}
        idx2 = str(tmp_path / "idx2")
        dedup.build_dedup_index(base, idx2, k=3)
        want = {
            (r.id_a, r.id_b)
            for r in dedup.incremental_dedup(
                spark, inc, idx2, k=3, threshold=0.8, update_index=False
            ).collect()
        }
        assert want, "fixture should contain pairs touching the increment"
        assert got == want


class TestDriftMonitorStream:
    """streaming/monitor.py: continuous PSI vs a frozen reference — the
    stream must agree with operators.relational.distribution_drift
    bit-for-bit on the same data slice."""

    @pytest.fixture()
    def events_dir(self, spark, tmp_path):
        out = str(tmp_path / "events_stream")
        load_table(spark, SF_SMOKE, "events").repartition(4).write.parquet(out)
        yield out
        shutil.rmtree(out, ignore_errors=True)

    def test_stream_psi_matches_batch_op(self, spark, events_dir):
        """One giant window spanning the whole table: the monitor's PSI for
        that window equals distribution_drift(ref, cur) exactly (same
        edges, clamps, eps smoothing, rounding)."""
        from datalake_brief_spark.operators.relational import distribution_drift
        from datalake_brief_spark.streaming.monitor import (
            DriftMonitor,
            drift_monitor_stream,
            reference_profile,
        )

        whole = spark.read.parquet(events_dir)
        ref = whole.filter(F.col("event_type") == "view").select("value")
        profile = reference_profile(ref, "value", n_buckets=10)
        monitor = DriftMonitor(profile, threshold=1e9)  # collect-only
        stream = stream_events(spark, events_dir)
        q = drift_monitor_stream(
            stream, profile, monitor, window="3650 days", watermark="2 hours"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        psis = monitor.window_psi()
        assert len(psis) == 1
        got = next(iter(psis.values()))
        want = distribution_drift(ref, whole.select("value"), ["value"]).collect()[0]
        assert got == want.psi
        assert sum(next(iter(monitor.state.values())).values()) == want.n_cur

    def test_alert_fires_on_shifted_window_only(self, spark, tmp_path):
        """Two event-time windows: one replays the reference distribution
        (PSI ~ 0, silent), one is shifted far out of range (PSI large,
        fires). Alert carries the window and its PSI."""
        import datetime as dt

        from datalake_brief_spark.streaming.monitor import (
            DriftMonitor,
            drift_monitor_stream,
            reference_profile,
        )

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        calm = [(i, "u", "view", float(i % 10), base + dt.timedelta(seconds=i)) for i in range(100)]
        hot = [
            (1000 + i, "u", "view", 1e6 + i, base + dt.timedelta(hours=2, seconds=i))
            for i in range(100)
        ]
        df = spark.createDataFrame(
            calm + hot, "event_id long, user_id string, event_type string, value double, ts timestamp"
        )
        src = str(tmp_path / "drift_src")
        df.repartition(2).write.parquet(src)
        ref = spark.createDataFrame(
            [(float(i % 10),) for i in range(100)], "value double"
        )
        profile = reference_profile(ref, "value", n_buckets=10)
        monitor = DriftMonitor(profile, threshold=0.2)
        stream = (
            spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = drift_monitor_stream(stream, profile, monitor, window="1 hour")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        psis = monitor.window_psi()
        assert len(psis) == 2
        calm_key = [k for k in psis if k[0].startswith("2024-01-01 00")][0]
        hot_key = [k for k in psis if k[0].startswith("2024-01-01 02")][0]
        assert psis[calm_key] < 0.01
        assert psis[hot_key] > 1.0
        fired_windows = {a.window_start for a in monitor.alerts}
        assert hot_key[0] in fired_windows
        assert calm_key[0] not in fired_windows
        shutil.rmtree(src, ignore_errors=True)


class TestZscoreAlertStream:
    @pytest.fixture()
    def events_dir(self, spark, tmp_path):
        import shutil as _sh

        out = str(tmp_path / "events_stream_z")
        load_table(spark, SF_SMOKE, "events").repartition(4).write.parquet(out)
        yield out
        _sh.rmtree(out, ignore_errors=True)

    def test_stream_equals_batch_zscore(self, spark, events_dir):
        """The continuous rolling z-score must reproduce the batch window
        operator on the same slice: anomaly flags exactly, z to 1e-6 (the
        engines' stddev accumulation orders differ at the last ulp; the
        4-dp rounding absorbs everything beyond)."""
        from datalake_brief_spark.operators.timeseries import zscore_anomalies
        from datalake_brief_spark.streaming import zscore_alert_stream

        stream = (
            spark.readStream.schema(spark.read.parquet(events_dir).schema)
            .parquet(events_dir)
            .select("user_id", "event_id", "ts", "value")
        )
        q = (
            zscore_alert_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("zalerts")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.event_id: (r.zscore, r.is_anomaly)
                for r in spark.sql("SELECT * FROM zalerts").collect()
            }
        finally:
            q.stop()
        batch = zscore_anomalies(
            load_table(spark, SF_SMOKE, "events"),
            ["user_id"],
            [F.col("ts"), F.col("event_id")],
            "value",
        ).collect()
        assert len(got) == len(batch) > 0
        for r in batch:
            gz, gf = got[r.event_id]
            assert gf == r.is_anomaly, r.event_id
            if r.zscore is None:
                assert gz is None, r.event_id
            else:
                assert gz == pytest.approx(r.zscore, abs=1e-6), r.event_id

    def test_state_carries_across_batches(self):
        """Feeding the same rows in one chunk or two must produce identical
        output — the trailing-values state is the only cross-batch
        memory."""
        import pandas as pd

        from datalake_brief_spark.streaming.anomaly import _make_zscore_fn

        class FakeState:
            def __init__(self):
                self._v = None
                self.hasTimedOut = False

            @property
            def exists(self):
                return self._v is not None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self._v = v

            def remove(self):
                self._v = None

        def rows(ids, vals):
            return pd.DataFrame(
                {"user_id": 1, "event_id": ids,
                 "ts": pd.to_datetime(ids, unit="s"), "value": vals}
            )

        fn = _make_zscore_fn(20, 2.5, 4, None)
        vals = [9.0, 11.0, 9.0, 11.0, 50.0, 10.0]
        one = FakeState()
        out_one = pd.concat(list(fn((1,), [rows(range(6), vals)], one)))
        two = FakeState()
        a = pd.concat(list(fn((1,), [rows(range(3), vals[:3])], two)))
        b = pd.concat(list(fn((1,), [rows(range(3, 6), vals[3:])], two)))
        out_two = pd.concat([a, b], ignore_index=True)
        assert out_one.reset_index(drop=True).equals(out_two)
        assert bool(out_one.is_anomaly[4])  # the 50.0 spike fires


class TestTransitionStream:
    @pytest.fixture()
    def events_dir(self, spark, tmp_path):
        import shutil as _sh

        out = str(tmp_path / "events_stream_t")
        load_table(spark, SF_SMOKE, "events").repartition(4).write.parquet(out)
        yield out
        _sh.rmtree(out, ignore_errors=True)

    def test_stream_equals_batch_transitions(self, spark, events_dir):
        from datalake_brief_spark.operators.windows import transition_matrix
        from datalake_brief_spark.streaming import transition_stream

        stream = (
            spark.readStream.schema(spark.read.parquet(events_dir).schema)
            .parquet(events_dir)
            .select("user_id", "event_id", "ts", "event_type")
        )
        q = (
            transition_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("tsteps")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r.prev_state, r.next_state): r.n
                for r in spark.sql(
                    "SELECT prev_state, next_state, sum(n) AS n FROM tsteps "
                    "GROUP BY 1, 2"
                ).collect()
            }
        finally:
            q.stop()
        batch = {
            (r.prev_state, r.next_state): r.n
            for r in transition_matrix(
                load_table(spark, SF_SMOKE, "events"),
                "user_id", "event_type", "ts", "event_id",
            ).collect()
        }
        assert got == batch and len(batch) > 0

    def test_boundary_step_survives_batch_split(self):
        """The first event of batch 2 must form a step with batch 1's
        tail — the carried one-string state is exactly that guarantee."""
        import pandas as pd

        from datalake_brief_spark.streaming.stateful import _transitions_fn

        class FakeState:
            def __init__(self):
                self._v = None
                self.hasTimedOut = False

            @property
            def exists(self):
                return self._v is not None

            @property
            def get(self):
                return self._v

            def update(self, v):
                self._v = v

            def remove(self):
                self._v = None

        def rows(ids, types):
            return pd.DataFrame(
                {"user_id": 1, "event_id": ids,
                 "ts": pd.to_datetime(ids, unit="s"), "event_type": types}
            )

        st = FakeState()
        a = list(_transitions_fn((1,), [rows([0, 1], ["a", "b"])], st))
        b = list(_transitions_fn((1,), [rows([2], ["c"])], st))
        steps = {}
        for frame in a + b:
            for _, r in frame.iterrows():
                steps[(r.prev_state, r.next_state)] = steps.get(
                    (r.prev_state, r.next_state), 0
                ) + int(r.n)
        assert steps == {("a", "b"): 1, ("b", "c"): 1}
