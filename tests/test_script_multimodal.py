"""Script-task escape hatch (F1) and multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from ssis_to_dbt_spark.operators import (
    pandas_scalar_udf,
    script_apply_grouped,
    script_map,
)
from ssis_to_dbt_spark.text import (
    attach_metadata,
    content_fingerprint,
    decode_image_features,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"img-bytes-1")), (2, bytearray(b"img2")), (3, None)],
        "media_id long, content binary",
    )
    return attach_metadata(df, modality="image", fmt="fake")


class TestScriptHatch:
    def test_pandas_scalar_udf(self, spark):
        plus_vat = pandas_scalar_udf(lambda s: s * 1.2, "double")
        df = spark.createDataFrame([(10.0,), (20.0,)], "amt double")
        vals = sorted(r["v"] for r in df.select(plus_vat("amt").alias("v")).collect())
        assert vals == [12.0, 24.0]

    def test_script_map_schema_contract(self, spark):
        df = spark.createDataFrame([(1, 2), (3, 4)], "a int, b int")

        def fn(batches):
            for pdf in batches:
                out = pdf[["a"]].copy()
                out["total"] = pdf["a"] + pdf["b"]
                yield out

        out = script_map(df, fn, "a int, total int")
        assert {r["a"]: r["total"] for r in out.collect()} == {1: 3, 3: 7}

    def test_script_apply_grouped(self, spark):
        df = spark.createDataFrame(
            [("x", 1), ("x", 2), ("y", 5)], "g string, n int"
        )

        def fn(pdf):
            return pdf.groupby("g", as_index=False).agg(total=("n", "sum"))

        out = script_apply_grouped(df, ["g"], fn, "g string, total long")
        assert {r["g"]: r["total"] for r in out.collect()} == {"x": 3, "y": 5}


class TestMultimodal:
    def test_metadata_struct(self, media):
        row = media.filter("media_id = 1").first()
        assert row["meta"]["modality"] == "image"
        assert row["meta"]["n_bytes"] == 11
        assert row["meta"]["width"] is None

    def test_fake_decode_is_deterministic(self, media):
        a = decode_image_features(media).collect()
        b = decode_image_features(media).collect()
        fa = {r["media_id"]: r["features"] for r in a}
        fb = {r["media_id"]: r["features"] for r in b}
        assert fa == fb
        assert len(fa[1]) == 8
        assert all(0.0 <= x < 1.0 for x in fa[1])

    def test_null_content_handled(self, media):
        rows = {r["media_id"]: r["n_bytes"] for r in decode_image_features(media).collect()}
        assert rows[3] == 0

    def test_real_backend_refuses(self, media):
        with pytest.raises(NotImplementedError, match="backend"):
            decode_image_features(media, backend="pillow")

    def test_bmp_roundtrip_pure_python(self):
        from ssis_to_dbt_spark.text.multimodal import decode_bmp, encode_bmp

        # width 3 forces row padding (3*3=9 bytes -> stride 12)
        data = encode_bmp(3, 2, (200, 100, 50))
        assert decode_bmp(data) == (3, 2, 3, 200.0, 100.0, 50.0)
        with pytest.raises(ValueError, match="BMP"):
            decode_bmp(b"not an image")

    def test_bmp_stats_over_arrow_batches(self, spark):
        from ssis_to_dbt_spark.text.multimodal import decode_bmp_stats, encode_bmp

        df = spark.createDataFrame(
            [
                (1, bytearray(encode_bmp(4, 3, (10, 20, 30)))),
                (2, bytearray(encode_bmp(7, 1, (0, 255, 128)))),
                (3, bytearray(b"garbage")),  # quarantined, not fatal
            ],
            "media_id long, content binary",
        )
        rows = {r["media_id"]: r for r in decode_bmp_stats(df).collect()}
        assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (4, 3, 3)
        assert (rows[1]["mean_r"], rows[1]["mean_g"], rows[1]["mean_b"]) == (
            10.0, 20.0, 30.0,
        )
        assert (rows[2]["width"], rows[2]["mean_g"]) == (7, 255.0)
        assert rows[3]["width"] is None and rows[3]["n_bytes"] == 7

    def test_resize_bmp_exact_nearest_neighbor(self):
        from ssis_to_dbt_spark.text.multimodal import (
            decode_bmp, encode_bmp_pixels, resize_bmp,
        )

        # 4x2 gradient; NN mapping src_col = i * 4 // 2 picks cols 0 and 2,
        # src_row = j * 2 // 1 picks row 0
        top = [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)]
        bot = [(100, 100, 100), (110, 110, 110), (120, 120, 120), (130, 130, 130)]
        data = encode_bmp_pixels([top, bot])
        assert decode_bmp(data)[:2] == (4, 2)
        small = resize_bmp(data, 2, 1)
        # resized image = image-row 0, cols {0, 2} -> mean of 0 and 20 = 10
        assert decode_bmp(small) == (2, 1, 3, 10.0, 10.0, 10.0)
        # upscale 1x1 -> 3x3 replicates the single pixel
        one = encode_bmp_pixels([[(7, 8, 9)]])
        big = resize_bmp(one, 3, 3)
        assert decode_bmp(big) == (3, 3, 3, 7.0, 8.0, 9.0)
        with pytest.raises(ValueError, match="BMP"):
            resize_bmp(b"junk", 2, 2)
        with pytest.raises(ValueError, match="positive"):
            resize_bmp(data, 0, 2)

    def test_resize_media_over_arrow_batches(self, spark):
        from ssis_to_dbt_spark.text.multimodal import (
            decode_bmp_stats, encode_bmp, resize_bmp_media,
        )

        df = spark.createDataFrame(
            [
                (1, bytearray(encode_bmp(7, 5, (10, 20, 30)))),
                (2, bytearray(b"garbage")),  # quarantined, not fatal
            ],
            "media_id long, content binary",
        )
        out = resize_bmp_media(df, 3, 2)
        rows = {r["media_id"]: r for r in out.collect()}
        assert (rows[1]["width"], rows[1]["height"]) == (3, 2)
        # stride(3px) = 12 bytes -> 54 header + 24 body
        assert rows[1]["n_bytes"] == 78
        assert rows[2]["content"] is None and rows[2]["width"] is None
        # resized solid color decodes to the same channel means
        stats = decode_bmp_stats(out.filter("content is not null")).first()
        assert (stats["mean_r"], stats["mean_g"], stats["mean_b"]) == (
            10.0, 20.0, 30.0,
        )

    def test_bmp_backend_in_feature_path(self, spark):
        from ssis_to_dbt_spark.text.multimodal import encode_bmp

        df = spark.createDataFrame(
            [(1, bytearray(encode_bmp(2, 2, (8, 16, 32))))],
            "media_id long, content binary",
        )
        feats = decode_image_features(df, backend="bmp").first()["features"]
        assert feats[:6] == [2.0, 2.0, 3.0, 8.0, 16.0, 32.0]
        assert feats[7] == 4.0  # n_pixels

    def test_content_fingerprint_dedups(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"same")), (2, bytearray(b"same")), (3, bytearray(b"diff"))],
            "media_id long, content binary",
        )
        fps = [
            r["fp"]
            for r in df.select(content_fingerprint(F.col("content")).alias("fp")).collect()
        ]
        assert fps[0] == fps[1] != fps[2]

    def test_frame_sampling_counts(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"vid"))], "media_id long, content binary"
        )
        vid = attach_metadata(df, modality="video", fmt="fake").withColumn(
            "meta",
            F.col("meta").withField("duration_ms", F.lit(3500).cast("long")),
        )
        frames = sample_frames(vid, every_ms=1000).collect()
        assert len(frames) == 3
        assert sorted(r["frame_idx"] for r in frames) == [0, 1, 2]


class TestWavDecode:
    def test_roundtrip_exact(self):
        from ssis_to_dbt_spark.text.multimodal import decode_wav, encode_wav

        rate, ch, n, mean_abs = decode_wav(encode_wav(16, 8000, 1234))
        assert (rate, ch, n, mean_abs) == (8000, 1, 16, 1234.0)

    def test_rejects_non_wav_and_float_pcm(self):
        import pytest

        from ssis_to_dbt_spark.text.multimodal import decode_wav

        with pytest.raises(ValueError):
            decode_wav(b"RIFFxxxxJUNK")
        with pytest.raises(ValueError):
            decode_wav(b"not audio at all")

    def test_stats_quarantines_bad_payloads(self, spark):
        from ssis_to_dbt_spark.text.multimodal import decode_wav_stats, encode_wav

        df = spark.createDataFrame(
            [(1, bytearray(encode_wav(8, 16000, 100))), (2, bytearray(b"garbage"))],
            "media_id long, content binary",
        )
        rows = {r["media_id"]: r for r in decode_wav_stats(df).collect()}
        assert rows[1]["sample_rate"] == 16000
        assert rows[1]["duration_ms"] == 8 * 1000.0 / 16000
        assert rows[2]["sample_rate"] is None


class TestTruncatedBmp:
    """Truncated payloads must raise (-> quarantine path), never produce
    silently-wrong stats or a re-encoded BMP bigger than its body."""

    def test_decode_rejects_truncated_body(self):
        from ssis_to_dbt_spark.text.multimodal import decode_bmp, encode_bmp

        data = encode_bmp(4, 3, (10, 20, 30))
        with pytest.raises(ValueError, match="truncated"):
            decode_bmp(data[:-8])

    def test_resize_rejects_truncated_body(self):
        from ssis_to_dbt_spark.text.multimodal import encode_bmp, resize_bmp

        data = encode_bmp(4, 3, (10, 20, 30))
        with pytest.raises(ValueError, match="truncated"):
            resize_bmp(data[:-8], 2, 2)

    def test_truncated_payload_quarantined_in_batch(self, spark):
        from ssis_to_dbt_spark.text.multimodal import (
            decode_bmp_stats, encode_bmp, resize_bmp_media,
        )

        good = encode_bmp(4, 3, (10, 20, 30))
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(good[:-8]))],
            "media_id long, content binary",
        )
        stats = {r["media_id"]: r for r in decode_bmp_stats(df).collect()}
        assert stats[1]["width"] == 4
        assert stats[2]["width"] is None  # NULL row, not wrong means
        resized = {r["media_id"]: r for r in resize_bmp_media(df, 2, 2).collect()}
        assert resized[1]["width"] == 2
        assert resized[2]["content"] is None


class TestPngCodec:
    """Real stdlib-only PNG decode: every scanline filter round-trips, all
    three supported pixel layouts, refusal contract for the rest."""

    def _grid(self, w, h, nch):
        # deterministic non-uniform pixels so filters actually do work
        return [
            [tuple((x * 7 + y * 13 + c * 29) % 256 for c in range(nch))
             for x in range(w)]
            for y in range(h)
        ]

    def test_all_filters_round_trip_rgb(self):
        from ssis_to_dbt_spark.text.multimodal import decode_png, encode_png

        rows = self._grid(5, 4, 3)
        flat = [c for row in rows for px in row for c in px]
        want_r = sum(flat[0::3]) / 20
        want_g = sum(flat[1::3]) / 20
        want_b = sum(flat[2::3]) / 20
        for f in range(5):
            got = decode_png(encode_png(rows, filter_type=f))
            assert got == (5, 4, 3, want_r, want_g, want_b), f

    def test_grayscale_and_rgba(self):
        from ssis_to_dbt_spark.text.multimodal import decode_png, encode_png

        gray = self._grid(3, 3, 1)
        w, h, ch, mr, mg, mb = decode_png(encode_png(gray, filter_type=4))
        mean = sum(px[0] for row in gray for px in row) / 9
        assert (w, h, ch) == (3, 3, 1) and mr == mg == mb == mean
        rgba = self._grid(4, 2, 4)
        w, h, ch, mr, mg, mb = decode_png(encode_png(rgba, filter_type=2))
        assert (w, h, ch) == (4, 2, 4)
        flat = [c for row in rgba for px in row for c in px]
        assert mr == sum(flat[0::4]) / 8  # alpha excluded from means

    def test_refusals(self):
        from ssis_to_dbt_spark.text.multimodal import decode_png, encode_png

        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"BM123456789")
        good = encode_png(self._grid(4, 4, 3))
        with pytest.raises(ValueError, match="truncated|missing|corrupt"):
            decode_png(good[:-20])

    def test_decode_image_dispatch_and_batch(self, spark):
        from ssis_to_dbt_spark.text.multimodal import (
            decode_image, decode_image_stats, encode_bmp, encode_png,
        )

        png = encode_png([[(10, 20, 30), (30, 20, 10)]])
        bmp = encode_bmp(4, 3, (10, 20, 30))
        assert decode_image(png)[0] == "png"
        assert decode_image(bmp)[0] == "bmp"
        df = spark.createDataFrame(
            [(1, bytearray(bmp)), (2, bytearray(png)), (3, bytearray(b"x"))],
            "media_id long, content binary",
        )
        rows = {r["media_id"]: r for r in decode_image_stats(df).collect()}
        assert rows[1]["format"] == "bmp" and rows[1]["width"] == 4
        assert rows[2]["format"] == "png" and rows[2]["mean_r"] == 20.0
        assert rows[3]["format"] is None and rows[3]["n_bytes"] == 1


class TestPngResize:
    def test_exact_nearest_neighbor(self):
        from ssis_to_dbt_spark.text.multimodal import (
            decode_png, encode_png, resize_image, resize_png,
        )

        top = [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)]
        bot = [(100, 100, 100), (110, 110, 110), (120, 120, 120), (130, 130, 130)]
        data = encode_png([top, bot], filter_type=4)
        small = resize_png(data, 2, 1)
        # dst col i -> src col i*4//2 in {0, 2}; dst row 0 -> src row 0
        assert decode_png(small) == (2, 1, 3, 10.0, 10.0, 10.0)
        big = resize_image(encode_png([[(7, 8, 9)]]), 3, 3)
        assert decode_png(big) == (3, 3, 3, 7.0, 8.0, 9.0)
        with pytest.raises(ValueError, match="unrecognized"):
            resize_image(b"junk", 2, 2)

    def test_dispatch_preserves_format(self):
        from ssis_to_dbt_spark.text.multimodal import (
            decode_image, encode_bmp, encode_png, resize_image,
        )

        bmp_out = resize_image(encode_bmp(4, 4, (9, 9, 9)), 2, 2)
        png_out = resize_image(encode_png([[(9, 9, 9)] * 4] * 4), 2, 2)
        assert decode_image(bmp_out)[0] == "bmp"
        assert decode_image(png_out)[0] == "png"


class TestJpegCodec:
    """r10 (r9 VERDICT stretch #8): pure-Python baseline JPEG (ITU-T T.81)
    — the dependency-free encoder synthesizes fixtures, the decoder must
    recover them within quantization error; the general sampling-factor
    MCU path is exercised by real 4:2:0 streams; non-baseline modes
    refuse by marker name; and the Spark media stages dispatch on the
    FFD8 magic like BMP/PNG."""

    def test_solid_color_round_trip(self):
        from ssis_to_dbt_spark.text.jpeg import decode_jpeg, encode_jpeg

        data = encode_jpeg([[(200, 30, 90)] * 16 for _ in range(16)], 90)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        w, h, ch, mr, mg, mb = decode_jpeg(data)
        assert (w, h, ch) == (16, 16, 3)
        assert abs(mr - 200) < 4 and abs(mg - 30) < 4 and abs(mb - 90) < 4

    def test_gradient_non_multiple_of_8_dims(self):
        from ssis_to_dbt_spark.text.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg,
        )

        rows = [
            [(x * 7 % 256, y * 11 % 256, (x + y) * 5 % 256)
             for x in range(13)]
            for y in range(11)
        ]
        w, h, ch, px = decode_jpeg_pixels(encode_jpeg(rows, 95))
        assert (w, h, ch) == (13, 11, 3)
        err = max(
            abs(a - b)
            for ry, dy in zip(rows, px)
            for (a, _, _), (b, _, _) in zip(ry, dy)
        )
        assert err < 10  # q95 quantization error bound

    def test_grayscale_and_determinism(self):
        import hashlib

        from ssis_to_dbt_spark.text.jpeg import decode_jpeg, encode_jpeg

        rows = [[(v, v, v) for v in range(32)] for _ in range(8)]
        g1 = encode_jpeg(rows, 90, grayscale=True)
        g2 = encode_jpeg(rows, 90, grayscale=True)
        assert g1 == g2  # bit-deterministic fixture source
        assert hashlib.md5(g1).hexdigest() == (
            "f0c5720732756bf475e2addff86eb818"
        )
        w, h, ch, mr, mg, mb = decode_jpeg(g1)
        assert (w, h, ch) == (32, 8, 1)
        assert abs(mr - 15.5) < 4 and mr == mg == mb

    def test_420_subsampled_mcu_path(self):
        from ssis_to_dbt_spark.text.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg,
        )

        rows = [
            [(250, 40, 40) if x < 10 else (40, 40, 250) for x in range(20)]
            for y in range(18)
        ]
        w, h, ch, px = decode_jpeg_pixels(
            encode_jpeg(rows, 90, subsample=True)
        )
        assert (w, h, ch) == (20, 18, 3)
        left, right = px[9][3], px[9][16]  # away from the chroma seam
        assert left[0] > 180 and left[2] < 110
        assert right[2] > 180 and right[0] < 110
        # odd dims through the 2x2 chroma box-average
        rows = [[(x * 13 % 256, y * 7 % 256, 128) for x in range(17)]
                for y in range(9)]
        w, h, ch, _ = decode_jpeg_pixels(
            encode_jpeg(rows, 85, subsample=True)
        )
        assert (w, h) == (17, 9)

    def test_refusals_name_the_mode(self):
        import struct

        from ssis_to_dbt_spark.text.jpeg import decode_jpeg, encode_jpeg

        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"not a jpeg")
        # splice a progressive SOF2 marker into a real stream's prefix
        data = encode_jpeg([[(1, 2, 3)] * 8] * 8, 90)
        sof0 = data.index(b"\xff\xc0")
        prog = data[:sof0] + b"\xff\xc2" + data[sof0 + 2:]
        with pytest.raises(ValueError, match="progressive"):
            decode_jpeg(prog)
        with pytest.raises(ValueError, match="truncated|marker"):
            decode_jpeg(data[: len(data) // 2])
        _ = struct  # keep import local-use explicit

    def test_malformed_streams_raise_valueerror_not_hard_errors(self):
        """r11 (r10 ADVICE, medium): SOI-prefixed-but-corrupt JPEGs must
        raise ValueError — the only exception the media stages'
        quarantine handlers catch — never IndexError/KeyError/
        struct.error, which would fail the whole Spark stage on one
        corrupt crawled image."""
        from ssis_to_dbt_spark.text.jpeg import decode_jpeg_pixels, encode_jpeg

        data = encode_jpeg([[(10, 20, 30)] * 8] * 8, 90)
        # truncated DQT payload (was IndexError)
        dqt = data.index(b"\xff\xdb")
        with pytest.raises(ValueError):
            decode_jpeg_pixels(data[: dqt + 6])
        # SOS referencing a component id the frame never declared
        # (was KeyError)
        sos = data.index(b"\xff\xda")
        bad = bytearray(data)
        bad[sos + 5] = 99
        with pytest.raises(ValueError):
            decode_jpeg_pixels(bytes(bad))
        # byte-level fuzz: every prefix truncation must ValueError or
        # decode, never leak a hard error
        for cut in range(2, len(data), 7):
            try:
                decode_jpeg_pixels(data[:cut])
            except ValueError:
                pass

    def test_corrupt_jpeg_quarantines_in_batch(self, spark):
        """End-to-end: a corrupt JPEG among good media yields a NULL
        quarantine row from the mapInPandas stage instead of failing it
        (quarantine-not-crash, matching the BMP/PNG decoders)."""
        from ssis_to_dbt_spark.text.jpeg import encode_jpeg
        from ssis_to_dbt_spark.text.multimodal import (
            decode_image_stats,
            encode_bmp,
        )

        jp = encode_jpeg([[(10, 200, 10)] * 8] * 8, 90)
        sos = jp.index(b"\xff\xda")
        corrupt = jp[: sos + 5] + bytes([99]) + jp[sos + 6:]
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_bmp(4, 4, (5, 6, 7)))),
                (2, bytearray(corrupt)),
                (3, bytearray(jp[: len(jp) // 3])),
            ],
            "media_id long, content binary",
        )
        rows = {r["media_id"]: r for r in decode_image_stats(df).collect()}
        assert rows[1]["format"] == "bmp"
        assert rows[2]["format"] is None and rows[2]["width"] is None
        assert rows[3]["format"] is None
        assert rows[2]["n_bytes"] == len(corrupt)  # row kept, not dropped

    def test_decode_image_dispatch_and_stats_batch(self, spark):
        from ssis_to_dbt_spark.text.jpeg import encode_jpeg
        from ssis_to_dbt_spark.text.multimodal import (
            decode_image,
            decode_image_stats,
            encode_bmp,
        )

        jp = encode_jpeg([[(10, 200, 10)] * 8] * 8, 90)
        assert decode_image(jp)[0] == "jpeg"
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_bmp(4, 4, (5, 6, 7)))),
                (2, bytearray(jp)),
                (3, bytearray(b"junk")),
            ],
            "media_id long, content binary",
        )
        rows = {r["media_id"]: r for r in decode_image_stats(df).collect()}
        assert rows[1]["format"] == "bmp"
        assert rows[2]["format"] == "jpeg"
        assert rows[2]["width"] == 8 and rows[2]["channels"] == 3
        assert abs(rows[2]["mean_g"] - 200) < 5
        assert rows[3]["format"] is None  # quarantined

    def test_resize_dispatch_jpeg(self):
        from ssis_to_dbt_spark.text.jpeg import encode_jpeg
        from ssis_to_dbt_spark.text.multimodal import (
            decode_image,
            resize_image,
        )

        src = encode_jpeg([[(120, 60, 200)] * 16 for _ in range(16)], 90)
        out = resize_image(src, 6, 5)
        fmt, w, h, ch, mr, mg, mb = decode_image(out)
        assert (fmt, w, h, ch) == ("jpeg", 6, 5, 3)
        assert abs(mr - 120) < 6 and abs(mb - 200) < 6

    def test_image_backend_in_feature_path(self, spark):
        from ssis_to_dbt_spark.text.jpeg import encode_jpeg
        from ssis_to_dbt_spark.text.multimodal import decode_image_features

        jp = encode_jpeg([[(0, 0, 250)] * 8] * 8, 90)
        df = spark.createDataFrame(
            [(1, bytearray(jp))], "media_id long, content binary"
        )
        feats = decode_image_features(df, backend="image").collect()[0]
        w, h, ch, mr, mg, mb, luma, npx = feats["features"]
        assert (w, h, ch, npx) == (8.0, 8.0, 3.0, 64.0)
        assert mb > 240 and mr < 10

    def test_422_and_restart_interval_paths(self):
        """r10: horizontal-only 4:2:2 sampling and DRI/RSTn restart
        markers (DC predictor resets + byte realignment) — the two
        decoder paths real-world encoders exercise that 4:4:4 streams
        never touch."""
        from ssis_to_dbt_spark.text.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg,
        )

        rows = [
            [(250, 40, 40) if x < 10 else (40, 40, 250) for x in range(20)]
            for y in range(18)
        ]
        w, h, ch, px = decode_jpeg_pixels(
            encode_jpeg(rows, 90, subsample="422")
        )
        assert (w, h, ch) == (20, 18, 3)
        assert px[9][3][0] > 180 and px[9][16][2] > 180

        rows = [
            [(x * 9 % 256, y * 13 % 256, (x * 3 + y * 5) % 256)
             for x in range(25)]
            for y in range(25)
        ]
        data = encode_jpeg(rows, 92, restart_interval=3)
        assert b"\xff\xdd" in data and b"\xff\xd0" in data
        w, h, ch, px = decode_jpeg_pixels(data)
        assert (w, h) == (25, 25)
        err = max(
            abs(a - b)
            for ry, dy in zip(rows, px)
            for (a, _, _), (b, _, _) in zip(ry, dy)
        )
        assert err < 25
        # restarts compose with subsampling
        w, h, ch, _ = decode_jpeg_pixels(
            encode_jpeg(rows, 92, subsample="420", restart_interval=2)
        )
        assert (w, h) == (25, 25)
        with pytest.raises(ValueError, match="subsample"):
            encode_jpeg(rows, 90, subsample="444x")


class TestImagePhash:
    """r13 (r12 VERDICT #5): perceptual image hashing — dHash/aHash over
    the pure-Python decoders, Hamming-banded near-dup candidates through
    the shared text/dedup.py blocking machinery."""

    @staticmethod
    def _grad_rows(w, h, base=0):
        # horizontal+vertical gray gradient; r=g=b so luminance == value
        return [
            [((23 * base + 41 * x + 59 * y) % 256,) * 3 for x in range(w)]
            for y in range(h)
        ]

    def test_rescaled_and_reencoded_variants_match(self, spark):
        """The core near-dup property: a pixel-doubled copy AND a PNG
        re-encode of the same image hash identically to the original;
        a different image does not."""
        from ssis_to_dbt_spark.text.dedup import phash_candidates
        from ssis_to_dbt_spark.text.multimodal import (
            ahash_image,
            dhash_image,
            encode_bmp_pixels,
            encode_png,
            image_phash,
        )

        rows = self._grad_rows(9, 6, base=3)
        base_bmp = encode_bmp_pixels(rows)
        doubled = encode_bmp_pixels(
            [
                [rows[y // 2][x // 2] for x in range(18)]
                for y in range(12)
            ]
        )
        png_copy = encode_png(rows)
        other = encode_bmp_pixels(self._grad_rows(9, 6, base=9))
        assert dhash_image(base_bmp) == dhash_image(doubled)
        assert dhash_image(base_bmp) == dhash_image(png_copy)
        assert dhash_image(base_bmp) != dhash_image(other)
        assert ahash_image(base_bmp) == ahash_image(doubled)

        media = spark.createDataFrame(
            [(1, base_bmp), (2, doubled), (3, png_copy), (4, other)],
            "media_id long, content binary",
        )
        fp = image_phash(media)
        pairs = {
            (r["media_a"], r["media_b"]): r["hamming_distance"]
            for r in phash_candidates(fp).collect()
        }
        assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
        assert pairs[(2, 3)] == 0
        assert all(
            d > 0 for (a, b), d in pairs.items() if 4 in (a, b)
        ) or not any(4 in (a, b) for (a, b) in pairs)

    def test_jpeg_variant_within_small_hamming(self, spark):
        """A JPEG re-encode is lossy, not exact — the dHash of a smooth
        gradient must survive within a small Hamming distance (that's
        the point of a PERCEPTUAL hash)."""
        from ssis_to_dbt_spark.text.jpeg import encode_jpeg
        from ssis_to_dbt_spark.text.multimodal import (
            dhash_image,
            encode_bmp_pixels,
        )

        rows = [
            [(min(255, 10 * x + 5 * y),) * 3 for x in range(18)]
            for y in range(12)
        ]
        bmp = encode_bmp_pixels(rows)
        jpg = encode_jpeg(rows, 95)
        d = bin(dhash_image(bmp) ^ dhash_image(jpg)).count("1")
        assert d <= 8

    def test_corrupt_payload_quarantines(self, spark):
        from ssis_to_dbt_spark.text.multimodal import image_phash

        media = spark.createDataFrame(
            [(1, b"not an image"), (2, b"BM\x00\x01")],
            "media_id long, content binary",
        )
        rows = {r["media_id"]: r for r in image_phash(media).collect()}
        assert rows[1]["phash"] is None and rows[1]["err"]
        assert rows[2]["phash"] is None and rows[2]["err"]

    def test_dhash_matches_python_model(self, spark):
        """Bit-level pin: the operator's 48-bit dHash equals the closed
        form over the known gradient — bit y*8+x set iff
        g(x,y) > g(x+1,y)."""
        from ssis_to_dbt_spark.text.multimodal import (
            dhash_image,
            encode_bmp_pixels,
        )

        for base in (0, 5, 11):
            rows = self._grad_rows(9, 6, base=base)
            want = 0
            for y in range(6):
                for x in range(8):
                    g1 = (23 * base + 41 * x + 59 * y) % 256
                    g2 = (23 * base + 41 * (x + 1) + 59 * y) % 256
                    if g1 > g2:
                        want |= 1 << (y * 8 + x)
            assert dhash_image(encode_bmp_pixels(rows)) == want
