"""Round-12 operator tests: pure-Python PNG decode (verdict #5), the
argmax SCD2 snapshot diff, and the RP-LSH multi-table design.

The PNG encoder below is test-only: it writes non-interlaced 8-bit PNGs
with a CHOSEN scanline filter per row, so every filter branch of the
decoder (None/Sub/Up/Average/Paeth) is exercised against ground-truth
pixels rather than whatever filter an external encoder happened to pick.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from snowflake_to_postgres_spark.operators.multimodal import (
    _decode_pixels,
    _decode_png,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_line(f: int, line: bytes, prev: bytes, nch: int) -> bytes:
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - nch] if i >= nch else 0
        b = prev[i]
        c = prev[i - nch] if i >= nch else 0
        if f == 0:
            out[i] = line[i]
        elif f == 1:
            out[i] = (line[i] - a) & 0xFF
        elif f == 2:
            out[i] = (line[i] - b) & 0xFF
        elif f == 3:
            out[i] = (line[i] - ((a + b) >> 1)) & 0xFF
        else:
            out[i] = (line[i] - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def make_png(
    w: int, h: int, pix: bytes, colortype: int = 2, filters=None
) -> bytes:
    """Minimal non-interlaced 8-bit PNG encoder. ``pix`` is raw samples
    in scanline order for the given colortype (1/2/3/4 channels);
    ``filters`` picks the scanline filter per row (default: cycle
    through all five)."""
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
    stride = w * nch
    assert len(pix) == stride * h
    filters = filters or [y % 5 for y in range(h)]
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pix[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        raw.append(f)
        raw += _filter_line(f, line, prev, nch)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _rgb_gradient(w: int, h: int) -> bytes:
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 255) // max(1, w - 1), (y * 255) // max(1, h - 1), (x ^ y) & 0xFF)
    )


class TestPngDecode:
    def test_roundtrip_all_filters_rgb(self):
        """Every scanline filter (0-4) must invert exactly: the decoded
        RGB equals the pre-filter pixels."""
        w, h = 11, 10  # h=10 cycles all 5 filters twice
        pix = _rgb_gradient(w, h)
        for filters in ([0], [1], [2], [3], [4], None):
            got = _decode_png(make_png(w, h, pix, 2, filters))
            assert got == (w, h, pix), f"filters={filters}"

    def test_grayscale_and_alpha_normalize_to_rgb(self):
        """Color types 0 (gray), 4 (gray+alpha), 6 (RGBA) all normalize
        to 3-channel RGB: gray replicates, alpha drops."""
        w, h = 7, 5
        gray = bytes((x * 37 + y * 11) & 0xFF for y in range(h) for x in range(w))
        want = bytes(v for g in gray for v in (g, g, g))
        assert _decode_png(make_png(w, h, gray, 0)) == (w, h, want)
        ga = bytes(v for g in gray for v in (g, 0x80))
        assert _decode_png(make_png(w, h, ga, 4)) == (w, h, want)
        rgb = _rgb_gradient(w, h)
        rgba = bytes(
            v
            for i in range(w * h)
            for v in (rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2], 0x33)
        )
        assert _decode_png(make_png(w, h, rgba, 6)) == (w, h, rgb)

    def test_unsupported_shapes_raise_gated(self):
        """Since round 14, 16-bit and Adam7 DECODE (see
        test_round14_ops) — so an 8-bit payload whose header merely
        CLAIMS those shapes is malformed input (ValueError: the stream
        is the wrong length for the claim). Sub-byte depths stay
        honestly gated; a colortype-3 file WITHOUT a PLTE chunk is
        malformed input, not a gated codec."""
        w, h = 4, 3
        pix = _rgb_gradient(w, h)
        good = make_png(w, h, pix, 2, [0])

        def mutate(b: bytes, off: int, val: int) -> bytes:
            # IHDR data starts at 16; bitdepth at +8, colortype +9,
            # interlace +12. CRC is wrong after mutation, but the
            # decoder (like most) does not verify CRCs.
            ba = bytearray(b)
            ba[16 + off] = val
            return bytes(ba)

        with pytest.raises(ValueError, match="truncated"):
            _decode_png(mutate(good, 8, 16))  # claims 16-bit, 8-bit body
        with pytest.raises(ValueError):
            _decode_png(mutate(good, 9, 3))  # palette claim, no PLTE
        with pytest.raises(ValueError):
            _decode_png(mutate(good, 12, 1))  # claims Adam7, sequential body
        with pytest.raises(NotImplementedError, match="sub-byte"):
            _decode_png(mutate(good, 8, 4))  # 4-bit stays gated
        with pytest.raises(NotImplementedError, match="sub-byte"):
            # 16-bit palette is not a PNG shape; the palette gate wins
            _decode_png(mutate(mutate(good, 9, 3), 8, 16))
        with pytest.raises(ValueError):
            _decode_png(b"\x89PNG\r\n\x1a\n" + _chunk(b"IEND", b""))
        with pytest.raises((ValueError, NotImplementedError)):
            _decode_pixels(b"\xff\xd8\xff\xe0JFIF-ish")  # JPEG magic

    def test_truncated_idat_raises(self):
        w, h = 6, 4
        png = make_png(w, h, _rgb_gradient(w, h), 2, [0])
        # rebuild with one scanline missing from the zlib payload
        raw = bytearray()
        stride = w * 3
        pix = _rgb_gradient(w, h)
        for y in range(h - 1):
            raw.append(0)
            raw += pix[y * stride : (y + 1) * stride]
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="truncated"):
            _decode_png(bad)
        assert _decode_png(png)[2] == pix  # the good twin still decodes


class TestPngSparkParity:
    def test_dhash_parity_png_vs_ppm(self, spark):
        """The SAME pixels encoded as P6 PPM and as PNG (mixed filters)
        must produce the IDENTICAL 64-bit dHash through the real-decode
        Spark path — the compressed format joins the uncompressed twins
        on equal footing."""
        from snowflake_to_postgres_spark.operators.multimodal import dhash_images

        w, h = 18, 16
        pix = _rgb_gradient(w, h)
        ppm = f"P6\n{w} {h}\n255\n".encode() + pix
        media = spark.createDataFrame(
            [(1, bytearray(ppm)), (2, bytearray(make_png(w, h, pix, 2)))],
            "doc_id long, payload binary",
        )
        got = {r["doc_id"]: r["dhash_hex"] for r in dhash_images(media, real_decode=True).collect()}
        assert got[1] == got[2]

    def test_decode_and_resize_png_end_to_end(self, spark):
        """decode_images and resize_images accept PNG payloads under
        real_decode with the mm_decode_meta schema contract unchanged;
        the resized output is decodable P6 with capped dims."""
        from snowflake_to_postgres_spark.operators.multimodal import (
            decode_images,
            resize_images,
        )

        w, h = 48, 20
        pix = _rgb_gradient(w, h)
        media = spark.createDataFrame(
            [(7, bytearray(make_png(w, h, pix, 2)))],
            "doc_id long, payload binary",
        )
        meta = decode_images(media, real_decode=True).collect()
        assert len(meta) == 1
        r = meta[0]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert all(0.0 <= f <= 1.0 for f in r["features"])
        rz = resize_images(media, max_dim=16, real_decode=True).collect()[0]
        assert max(rz["width"], rz["height"]) == 16
        w2, h2, pix2 = _decode_pixels(bytes(rz["payload"]))
        assert (w2, h2) == (rz["width"], rz["height"])
        assert len(pix2) == w2 * h2 * 3


class TestScd2SnapshotDiffArgmax:
    def test_matrix_matches_history_based_build(self, spark, sf_dir):
        """The argmax plan (round-11 verdict #4's growth fix) must equal
        the interval-algebra result computed the old way: build the SCD2
        history, filter both snapshots, full-outer diff."""
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.warehouse import (
            SNAP_NEW,
            SNAP_T1,
            SNAP_T2,
            x_scd2_history,
            x_scd2_snapshot_diff,
        )

        h = x_scd2_history(spark, sf_dir)

        def as_of(d):
            return h.filter(
                (F.col("valid_from") <= F.lit(d))
                & (F.col("valid_to").isNull() | (F.lit(d) < F.col("valid_to")))
            ).select("custkey", "priority")

        s1 = as_of(SNAP_T1).withColumnRenamed("priority", "p1")
        s2 = as_of(SNAP_T2).withColumnRenamed("priority", "p2")
        want = {
            (r["old_priority"], r["new_priority"]): (r["n_keys"], r["n_changed"])
            for r in s1.join(s2, "custkey", "full_outer")
            .groupBy(
                F.coalesce("p1", F.lit(SNAP_NEW)).alias("old_priority"),
                F.col("p2").alias("new_priority"),
            )
            .agg(
                F.count("*").alias("n_keys"),
                F.sum(
                    F.when(F.col("p1").isNull() | (F.col("p1") != F.col("p2")), 1)
                    .otherwise(0)
                ).alias("n_changed"),
            )
            .collect()
        }
        got = {
            (r["old_priority"], r["new_priority"]): (r["n_keys"], r["n_changed"])
            for r in x_scd2_snapshot_diff(spark, sf_dir).collect()
        }
        assert got == want and got

    def test_single_wide_shuffle(self, spark, sf_dir):
        """The plan must contain no window function and no join — the
        data-scaled work is one partial-aggregated exchange on custkey."""
        from snowflake_to_postgres_spark.operators.warehouse import (
            x_scd2_snapshot_diff,
        )

        plan = x_scd2_snapshot_diff(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "Join" not in plan
        assert "partial_max_by" in plan


class TestHeavyHittersMonitor:
    def test_batch_twin_invariants(self, spark, sf_dir):
        """st_heavy_hitters structural contract: <= HH_TOP rows per day,
        dense ranks ordered by exact count, CMS never undercounts,
        share_ppm bounded by 1e6 and consistent with exact_cnt."""
        from snowflake_to_postgres_spark.operators.analytics_ext import HH_TOP
        from snowflake_to_postgres_spark.streaming.queries import st_heavy_hitters

        rows = st_heavy_hitters(spark, sf_dir).collect()
        assert rows
        by_day = {}
        for r in rows:
            by_day.setdefault(r["day"], []).append(r)
            assert r["never_undercounts"] and r["cms_estimate"] >= r["exact_cnt"]
            assert 0 < r["share_ppm"] <= 1_000_000
        for day, rs in by_day.items():
            assert len(rs) <= HH_TOP
            assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
                range(1, len(rs) + 1)
            )
            cnts = [r["exact_cnt"] for r in sorted(rs, key=lambda r: r["rank"])]
            assert cnts == sorted(cnts, reverse=True)

    def test_stream_parity_planted_skew_and_idempotent(self, spark, sf_dir, tmp_path):
        """The streaming monitor: per micro-batch rows must equal the
        shared kernel run on the same chunks, a planted hot key must
        surface at rank 1 with its exact share, and a restart on the
        same checkpoint must change nothing."""
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.analytics_ext import (
            cms_heavy_hitters_by_group,
        )
        from snowflake_to_postgres_spark.sources import load_table
        from snowflake_to_postgres_spark.streaming.pipeline import heavy_hitters_stream

        events = load_table(spark, sf_dir, "events")
        n = events.count()
        half = events.limit(n // 2)
        rest = events.subtract(half)
        # plant a hot key: ~40% of the second chunk becomes user -99
        planted = rest.withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 < 4, F.lit(-99)).otherwise(
                F.col("user_id")
            ),
        )
        n_hot = planted.filter(F.col("user_id") == -99).count()
        n_chunk = planted.count()
        assert n_hot > 0

        src = str(tmp_path / "src")
        half.coalesce(1).write.parquet(f"{src}/chunk0.parquet")
        planted.coalesce(1).write.parquet(f"{src}/chunk1.parquet")

        def make_stream():
            return (
                spark.readStream.schema(events.schema)
                .format("parquet")
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .load(src)
            )

        monitor = str(tmp_path / "monitor")
        ckpt = str(tmp_path / "ckpt")
        heavy_hitters_stream(spark, sf_dir, monitor, ckpt, events=make_stream())

        got = spark.read.parquet(monitor)
        rows = sorted(
            (r["batch_id"], r["rank"], r["user_id"], r["exact_cnt"],
             r["cms_estimate"], r["share_ppm"])
            for r in got.collect()
        )
        assert len({b for b, *_ in rows}) == 2

        # parity: the shared kernel over the same chunks
        expected = []
        for i, c in enumerate([half, planted]):
            rep = cms_heavy_hitters_by_group(
                c.withColumn("bid", F.lit(i).cast("bigint")), "user_id", "bid"
            ).collect()
            expected.extend(
                (r["bid"], r["rank"], r["v"], r["exact_cnt"],
                 r["cms_estimate"], r["share_ppm"])
                for r in rep
            )
        assert rows == sorted(expected)

        # planted skew surfaces at rank 1 of the hot batch with its share
        hot_batch = max(b for b, *_ in rows)
        top = [r for r in rows if r[0] == hot_batch and r[1] == 1][0]
        assert top[2] == -99 and top[3] == n_hot
        assert top[5] == n_hot * 1_000_000 // n_chunk

        # restart idempotence
        heavy_hitters_stream(spark, sf_dir, monitor, ckpt, events=make_stream())
        again = sorted(
            (r["batch_id"], r["rank"], r["user_id"], r["exact_cnt"],
             r["cms_estimate"], r["share_ppm"])
            for r in spark.read.parquet(monitor).collect()
        )
        assert again == rows

    def test_kernel_reserved_group_col_raises(self, spark):
        from snowflake_to_postgres_spark.operators.analytics_ext import (
            cms_heavy_hitters_by_group,
        )

        df = spark.createDataFrame([(1, 1)], ["v", "x"])
        with pytest.raises(ValueError, match="reserved"):
            cms_heavy_hitters_by_group(df, "x", "v")


def make_wav(samples, rate=8000, n_ch=1, extra_chunk=False):
    """Minimal 16-bit PCM WAV encoder (test-only). ``samples`` is mono;
    stereo duplicates the channel. ``extra_chunk`` inserts a LIST chunk
    before data to exercise chunk-walking."""
    data = bytearray()
    for s in samples:
        for _ in range(n_ch):
            data += int(s).to_bytes(2, "little", signed=True)
    fmt = (
        (1).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * n_ch * 2).to_bytes(4, "little")
        + (n_ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if extra_chunk:
        chunks += b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    chunks += b"data" + len(data).to_bytes(4, "little") + bytes(data)
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


class TestAudioDecode:
    def test_wav_roundtrip_mono_stereo_and_chunkwalk(self):
        from snowflake_to_postgres_spark.operators.multimodal import _decode_wav

        samples = [0, 1000, -1000, 32767, -32768, 7, -7] * 20
        rate, ch, mono = _decode_wav(make_wav(samples))
        assert (rate, ch, mono) == (8000, 1, samples)
        # stereo (identical channels) averages back to the same mono
        rate, ch, mono = _decode_wav(make_wav(samples, n_ch=2))
        assert (rate, ch) == (8000, 2) and mono == samples
        # extra metadata chunk between fmt and data is skipped cleanly
        _, _, mono = _decode_wav(make_wav(samples, extra_chunk=True))
        assert mono == samples

    def test_wav_gated_formats_raise(self):
        import pytest as _pytest

        from snowflake_to_postgres_spark.operators.multimodal import _decode_wav

        samples = [0] * 100
        good = bytearray(make_wav(samples))
        bad_fmt = bytearray(good)
        bad_fmt[20] = 3  # IEEE float
        with _pytest.raises(NotImplementedError):
            _decode_wav(bytes(bad_fmt))
        bad_bits = bytearray(good)
        bad_bits[34] = 8
        with _pytest.raises(NotImplementedError):
            _decode_wav(bytes(bad_bits))
        with _pytest.raises(ValueError):
            _decode_wav(b"ID3\x04mp3-ish-bytes")
        with _pytest.raises(ValueError):
            _decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data

    def test_fingerprint_properties_and_near_dup(self):
        """Gain-scaled audio keeps a close fingerprint (energy ORDER is
        preserved -> identical bits); unrelated noise does not."""
        from snowflake_to_postgres_spark.operators.multimodal import _audio_fp_bits

        base = [((i * 37) % 200 - 100) * (1 + (i // 100) % 5) for i in range(1300)]
        louder = [s * 2 for s in base]
        assert _audio_fp_bits(base) == _audio_fp_bits(louder)
        other = [((i * 101) % 199 - 99) * (1 + (i // 64) % 7) for i in range(1300)]
        a = int(_audio_fp_bits(base), 16)
        b = int(_audio_fp_bits(other), 16)
        assert bin(a ^ b).count("1") > 3

    def test_spark_path_and_banded_pairs_on_planted_dup(self, spark):
        """audio_fingerprints(real) + dhash_pairs: a planted gain-dup
        WAV pair lands at Hamming 0 through the banded search; the
        unrelated track does not pair with it."""
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.multimodal import (
            audio_fingerprints,
            dhash_pairs,
        )

        base = [((i * 37) % 200 - 100) * (1 + (i // 100) % 5) for i in range(1300)]
        louder = [s * 3 for s in base]
        other = [((i * 101) % 199 - 99) * (1 + (i // 64) % 7) for i in range(1300)]
        media = spark.createDataFrame(
            [
                (1, bytearray(make_wav(base))),
                (2, bytearray(make_wav(louder, n_ch=2))),
                (3, bytearray(make_wav(other))),
            ],
            "doc_id long, payload binary",
        )
        fps = audio_fingerprints(media, real_decode=True).withColumnRenamed(
            "fp_hex", "dhash_hex"
        )
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"] for r in dhash_pairs(fps).collect()
        }
        assert pairs.get((1, 2)) == 0
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_registered_synth_matches_python_reference(self, spark, sf_dir):
        """Triple-check beyond the DuckDB oracle: the registered synth
        fingerprint equals a plain-Python evaluation of the same spec
        for a sample of documents."""
        from snowflake_to_postgres_spark.operators.multimodal import (
            _AUDIO_SYNTH_MULT,
            AUDIO_FP_FRAME_LEN,
            AUDIO_FP_FRAMES,
            mm_audio_fingerprint,
        )

        rows = mm_audio_fingerprint(spark, sf_dir).limit(5).collect()
        assert rows
        for r in rows:
            doc = r["doc_id"]
            e = [
                sum(
                    ((doc + 1) * (f * AUDIO_FP_FRAME_LEN + k + 1) * _AUDIO_SYNTH_MULT)
                    % 65536
                    for k in range(AUDIO_FP_FRAME_LEN)
                )
                for f in range(AUDIO_FP_FRAMES)
            ]
            bits = 0
            for f in range(AUDIO_FP_FRAMES - 1):
                bits = (bits << 1) | (1 if e[f] > e[f + 1] else 0)
            assert r["fp_hex"] == f"{bits:016x}", doc
            assert r["n_frames"] == AUDIO_FP_FRAMES


def make_avi(w, h, frames_rgb, codec=b"db"):
    """Minimal uncompressed-DIB AVI encoder (test-only): RIFF('AVI ')
    with LIST('hdrl'){avih} + LIST('movi'){'00db' DIB frames} — frames
    given as top-down RGB, stored bottom-up BGR with 4-byte row pad."""

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    avih = bytearray(56)
    avih[32:36] = w.to_bytes(4, "little")
    avih[36:40] = h.to_bytes(4, "little")
    row_bytes = (w * 3 + 3) // 4 * 4
    movi = b""
    for rgb in frames_rgb:
        dib = bytearray(row_bytes * h)
        for y in range(h):
            for x in range(w):
                s = (y * w + x) * 3
                d = (h - 1 - y) * row_bytes + x * 3
                dib[d] = rgb[s + 2]
                dib[d + 1] = rgb[s + 1]
                dib[d + 2] = rgb[s]
        movi += chunk(b"00" + codec, bytes(dib))
    body = lst(b"hdrl", chunk(b"avih", bytes(avih))) + lst(b"movi", movi)
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"AVI " + body


class TestVideoFrames:
    def test_avi_roundtrip_and_sampling(self):
        from snowflake_to_postgres_spark.operators.multimodal import (
            _decode_avi_frames,
        )

        w, h = 9, 6
        frames = [
            bytes(((x * 11 + y * 3 + f * 17 + c * 5) & 0xFF)
                  for y in range(h) for x in range(w) for c in range(3))
            for f in range(5)
        ]
        gw, gh, got = _decode_avi_frames(make_avi(w, h, frames))
        assert (gw, gh) == (w, h)
        assert got == frames
        # every=2 keeps frames 0, 2, 4
        _, _, sampled = _decode_avi_frames(make_avi(w, h, frames), every=2)
        assert sampled == [frames[0], frames[2], frames[4]]

    def test_avi_gated_and_malformed(self):
        import pytest as _pytest

        from snowflake_to_postgres_spark.operators.multimodal import (
            _decode_avi_frames,
        )

        w, h = 4, 4
        f0 = bytes(range(48))
        with _pytest.raises(NotImplementedError, match="codec"):
            _decode_avi_frames(make_avi(w, h, [f0], codec=b"dc"))
        with _pytest.raises(ValueError):
            _decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
        with _pytest.raises(ValueError, match="missing avih"):
            _decode_avi_frames(b"RIFF\x04\x00\x00\x00AVI ")

    def test_video_near_dup_by_shared_frames(self, spark):
        """Two videos sharing re-encoded frames surface through the
        frame-dhash + banded-pair machinery; per-video containment
        counts matched frames."""
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.multimodal import (
            dhash_pairs,
            video_frame_dhash,
        )

        w, h = 18, 12

        def grad(f):
            # per-frame multiplicative pattern: dHash is invariant to
            # constant brightness offsets, so frames must differ in
            # STRUCTURE; verified pairwise distinct beyond hamming 3
            m = 2 * f + 1
            return bytes(
                (((x * 97 + y * 57 + c * 31) * m) & 0xFF)
                for y in range(h) for x in range(w) for c in range(3)
            )

        a = [grad(0), grad(1), grad(2), grad(3)]
        b = [grad(2), grad(3), grad(9)]      # shares 2 frames with a
        c = [grad(20), grad(30)]             # shares none
        media = spark.createDataFrame(
            [(1, bytearray(make_avi(w, h, a))),
             (2, bytearray(make_avi(w, h, b))),
             (3, bytearray(make_avi(w, h, c)))],
            "doc_id long, payload binary",
        )
        fd = video_frame_dhash(media, real_decode=True)
        assert fd.count() == 9
        # frame-level near-dups via the banded topology: key by a
        # composite id (video, frame) packed into one long
        keyed = fd.select(
            (F.col("doc_id") * 1000 + F.col("frame_no")).alias("doc_id"),
            "dhash_hex",
        )
        pairs = dhash_pairs(keyed, max_hamming=0)
        matched = (
            pairs.select(
                (F.col("doc_a") / 1000).cast("long").alias("va"),
                (F.col("doc_b") / 1000).cast("long").alias("vb"),
            )
            .filter(F.col("va") != F.col("vb"))
            .groupBy("va", "vb")
            .count()
            .collect()
        )
        got = {(r["va"], r["vb"]): r["count"] for r in matched}
        assert got == {(1, 2): 2}

    def test_stand_in_fanout_contract(self, spark):
        from snowflake_to_postgres_spark.operators.multimodal import (
            video_frame_dhash,
        )

        media = spark.createDataFrame(
            [(5, bytearray(bytes(1024)))], "doc_id long, payload binary"
        )
        rows = video_frame_dhash(media, every=2).collect()
        assert [r["frame_no"] for r in rows] == [0, 2]
        assert all(len(r["dhash_hex"]) == 16 for r in rows)


class TestCmsJoinCardinality:
    def test_registered_guarantee(self, spark, sf_dir):
        from snowflake_to_postgres_spark.operators.analytics_ext import (
            a27_cms_join_cardinality,
        )

        r = a27_cms_join_cardinality(spark, sf_dir).collect()[0]
        assert r["never_undercounts"]
        assert r["cms_estimate"] >= r["exact_pairs"] > 0
        assert r["rel_err_ppm"] >= 0

    def test_inner_product_never_undercounts_randomized(self, spark):
        """CMS inner-product guarantee on adversarial input: a planted
        hot key on both sides (where collisions inflate hardest) still
        never undercounts, and the estimate is exact when the sketch is
        collision-free."""
        import random

        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.analytics_ext import (
            CMS_D,
            CMS_W,
            _cms_bucket,
        )

        rng = random.Random(12)
        a_keys = [rng.randrange(10_000) for _ in range(400)] + [77] * 200
        b_keys = [rng.randrange(10_000) for _ in range(300)] + [77] * 100
        a = spark.createDataFrame([(k,) for k in a_keys], ["k"])
        b = spark.createDataFrame([(k,) for k in b_keys], ["k"])
        seeds = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")

        def sketch(side, cn):
            return (
                side.select("k", seeds)
                .select("i", _cms_bucket(F.col("i"), F.col("k")).alias("b"))
                .groupBy("i", "b")
                .agg(F.count("*").alias(cn))
            )

        est = (
            sketch(a, "ca")
            .join(sketch(b, "cb"), ["i", "b"])
            .groupBy("i")
            .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
            .agg(F.min("dot").alias("est"))
            .collect()[0]["est"]
        )
        exact = sum(
            a_keys.count(k) * b_keys.count(k) for k in set(a_keys) & set(b_keys)
        )
        assert est >= exact > 0


class TestKAnonymity:
    def test_planted_below_k_group_surfaces(self, spark):
        from snowflake_to_postgres_spark.operators.validation import (
            k_anonymity_report,
        )

        rows = [("us", "auto")] * 10 + [("fr", "auto")] * 2
        df = spark.createDataFrame(rows, ["nat", "seg"])
        rep = {
            (r["nat"], r["seg"]): (r["group_size"], r["below_k"])
            for r in k_anonymity_report(df, ["nat", "seg"], k=5).collect()
        }
        assert rep[("us", "auto")] == (10, False)
        assert rep[("fr", "auto")] == (2, True)

    def test_registered_summary_row(self, spark, sf_dir):
        from snowflake_to_postgres_spark.operators.validation import val_k_anonymity

        rows = val_k_anonymity(spark, sf_dir).collect()
        total = [r for r in rows if r["quasi_nation"] == "<TOTAL>"]
        assert len(total) == 1
        detail = [r for r in rows if r["quasi_nation"] != "<TOTAL>"]
        assert total[0]["group_size"] == min(r["group_size"] for r in detail)
        assert total[0]["below_k"] == any(r["below_k"] for r in detail)


class TestCardinalityMonitor:
    def test_column_estimator_matches_driver_twin(self, spark, sf_dir):
        """hll_estimate_cols must produce the EXACT double the a18
        driver-side estimator produces from the same fold."""
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.analytics_ext import (
            _hll_est_parts,
            hll_estimate_cols,
            hll_fold_by_group,
        )
        from snowflake_to_postgres_spark.sources import load_table

        ev = load_table(spark, sf_dir, "events").withColumn(
            "day", F.col("ts").cast("date")
        )
        rows = hll_estimate_cols(hll_fold_by_group(ev, "user_id", "day")).collect()
        assert rows
        for r in rows:
            v_zero, s_scaled, est = _hll_est_parts(r["k_used"], r["s_hit"])
            assert (r["v_zero"], r["s_scaled"]) == (v_zero, s_scaled)
            assert r["hll_estimate"] == est, r["day"]

    def test_registered_accuracy(self, spark, sf_dir):
        """Per-day estimates within the standard HLL error envelope for
        m=256 (~1.04/sqrt(256) = 6.5%; allow 3 sigma)."""
        from snowflake_to_postgres_spark.streaming.queries import st_cardinality

        rows = st_cardinality(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["exact_distinct"] > 0
            rel = abs(r["hll_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
            assert rel < 0.20, (r["day"], rel)

    def test_stream_parity_and_idempotence(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.analytics_ext import (
            hll_estimate_cols,
            hll_fold_by_group,
        )
        from snowflake_to_postgres_spark.sources import load_table
        from snowflake_to_postgres_spark.streaming.pipeline import cardinality_stream

        events = load_table(spark, sf_dir, "events")
        n = events.count()
        half = events.limit(n // 2)
        rest = events.subtract(half)
        src = str(tmp_path / "src")
        half.coalesce(1).write.parquet(f"{src}/chunk0.parquet")
        rest.coalesce(1).write.parquet(f"{src}/chunk1.parquet")

        def make_stream():
            return (
                spark.readStream.schema(events.schema)
                .format("parquet")
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .load(src)
            )

        monitor = str(tmp_path / "monitor")
        ckpt = str(tmp_path / "ckpt")
        cardinality_stream(spark, sf_dir, monitor, ckpt, events=make_stream())
        got = sorted(
            (r["batch_id"], r["k_used"], r["s_hit"], r["hll_estimate"])
            for r in spark.read.parquet(monitor).collect()
        )
        assert len(got) == 2

        expected = []
        for i, c in enumerate([half, rest]):
            rep = hll_estimate_cols(
                hll_fold_by_group(
                    c.withColumn("bid", F.lit(i).cast("bigint")), "user_id", "bid"
                )
            ).collect()[0]
            expected.append((i, rep["k_used"], rep["s_hit"], rep["hll_estimate"]))
        assert got == sorted(expected)

        cardinality_stream(spark, sf_dir, monitor, ckpt, events=make_stream())
        again = sorted(
            (r["batch_id"], r["k_used"], r["s_hit"], r["hll_estimate"])
            for r in spark.read.parquet(monitor).collect()
        )
        assert again == got

    def test_kernel_reserved_group_col_raises(self, spark):
        from snowflake_to_postgres_spark.operators.analytics_ext import (
            hll_fold_by_group,
        )

        df = spark.createDataFrame([(1, 1)], ["j", "x"])
        with pytest.raises(ValueError, match="reserved"):
            hll_fold_by_group(df, "x", "j")


class TestSaltPlan:
    def test_planted_hot_key_gets_proportional_salt(self, spark, sf_dir, tmp_path):
        """A key holding ~40% of rows must be recommended ceil(0.4 × 32)
        = 13 salt buckets; uniform keys must not appear at all."""
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.analytics_ext import (
            SALT_PLAN_PARTITIONS,
            diag_salt_plan,
        )
        from snowflake_to_postgres_spark.sources import load_table

        # plant: rewrite events with 40% of rows on user -5, park it as
        # a parquet dir and point the query at it
        events = load_table(spark, sf_dir, "events")
        planted = events.withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 < 4, F.lit(-5)).otherwise(
                F.col("user_id")
            ),
        )
        sfdir = str(tmp_path / "sf")
        import os
        import shutil

        os.makedirs(sfdir)
        planted.write.parquet(os.path.join(sfdir, "events.parquet"))
        rows = diag_salt_plan(spark, sfdir).collect()
        # the hot key leads the plan (small fixtures may legitimately
        # surface other keys above 1/32 — the plan is ordered by count)
        r = rows[0]
        assert r["user_id"] == -5
        total = planted.count()
        cnt = planted.filter(F.col("user_id") == -5).count()
        assert r["cnt"] == cnt
        assert r["share_ppm"] == cnt * 1_000_000 // total
        want_salt = (cnt * SALT_PLAN_PARTITIONS + total - 1) // total
        assert r["salt_buckets"] == want_salt >= 2
        assert all(x["salt_buckets"] <= want_salt for x in rows)
        shutil.rmtree(sfdir)

    def test_every_row_satisfies_threshold_and_math(self, spark, sf_dir):
        """Every emitted row must actually exceed the share threshold
        with exact integer math (at sf0.01+ the uniform fixture emits
        zero rows — the oracle checks that emptiness; the tiny sf0.001
        test fixture has few enough users that rows legitimately
        appear, which makes it the exact-math check)."""
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.analytics_ext import (
            SALT_PLAN_PARTITIONS,
            SALT_PLAN_SHARE_PPM,
            diag_salt_plan,
        )
        from snowflake_to_postgres_spark.sources import load_table

        total = load_table(spark, sf_dir, "events").count()
        for r in diag_salt_plan(spark, sf_dir).collect():
            assert r["share_ppm"] == r["cnt"] * 1_000_000 // total
            assert r["share_ppm"] > SALT_PLAN_SHARE_PPM
            assert r["salt_buckets"] == (
                r["cnt"] * SALT_PLAN_PARTITIONS + total - 1
            ) // total


class TestQuotaSample:
    def test_cap_and_determinism(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.operators.pipeline_ext import (
            QUOTA_PER_SOURCE,
            pipe_quota_sample,
        )
        from snowflake_to_postgres_spark.sources import load_table

        rows = pipe_quota_sample(spark, sf_dir).collect()
        assert rows
        docs = load_table(spark, sf_dir, "documents")
        per_src = {
            r["source"]: r["cnt"]
            for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()
        }
        for r in rows:
            assert r["n_kept"] == min(QUOTA_PER_SOURCE, per_src[r["source"]])
            assert r["n_docs"] == per_src[r["source"]]
            assert r["chars_kept"] <= r["chars_total"]
        # kept chars are the TOP-n_chars docs: recompute one source
        src = rows[0]["source"]
        want = sum(
            sorted(
                (d["n_chars"] for d in docs.filter(F.col("source") == src).collect()),
                reverse=True,
            )[:QUOTA_PER_SOURCE]
        )
        assert rows[0]["chars_kept"] == want


# ---------------------------------------------------------------------------
# randomized property coverage for the round-12 decoders (hypothesis):
# encode→decode must be the identity for every valid input, not just the
# hand-picked fixtures above.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


class TestDecoderProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 10),
        colortype=st.sampled_from([0, 2, 4, 6]),
        data=st.data(),
    )
    def test_png_roundtrip_random(self, w, h, colortype, data):
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
        pix = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * nch,
                    max_size=w * h * nch,
                )
            )
        )
        filters = data.draw(st.lists(st.integers(0, 4), min_size=1, max_size=5))
        gw, gh, rgb = _decode_png(make_png(w, h, pix, colortype, filters))
        assert (gw, gh) == (w, h)
        # reference normalization of the raw samples to RGB
        want = bytearray()
        for i in range(w * h):
            s = i * nch
            if colortype in (0, 4):
                want += bytes((pix[s], pix[s], pix[s]))
            else:
                want += pix[s : s + 3]
        assert rgb == bytes(want)

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(65, 400),
        n_ch=st.integers(1, 2),
        data=st.data(),
    )
    def test_wav_roundtrip_random(self, n, n_ch, data):
        from snowflake_to_postgres_spark.operators.multimodal import _decode_wav

        samples = data.draw(
            st.lists(st.integers(-32768, 32767), min_size=n, max_size=n)
        )
        rate, ch, mono = _decode_wav(make_wav(samples, n_ch=n_ch))
        assert (rate, ch) == (8000, n_ch)
        assert mono == samples  # identical channels average to themselves

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 6),
        n_frames=st.integers(1, 6),
        every=st.integers(1, 3),
        data=st.data(),
    )
    def test_avi_roundtrip_random(self, w, h, n_frames, every, data):
        from snowflake_to_postgres_spark.operators.multimodal import (
            _decode_avi_frames,
        )

        frames = [
            bytes(
                data.draw(
                    st.lists(
                        st.integers(0, 255),
                        min_size=w * h * 3,
                        max_size=w * h * 3,
                    )
                )
            )
            for _ in range(n_frames)
        ]
        gw, gh, got = _decode_avi_frames(make_avi(w, h, frames), every=every)
        assert (gw, gh) == (w, h)
        assert got == frames[::every]

    @settings(max_examples=20, deadline=None)
    @given(data=st.data())
    def test_audio_fp_gain_invariance_random(self, data):
        """Positive gain never changes the fingerprint (energy ORDER is
        preserved exactly under integer scaling)."""
        from snowflake_to_postgres_spark.operators.multimodal import (
            _audio_fp_bits,
        )

        n = data.draw(st.integers(130, 650))
        base = data.draw(
            st.lists(st.integers(-3000, 3000), min_size=n, max_size=n)
        )
        gain = data.draw(st.integers(2, 9))
        assert _audio_fp_bits(base) == _audio_fp_bits([s * gain for s in base])
