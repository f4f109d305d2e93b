"""Round-14 additions: ADVICE fixes, quota-stream state retention,
occupancy-driven RP-LSH bits, bench ambient calibration, 16-bit +
Adam7-interlaced PNG decode, and the join-plan CLI verb."""
import pytest


def _chunk(cid, body):
    pad = b"\x00" if len(body) % 2 else b""
    return cid + len(body).to_bytes(4, "little") + body + pad


def _lst(kind, body):
    return _chunk(b"LIST", kind + body)


class TestAviStrayStrf:
    def test_stray_second_strf_not_reinterpreted(self):
        """ADVICE r13: a stray second strf following a consumed vids
        strh must not be re-read as the video format header — a junk
        32-bpp strf after a valid 24-bpp one must not gate an
        otherwise-decodable stream."""
        from snowflake_to_postgres_spark.operators.multimodal import (
            _decode_avi_frames,
        )
        from tests.test_round12_ops import make_avi

        w, h = 4, 3
        rgb = bytes(((x * 7 + y * 5 + c) & 0xFF)
                    for y in range(h) for x in range(w) for c in range(3))
        good = make_avi(w, h, [rgb])
        # rebuild with an strl carrying strh(vids) + valid 24-bpp strf
        # + a stray junk strf claiming 32 bpp
        avih = bytearray(56)
        avih[32:36] = w.to_bytes(4, "little")
        avih[36:40] = h.to_bytes(4, "little")
        strf24 = bytearray(40)
        strf24[14:16] = (24).to_bytes(2, "little")
        strf_junk = bytearray(40)
        strf_junk[14:16] = (32).to_bytes(2, "little")
        row_bytes = (w * 3 + 3) // 4 * 4
        dib = bytearray(row_bytes * h)
        for y in range(h):
            for x in range(w):
                s = (y * w + x) * 3
                d = (h - 1 - y) * row_bytes + x * 3
                dib[d], dib[d + 1], dib[d + 2] = rgb[s + 2], rgb[s + 1], rgb[s]
        body = _lst(
            b"hdrl",
            _chunk(b"avih", bytes(avih))
            + _lst(
                b"strl",
                _chunk(b"strh", b"vids" + bytes(52))
                + _chunk(b"strf", bytes(strf24))
                + _chunk(b"strf", bytes(strf_junk)),  # stray — must be ignored
            ),
        ) + _lst(b"movi", _chunk(b"00db", bytes(dib)))
        avi = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"AVI " + body
        gw, gh, frames = _decode_avi_frames(avi)
        assert (gw, gh) == (w, h)
        assert frames == [rgb]
        # sanity: the unmodified encoder's output still round-trips
        assert _decode_avi_frames(good)[2] == [rgb]


class TestQuotaStreamRetention:
    """Round-14 ask #4 / ADVICE r13: state partitions older than the
    immediate prior batch are pruned after each commit, so a long-lived
    stream's state listing stays O(1) instead of O(#batches) — without
    giving up replay idempotence or cross-batch quota correctness."""

    def _drain(self, spark, sf_dir, tmp_path, quota, n_chunks):
        import os

        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.sources import load_table
        from snowflake_to_postgres_spark.streaming.pipeline import (
            quota_sample_stream,
        )

        docs = load_table(spark, sf_dir, "documents")
        src = str(tmp_path / "src")
        chunked = docs.withColumn(
            "chunk", F.abs(F.hash("doc_id")) % n_chunks
        )
        for c in range(n_chunks):
            chunked.filter(F.col("chunk") == c).drop("chunk").coalesce(
                1
            ).write.parquet(f"{src}/chunk{c:02d}.parquet")

        def make_stream():
            return (
                spark.readStream.schema(docs.schema)
                .format("parquet")
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true")
                .load(src)
            )

        out, state, ckpt = (
            str(tmp_path / "out"),
            str(tmp_path / "state"),
            str(tmp_path / "ckpt"),
        )
        quota_sample_stream(
            spark, sf_dir, out, state, ckpt, docs=make_stream(), quota=quota
        )
        return docs, out, state, ckpt, make_stream

    def test_long_drain_bounded_state_and_idempotent_replay(
        self, spark, sf_dir, tmp_path
    ):
        import os

        from pyspark.sql import functions as F

        from snowflake_to_postgres_spark.streaming.pipeline import (
            quota_sample_stream,
        )

        quota, n_chunks = 3, 22
        docs, out, state, ckpt, make_stream = self._drain(
            spark, sf_dir, tmp_path, quota, n_chunks
        )
        batches = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(out)
            if d.startswith("batch=")
        )
        assert len(batches) >= 20, "drain did not produce ≥20 micro-batches"
        # retention: at most the current + immediate-prior state partitions
        state_dirs = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(state)
            if d.startswith("batch=")
        )
        assert state_dirs == batches[-2:], state_dirs
        # quota still enforced across the WHOLE stream despite pruning
        kept = spark.read.parquet(out)
        per_src = {
            r["source"]: r["n"]
            for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        totals = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        for s, n_total in totals.items():
            assert per_src.get(s, 0) == min(quota, n_total), s
        # restart with the same checkpoint: no new batches, nothing changes
        before = sorted(tuple(r) for r in kept.collect())
        state_before = sorted(
            tuple(r) for r in spark.read.parquet(state).collect()
        )
        quota_sample_stream(
            spark, sf_dir, out, state, ckpt, docs=make_stream(), quota=quota
        )
        assert sorted(tuple(r) for r in spark.read.parquet(out).collect()) == before
        assert (
            sorted(tuple(r) for r in spark.read.parquet(state).collect())
            == state_before
        )
        assert sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(state)
            if d.startswith("batch=")
        ) == state_dirs
