"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codec libraries. The decode kernels
therefore run in two modes: the default deterministic stand-in (oracle-
checkable — dimensions derived from the payload digest), and
``real_decode=True``, which since round 11 REALLY decodes the formats
a pure-Python reader can handle — P6 PPM, uncompressed 24-bit BMP,
and (since round 12) non-interlaced 8-bit PNG via stdlib zlib,
including palette (PLTE) PNGs since round 13
(decode, feature-extract, nearest-neighbor resize, P6 re-encode) —
and raises toward the PIL/torchvision plug-in point for every other
magic (JPEG, 16-bit/interlaced PNG). The hot byte loops are numpy
array ops since round 13 (WAV mono fold, PNG None/Sub/Up unfilter +
channel expansion, BMP/AVI row slicing, dhash grid, resize gather —
round-12 verdict #1). Everything around them — schema contracts, Arrow
batch shape, ``mapInPandas`` plumbing, partition sizing — is identical
in both modes, which is the part that matters for a 100 TB pipeline: the decode UDF is embarrassingly parallel; the design
questions are batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``
vs payload size) and avoiding shuffles of the binary column (decode early,
project metadata, drop payload before any join).

The ``mm_binary_meta`` query is oracle-checked (pure binary functions);
the mapInPandas operators are pytest-covered (not SQL-expressible).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_to_postgres_spark.registry import QuerySpec
from snowflake_to_postgres_spark.sources import load_table


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Stand-in ingestion: materialize an opaque binary column (utf-8
    payload of text) + media-type metadata, the shape a real multimodal
    table has (payload binary, media_type string, byte_length long)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("byte_length"),
    )


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: byte length, content digest, magic
    prefix — the dedup/validation layer for opaque media payloads
    (BINARY/VARBINARY handling per SURVEY §1.3, translator.py:38-39)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("byte_length"),
        F.md5(payload).alias("payload_md5"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "utf-8"))).alias("magic_hex"),
    )


MM_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_length,
       md5(text) AS payload_md5,
       lower(hex(encode(substring(text, 1, 4)))) AS magic_hex
FROM documents
"""


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, n_features: int = 8) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decoder: dimensions and a
    feature vector derived from the payload digest. Replace with a real
    codec (PIL/ffmpeg) where available."""
    d = hashlib.md5(payload).digest()
    width = 64 + d[0] % 64
    height = 64 + d[1] % 64
    channels = 3
    features = [b / 255.0 for b in d[:n_features]]
    return width, height, channels, features


def _decode_ppm(b: bytes) -> tuple[int, int, bytes]:
    """Pure-Python P6 (binary PPM) decoder: (width, height, raw RGB).
    Netpbm is THE trivially-decodable interchange format — ASCII header
    (`P6 <w> <h> <maxval>` with #-comments allowed), then w·h·3 raw
    bytes — which is why it is the round-11 choice for exercising the
    real-decode path end-to-end without a codec library."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: whitespace-separated, '#' starts a comment
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(b[start:pos])
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported natively")
    need = width * height * 3
    pix = b[pos : pos + need]
    if len(pix) != need:
        raise ValueError("truncated PPM pixel data")
    return width, height, pix


def _decode_bmp(b: bytes) -> tuple[int, int, bytes]:
    """Pure-Python uncompressed 24-bit BMP decoder: (width, height,
    raw RGB, top-down row order). BMP stores rows bottom-up, BGR, padded
    to 4-byte boundaries — all undone here."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(b[10:14], "little")
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    compression = int.from_bytes(b[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            "only uncompressed 24-bit BMP supported natively; plug PIL here"
        )
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    if len(b) < data_off + row_bytes * height - (row_bytes - width * 3):
        raise ValueError("truncated BMP pixel data")
    # Vectorized row de-pad + vertical flip + BGR→RGB (round-12 verdict
    # #1): the pixel block reshapes to (rows, row_bytes), padding slices
    # off, ::-1 flips rows (bottom-up storage) and channels in one view.
    padded = np.frombuffer(
        b[data_off : data_off + row_bytes * height].ljust(row_bytes * height, b"\0"),
        dtype=np.uint8,
    ).reshape(height, row_bytes)
    rows = padded[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return width, height, rows[:, :, ::-1].tobytes()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


#: Adam7 pass grid: (x_origin, y_origin, x_step, y_step) per pass, in
#: stream order — each pass is an independent sub-image with its own
#: filtered scanlines, scattered back on the step lattice.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(scan, width: int, fu: int):
    """Undo the five PNG scanline filters over a (h, stride+1) uint8
    block: column 0 is the per-row filter id, ``fu`` is the filter unit
    (bytes per complete pixel — the 'left' distance; channels ×
    bytes-per-sample). Returns (h, stride) unfiltered bytes.

    Vectorization (round-12 verdict #1): None/Sub/Up are numpy array
    ops (Sub is a per-pixel-unit mod-256 cumsum); Average/Paeth keep
    the loop-carried left-pixel bytearray walk the filter definition
    forces (numpy SCALAR indexing measured ~2x slower)."""
    height, stride = scan.shape[0], scan.shape[1] - 1
    filters = scan[:, 0]
    if filters.size and int(filters.max()) > 4:
        raise ValueError(f"bad PNG scanline filter {int(filters.max())}")
    prev = np.zeros(stride, dtype=np.uint8)
    lines = np.empty((height, stride), dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = scan[y, 1:].copy()
        if f == 1:  # Sub: per-unit mod-256 cumulative sum
            line = (
                np.cumsum(line.reshape(stride // fu, fu), axis=0, dtype=np.int64)
                % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: uint8 addition wraps mod 256
            line += prev
        elif f == 3:  # Average: left term is loop-carried — bytearray
            # walk (numpy SCALAR indexing is ~2x slower than bytearray)
            pv = bytearray(prev.tobytes())
            ln = bytearray(line.tobytes())
            for i in range(stride):
                a = ln[i - fu] if i >= fu else 0
                ln[i] = (ln[i] + ((a + pv[i]) >> 1)) & 0xFF
            line = np.frombuffer(bytes(ln), dtype=np.uint8)
        elif f == 4:  # Paeth: left/upper-left terms are loop-carried
            pv = bytearray(prev.tobytes())
            ln = bytearray(line.tobytes())
            for i in range(stride):
                a = ln[i - fu] if i >= fu else 0
                c = pv[i - fu] if i >= fu else 0
                p = a + pv[i] - c
                pa, pb, pc = abs(p - a), abs(p - pv[i]), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (pv[i] if pb <= pc else c)
                ln[i] = (ln[i] + pr) & 0xFF
            line = np.frombuffer(bytes(ln), dtype=np.uint8)
        lines[y] = line
        prev = line
    return lines


def _decode_png(b: bytes) -> tuple[int, int, bytes]:
    """Pure-Python PNG decoder (round-11 verdict #5 — the first
    COMPRESSED format decoded entirely in-sandbox): stdlib ``zlib``
    inflates the concatenated IDAT stream, the five scanline filters
    (None/Sub/Up/Average/Paeth) are undone per row via
    :func:`_png_unfilter`, and the gray / gray+alpha / RGB / RGBA /
    palette (PLTE, round-12 verdict #6) color types normalize to raw
    8-bit RGB (alpha dropped — the feature/dhash path is color-only).

    Round-14 (round-13 verdict #6) closes the two remaining
    non-exotic web-crawl shapes: 16-bit samples (big-endian; reduced
    to 8-bit by the high byte — the exact 257-divisor scaling, since
    (v*257)>>8 == v) and Adam7 interlacing (seven independently
    filtered sub-images on the _ADAM7 lattice, unfiltered per pass
    with the pass's own left-distance and scattered back via strided
    assignment). Only sub-byte depths (1/2/4-bit gray and palette)
    still raise toward the codec plug-in point."""
    import struct
    import zlib

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = bitdepth = colortype = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            if length % 3 != 0 or length == 0:
                raise ValueError("malformed PNG PLTE chunk")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if colortype not in (0, 2, 3, 4, 6):
        raise ValueError(f"bad PNG color type {colortype}")
    if bitdepth not in (8, 16) or (colortype == 3 and bitdepth != 8):
        raise NotImplementedError(
            "native PNG decode covers 8/16-bit gray/RGB(A) and 8-bit "
            "palette (interlaced or not); sub-byte depths require a "
            "codec library"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if colortype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    fu = nch * (bitdepth // 8)  # filter unit: bytes per complete pixel
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = width * fu
        if len(raw) != (stride + 1) * height:
            raise ValueError("truncated PNG pixel data")
        scan = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
        px = _png_unfilter(scan, width, fu).reshape(height, width, fu)
    else:  # Adam7: seven sub-images, each filtered independently
        px = np.zeros((height, width, fu), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:  # pass empty at this image size
                continue
            stride = pw * fu
            block = raw[off : off + (stride + 1) * ph]
            if len(block) != (stride + 1) * ph:
                raise ValueError("truncated PNG pixel data")
            off += (stride + 1) * ph
            scan = np.frombuffer(block, dtype=np.uint8).reshape(ph, stride + 1)
            px[y0::dy, x0::dx] = _png_unfilter(scan, pw, fu).reshape(ph, pw, fu)
        if off != len(raw):
            raise ValueError("truncated PNG pixel data")
    if bitdepth == 16:
        # big-endian u16 → 8-bit via the high byte: exact for the
        # standard v8*257 widening and equals round(v16*255/65535)
        # within the codec convention
        px = px.reshape(height, width, nch, 2)[:, :, :, 0]
    else:
        px = px.reshape(height, width, nch)
    if colortype == 3:  # palette indices -> RGB via PLTE lookup
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("PNG palette index out of range")
        out = plte[idx]
    elif colortype in (0, 4):  # gray / gray+alpha -> replicate
        out = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # RGB / RGBA -> drop alpha
        out = px[:, :, :3]
    return width, height, np.ascontiguousarray(out).tobytes()


_NATIVE_FORMATS = (
    "P6 PPM, uncompressed 24-bit BMP, 8/16-bit PNG incl. Adam7 "
    "(gray/RGB(A)/8-bit palette)"
)


def _decode_pixels(b: bytes) -> tuple[int, int, bytes]:
    """Shared magic-byte dispatch for every real-decode consumer
    (decode / resize / dhash): (width, height, raw RGB) for the
    natively supported formats, NotImplementedError toward the codec
    plug-in point for the rest (JPEG etc.). Zero-area images (width or
    height 0 — well-formed headers, no pixels) are rejected HERE with
    the decoders' gated ValueError discipline (ADVICE r12) so no
    consumer divides by a zero pixel count in the executor."""
    if b[:2] == b"P6":
        w, h, pix = _decode_ppm(b)
    elif b[:2] == b"BM":
        w, h, pix = _decode_bmp(b)
    elif b[:8] == _PNG_MAGIC:
        w, h, pix = _decode_png(b)
    else:
        raise NotImplementedError(
            f"native decode covers {_NATIVE_FORMATS}; other formats require "
            "a codec library (plug PIL/torchvision here)"
        )
    if w * h == 0:
        raise ValueError(f"degenerate image dimensions {w}x{h}")
    return w, h, pix


def _real_decode(
    payload: bytes, n_features: int = 8
) -> tuple[int, int, int, list[float]]:
    """Real decode for the formats a pure-Python reader can handle (P6
    PPM, uncompressed 24-bit BMP, non-interlaced 8-bit PNG via stdlib
    zlib); any other magic still raises toward the PIL plug-in point.
    Features: per-channel means plus the first pixel and the global
    min/max, all normalized to [0, 1] — deterministic,
    codec-independent."""
    b = bytes(payload)
    width, height, pix = _decode_pixels(b)
    n = width * height
    arr = np.frombuffer(pix, dtype=np.uint8)
    # exact parity with the scalar reference: integer channel sums
    # (int64, exact) divided once in float64
    csum = arr.reshape(n, 3).sum(axis=0, dtype=np.int64)
    means = [float(csum[c]) / (255.0 * n) for c in range(3)]
    first = [pix[c] / 255.0 for c in range(3)]
    feats = (means + first + [int(arr.min()) / 255.0, int(arr.max()) / 255.0])[
        :n_features
    ]
    return width, height, 3, feats


def decode_images(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``: Arrow-batched, one
    Python worker per partition, schema fixed up front. ``real_decode``
    runs the pure-Python PPM/BMP reader (other formats raise toward the
    codec plug-in point); the default stand-in stays oracle-checkable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decode = _real_decode if real_decode else _fake_decode
            rows = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "features": [r[3] for r in rows],
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _real_resize(payload: bytes, max_dim: int) -> tuple[int, int, bytes]:
    """Nearest-neighbor downscale (never upscale) of a PPM/BMP/PNG
    payload, re-emitted as P6 PPM — the canonical
    normalize-to-interchange step of an image pipeline, in pure
    Python."""
    b = bytes(payload)
    w, h, pix = _decode_pixels(b)
    longest = max(w, h)
    if longest <= max_dim:
        nw, nh = w, h
        out_pix = pix
    else:
        nw = max(1, w * max_dim // longest)
        nh = max(1, h * max_dim // longest)
        # vectorized nearest-neighbor gather: source row/col index grids
        # (the same floor arithmetic as the scalar loop), one fancy-index
        src = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
        sy = (np.arange(nh, dtype=np.int64) * h) // nh
        sx = (np.arange(nw, dtype=np.int64) * w) // nw
        out_pix = np.ascontiguousarray(src[sy[:, None], sx[None, :]]).tobytes()
    header = f"P6\n{nw} {nh}\n255\n".encode("ascii")
    return nw, nh, header + out_pix


def resize_images(media: DataFrame, max_dim: int = 32, real_decode: bool = False) -> DataFrame:
    """Resize over ``mapInPandas``: with ``real_decode`` the pure-Python
    nearest-neighbor PPM/BMP downscale (P6 out); the default stub emits
    a truncated payload + clamped dims. The Spark contract (binary in,
    binary out, metadata columns) is identical either way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                rows = [_real_resize(p, max_dim) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].values,
                        "width": [r[0] for r in rows],
                        "height": [r[1] for r in rows],
                        "payload": [r[2] for r in rows],
                    }
                )
                continue
            out_payload = [bytes(p)[: max_dim * max_dim] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [max_dim] * len(pdf),
                    "height": [max_dim] * len(pdf),
                    "payload": out_payload,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 256, every: int = 4) -> DataFrame:
    """Frame-sampling stub for video payloads: chunk the byte stream and
    keep every k-th chunk — the fan-out (one row in, N frame rows out)
    and frame addressing are the real contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n = max(1, len(b) // frame_bytes)
                for fno in range(0, n, every):
                    ids.append(doc_id)
                    nos.append(fno)
                    frames.append(b[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(batches, schema=FRAMES_SCHEMA)


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal ingest→decode pipeline as a driver-checkable
    query: binary payload → Arrow-batched ``mapInPandas`` decode →
    per-document dimensions. The stand-in decoder derives dimensions
    from the payload's md5, which a SQL oracle can reproduce — so the
    *Python-UDF execution path itself* (Arrow transfer, batch iteration,
    schema contract) is oracle-verified, not just pytest-covered. With a
    real codec the oracle degrades to a rows-only check; the plumbing
    under test is identical."""
    media = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return decode_images(media).select("doc_id", "width", "height", "channels")


# hex-pair → byte via strpos arithmetic (no from_hex needed)
_B = (
    "(strpos('0123456789abcdef', substr(hx, {p1}, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(hx, {p2}, 1)) - 1"
)

MM_DECODE_ORACLE = f"""
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
b AS (
  SELECT doc_id,
         {_B.format(p1=1, p2=2)} AS b0,
         {_B.format(p1=3, p2=4)} AS b1
  FROM h
)
SELECT doc_id,
       CAST(64 + b0 % 64 AS INT) AS width,
       CAST(64 + b1 % 64 AS INT) AS height,
       CAST(3 AS INT) AS channels
FROM b
"""


SPECS = [
    QuerySpec("mm_binary_meta", mm_binary_meta, MM_META_ORACLE),
    QuerySpec("mm_decode_meta", mm_decode_meta, MM_DECODE_ORACLE),
]


MM_CHUNK_BYTES = 64  # fixed segmentation window (bytes)


def mm_chunk_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window byte segmentation of opaque media payloads — the
    audio-segmentation shape (waveform → fixed-duration windows) done as
    pure byte math, so unlike the codec-gated decode kernels it is fully
    oracle-checkable: each payload explodes into ⌈bytes/W⌉ chunks with
    (offset, length, fingerprint). Chunk fingerprints are md5 over the
    HEX image of the slice (DuckDB's md5/substring are VARCHAR-only; hex
    is byte-faithful in both engines so the fingerprints still identify
    byte ranges exactly).

    100-TB shape: explode + projection only — chunking is a map stage,
    the payload never shuffles; downstream per-chunk feature extraction
    (the decode UDFs above) parallelizes over chunks instead of whole
    files, which is what bounds Arrow batch memory for hour-long audio."""
    docs = load_table(spark, sf_dir, "documents")
    w = MM_CHUNK_BYTES
    media = docs.select(
        "doc_id",
        F.hex(F.encode("text", "utf-8")).alias("hx"),
        F.length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    ).filter(F.col("n_bytes") > 0)
    return media.select(
        "doc_id",
        "n_bytes",
        "hx",
        F.explode(
            F.sequence(F.lit(0), ((F.col("n_bytes") - 1) / w).cast("int"))
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx").cast("bigint") * w).alias("start_byte"),
        F.least(F.lit(w).cast("bigint"), F.col("n_bytes") - F.col("chunk_idx") * w).alias(
            "chunk_bytes"
        ),
        F.md5(
            F.expr(f"substring(hx, chunk_idx * {2 * w} + 1, {2 * w})")
        ).alias("chunk_md5"),
    )


MM_CHUNK_ORACLE = f"""
WITH media AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents WHERE octet_length(encode(text)) > 0),
chunks AS (
  SELECT doc_id, n_bytes, hx, CAST(i AS BIGINT) AS chunk_idx
  FROM media, unnest(generate_series(0, CAST((n_bytes - 1) // {MM_CHUNK_BYTES} AS INT))) AS g(i))
SELECT doc_id, chunk_idx,
       chunk_idx * {MM_CHUNK_BYTES} AS start_byte,
       least({MM_CHUNK_BYTES}, n_bytes - chunk_idx * {MM_CHUNK_BYTES}) AS chunk_bytes,
       md5(substring(hx, CAST(chunk_idx * {2 * MM_CHUNK_BYTES} + 1 AS INT), {2 * MM_CHUNK_BYTES})) AS chunk_md5
FROM chunks
"""


SPECS.append(QuerySpec("mm_chunk_media", mm_chunk_media, MM_CHUNK_ORACLE))


# ---------------------------------------------------------------------------
# Perceptual near-dup (round 11): dHash over decoded pixels + banded
# pair search — the image twin of the text family's simhash dedup.
# mm_binary_meta's payload_md5 catches EXACT payload dups; re-encoded /
# slightly-edited copies need a content hash computed from pixels.
# ---------------------------------------------------------------------------

DHASH_BANDS = 4        # 4 x 16-bit bands over the 64-bit hash
DHASH_MAX_HAMMING = 3  # Manku pigeonhole: <=3 flips -> one band exact

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        # 16 hex chars = 64 bits; hex keeps banding engine-portable
        # (band = 4-char substring), sidestepping signed-shift semantics
        T.StructField("dhash_hex", T.StringType()),
    ]
)


def _dhash64_pixels(width: int, height: int, pix: bytes) -> int:
    """Classic difference hash: grayscale, nearest-neighbor downsample
    to 9x8, bit = left pixel brighter than its right neighbor. Survives
    re-encoding, resizing, and small edits — exactly what payload_md5
    does not."""
    gw, gh = 9, 8
    arr = np.frombuffer(pix, dtype=np.uint8).astype(np.int64).reshape(
        height, width, 3
    )
    sy = np.minimum(height - 1, (np.arange(gh, dtype=np.int64) * height) // gh)
    sx = np.minimum(width - 1, (np.arange(gw, dtype=np.int64) * width) // gw)
    cell = arr[sy[:, None], sx[None, :]]
    g = cell[:, :, 0] * 299 + cell[:, :, 1] * 587 + cell[:, :, 2] * 114
    cmp_bits = (g[:, :-1] > g[:, 1:]).astype(np.uint8).ravel()
    return int.from_bytes(np.packbits(cmp_bits).tobytes(), "big")


def dhash_images(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """(doc_id, dhash_hex) over ``mapInPandas``. ``real_decode`` runs
    the PPM/BMP reader and the real pixel dHash; the default stand-in
    takes the payload digest's first 64 bits, which keeps the query
    oracle-checkable (and still catches exact payload dups — random
    bits collide within Hamming 3 only vanishingly)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hxs = []
            for p in pdf["payload"]:
                b = bytes(p)
                if real_decode:
                    w, h, pix = _decode_pixels(b)
                    hxs.append(f"{_dhash64_pixels(w, h, pix):016x}")
                else:
                    hxs.append(hashlib.md5(b).hexdigest()[:16])
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "dhash_hex": hxs})

    return media.mapInPandas(batches, schema=DHASH_SCHEMA)


def dhash_pairs(
    hashes: DataFrame, max_hamming: int = DHASH_MAX_HAMMING
) -> DataFrame:
    """(doc_a, doc_b, hamming) — near-dup pairs among 64-bit dHashes by
    the Manku pigeonhole: split into DHASH_BANDS 16-bit bands (4-char
    hex substrings), candidate pairs share at least one exact band
    (guaranteed for Hamming <= DHASH_MAX_HAMMING), verify the full
    Hamming distance on the candidates only. The simhash64 discipline:
    candidates come from band-bucket equi-joins, never an all-pairs
    product; bucket population is |corpus| / 2^16 per band value."""
    bands = hashes.select(
        "doc_id",
        "dhash_hex",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.conv(
                            F.substring("dhash_hex", 1 + 4 * b, 4), 16, 10
                        ).cast("int").alias("band_val"),
                    )
                    for b in range(DHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "dhash_hex", "bv.band_idx", "bv.band_val")
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("dhash_hex").alias("hex_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("dhash_hex").alias("hex_b"),
        "band_idx",
        "band_val",
    )
    ham = sum(
        F.expr(
            f"bit_count(CAST(conv(substring(hex_a, {1 + 4 * i}, 4), 16, 10) AS INT) ^ "
            f"CAST(conv(substring(hex_b, {1 + 4 * i}, 4), 16, 10) AS INT))"
        )
        for i in range(DHASH_BANDS)
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hex_a", "hex_b")
        .distinct()
        .withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def mm_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered perceptual-near-dup query in the oracle-checkable
    stand-in mode (digest-derived 64-bit hashes — surviving pairs are
    the exact payload dups at Hamming 0; the fixture corpus has none,
    so BOTH engines produce the empty pair set and the oracle verifies
    schema + emptiness, while the pair MATH is pinned by the planted
    pigeonhole pytest and the real-pixel PPM pytest);
    ``real_decode=True`` through :func:`dhash_images` swaps in the
    pixel dHash with the IDENTICAL banded search topology."""
    media = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return dhash_pairs(dhash_images(media))


def _nib(h: str, i: int) -> str:
    return f"(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


def _band_sql(h: str, b: int) -> str:
    i = 1 + 4 * b
    return (
        f"({_nib(h, i)} * 4096 + {_nib(h, i + 1)} * 256 "
        f"+ {_nib(h, i + 2)} * 16 + {_nib(h, i + 3)})"
    )


def _dhash_oracle() -> str:
    band_rows = ", ".join(
        f"({b}, {_band_sql('dhash_hex', b)})" for b in range(DHASH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor({_band_sql('hex_a', b)}, {_band_sql('hex_b', b)}))"
        for b in range(DHASH_BANDS)
    )
    return f"""
WITH h AS (
  SELECT doc_id, substr(md5(text), 1, 16) AS dhash_hex FROM documents
),
bands AS (
  SELECT doc_id, dhash_hex, b.band_idx, b.band_val
  FROM h, LATERAL (VALUES {band_rows}) AS b(band_idx, band_val)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.dhash_hex AS hex_a,
                  b.doc_id AS doc_b, b.dhash_hex AS hex_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({ham} AS BIGINT) AS hamming
FROM cand
WHERE {ham} <= {DHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


SPECS.append(QuerySpec("mm_dhash_pairs", mm_dhash_pairs, _dhash_oracle()))


# ---------------------------------------------------------------------------
# Audio: 16-bit PCM WAV real decode + energy-delta fingerprint — the audio
# leg of the multimodal surface (round 12). Same two-mode discipline as the
# image path: real_decode parses actual RIFF bytes in pure Python; the
# registered query proves the FINGERPRINT math (framing, energy, delta
# bits, band packing) cross-engine over a synthesized deterministic
# waveform, since WAV bytes cannot reasonably be constructed in SQL.
# ---------------------------------------------------------------------------

AUDIO_FP_FRAMES = 65   # 65 frames -> 64 energy-delta bits (the dhash shape)
AUDIO_FP_FRAME_LEN = 16  # synth waveform: samples per frame
_AUDIO_SYNTH_MULT = 2654435761  # Knuth multiplicative-hash constant


def _decode_wav(b: bytes) -> tuple[int, int, list[int]]:
    """Pure-Python RIFF/WAVE reader for 16-bit PCM: (sample_rate,
    n_channels, mono samples) — multi-channel input averages to mono.
    Compressed/float WAV (and every non-WAV magic) raises toward the
    codec plug-in point, the image-path discipline."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        chunk = b[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError("truncated WAV chunk")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        raise NotImplementedError(
            "native audio decode covers 16-bit PCM WAV; compressed/float "
            "formats require a codec library (plug ffmpeg/soundfile here)"
        )
    n = len(data) // (2 * n_ch)
    # numpy mono fold (round-12 verdict #1): one frombuffer + reshape +
    # row sum replaces the per-sample Python loop. int64 accumulator and
    # floor division reproduce the scalar reference exactly (numpy //
    # floors like Python's), pinned by the WAV round-trip property test.
    arr = np.frombuffer(bytes(data[: n * 2 * n_ch]), dtype="<i2").astype(np.int64)
    mono = (arr.reshape(n, n_ch).sum(axis=1) // n_ch).tolist()
    return rate, n_ch, mono


def _audio_fp_bits(samples: list[int]) -> str:
    """64-bit energy-delta fingerprint as 16 hex chars: the signal
    splits into AUDIO_FP_FRAMES equal frames, frame energy = Σ|sample|
    (exact integer), bit f = energy[f] > energy[f+1]. The audio
    analogue of the image dHash: robust to gain-preserving re-encodes
    and small edits, and its 4×16-bit bands drop straight into
    :func:`dhash_pairs`' banded pigeonhole search."""
    nf = AUDIO_FP_FRAMES
    n = len(samples)
    if n < nf:
        raise ValueError(f"audio too short to fingerprint (<{nf} samples)")
    # Vectorized frame energies: |samples| folded per frame with
    # add.reduceat at the exact lo = f·n//nf boundaries the scalar
    # reference used (every frame is non-empty because n >= nf).
    arr = np.abs(np.asarray(samples, dtype=np.int64))
    bounds = (np.arange(nf, dtype=np.int64) * n) // nf
    e = np.add.reduceat(arr, bounds)
    cmp_bits = (e[:-1] > e[1:]).astype(np.uint8)
    bits = int.from_bytes(np.packbits(cmp_bits).tobytes(), "big")
    return f"{bits:016x}"


def audio_fingerprints(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """(doc_id, fp_hex) over ``mapInPandas`` — the audio twin of
    :func:`dhash_images`. ``real_decode`` parses actual WAV bytes and
    fingerprints real energies; the default stand-in takes the payload
    digest's first 64 bits (exact-dup-only, oracle-checkable). Either
    way the output feeds :func:`dhash_pairs` unchanged (rename fp_hex
    -> dhash_hex): the banded near-dup search is hash-agnostic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = []
            for p in pdf["payload"]:
                b = bytes(p)
                if real_decode:
                    _rate, _ch, mono = _decode_wav(b)
                    fps.append(_audio_fp_bits(mono))
                else:
                    fps.append(hashlib.md5(b).hexdigest()[:16])
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "fp_hex": fps})

    return media.mapInPandas(
        batches,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("fp_hex", T.StringType()),
            ]
        ),
    )


def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered audio-fingerprint query: the energy-delta math of
    :func:`_audio_fp_bits` proven CROSS-ENGINE over a synthesized
    deterministic waveform (sample(doc, i) = ((doc_id+1)·(i+1)·
    2654435761) mod 65536, evaluated in the modular-reduced form
    ((d mod 2^16)·(i mod 2^16) mod 2^16 · (M mod 2^16)) mod 2^16 — the
    SAME values by modular arithmetic, but every intermediate stays
    under 2^48 so neither engine can hit int64 overflow at any doc_id
    (the naive product overflows at doc_id ≈ 3.3M: Spark wraps
    silently, DuckDB raises — a parity landmine at larger SFs); WAV
    bytes cannot reasonably be built in SQL, so the synth waveform is
    the oracle-able carrier for the framing/delta/band-packing math,
    while the RIFF byte parsing is pinned by the real-decode pytest).

    Emits (doc_id, fp_hex, n_frames). 100-TB shape: frame energies are
    a per-document ARRAY expression (transform/aggregate — JVM-side
    interpreted higher-order functions, no Python UDF, no explode); the
    fingerprint folds MSB-first per 16-bit band and concatenates 4
    zero-padded hex bands. The doc_id frame is REPARTITIONED to cluster
    width before the compute (round-12 verdict #1 follow-through: the
    fixture table is one parquet split, so the 1040-term fold ran on 1
    of 32 cores — 2.13 s → 0.59 s at sf0.1 measured; the shuffled
    payload is one bigint per document, ~8 B/row, negligible against
    the compute it parallelizes). An unrolled 16-term sum was A/B'd
    against the nested aggregate and measured SLOWER (2.49 vs 2.14 s) —
    negative result recorded in PERFORMANCE.md."""
    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id").repartition(par)
    nf, fl, mult = AUDIO_FP_FRAMES, AUDIO_FP_FRAME_LEN, _AUDIO_SYNTH_MULT
    energies = (
        f"transform(sequence(0, {nf - 1}), f -> aggregate(sequence(0, {fl - 1}), 0L, "
        f"(acc, k) -> acc + ((((doc_id + 1L) % 65536L) * ((f * {fl} + k + 1L) % 65536L))"
        f" % 65536L * {mult % 65536}L) % 65536L))"
    )
    band = (
        "aggregate(sequence({lo}, {hi}), 0L, (acc, f) -> acc * 2L + "
        "(CASE WHEN element_at(__e, f + 1) > element_at(__e, f + 2) "
        "THEN 1L ELSE 0L END))"
    )
    bands = [
        F.expr(band.format(lo=16 * b, hi=16 * b + 15)) for b in range(4)
    ]
    fp = F.lower(
        F.concat(*[F.lpad(F.hex(bexpr), 4, "0") for bexpr in bands])
    )
    return (
        docs.withColumn("__e", F.expr(energies))
        .select(
            "doc_id",
            fp.alias("fp_hex"),
            F.lit(nf).cast("bigint").alias("n_frames"),
        )
        .orderBy("doc_id")
    )


MM_AUDIO_FP_ORACLE = f"""
WITH frames AS (
  SELECT doc_id, f,
         SUM((((doc_id + 1) % 65536) * ((f * {AUDIO_FP_FRAME_LEN} + k + 1) % 65536) % 65536 * {_AUDIO_SYNTH_MULT % 65536}) % 65536) AS e
  FROM documents,
       generate_series(0, {AUDIO_FP_FRAMES - 1}) t(f),
       generate_series(0, {AUDIO_FP_FRAME_LEN - 1}) u(k)
  GROUP BY doc_id, f
),
bits AS (
  SELECT a.doc_id, a.f,
         CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS bit
  FROM frames a JOIN frames b ON b.doc_id = a.doc_id AND b.f = a.f + 1
),
bands AS (
  SELECT doc_id, f // 16 AS band,
         SUM(bit << (15 - (f % 16))) AS bv
  FROM bits GROUP BY 1, 2
)
SELECT doc_id,
       lower(concat(
         lpad(to_hex(MAX(CASE WHEN band = 0 THEN bv END)), 4, '0'),
         lpad(to_hex(MAX(CASE WHEN band = 1 THEN bv END)), 4, '0'),
         lpad(to_hex(MAX(CASE WHEN band = 2 THEN bv END)), 4, '0'),
         lpad(to_hex(MAX(CASE WHEN band = 3 THEN bv END)), 4, '0')
       )) AS fp_hex,
       CAST({AUDIO_FP_FRAMES} AS BIGINT) AS n_frames
FROM bands
GROUP BY doc_id
ORDER BY doc_id
"""


SPECS.append(
    QuerySpec("mm_audio_fingerprint", mm_audio_fingerprint, MM_AUDIO_FP_ORACLE)
)


# ---------------------------------------------------------------------------
# Video: uncompressed-DIB AVI real frame extraction + per-frame dHash —
# the video leg (round 12), completing the image/audio/video real-decode
# trifecta. AVI is RIFF (like WAV): LIST('hdrl') carries the main header
# with dimensions, LIST('movi') carries '##db' (uncompressed DIB) frame
# chunks — bottom-up BGR rows padded to 4 bytes, the BMP pixel layout,
# so the frames feed the SAME _dhash64_pixels kernel the image path uses.
# Compressed streams ('##dc' with a codec) stay gated.
# ---------------------------------------------------------------------------


def _decode_avi_frames(b: bytes, every: int = 1) -> tuple[int, int, list[bytes]]:
    """(width, height, [raw RGB frame, ...]) for an uncompressed-DIB AVI,
    keeping every ``every``-th frame (the sampling cadence a video
    pipeline uses — decode cost scales with kept frames only, since
    skipped '##db' chunks are never pixel-converted)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    width = height = None
    frames: list[bytes] = []
    n_seen = 0
    strh_type = None  # fccType of the most recent 'strh' (strf follows it)

    def walk(buf: bytes, in_movi: bool) -> None:
        nonlocal width, height, n_seen, strh_type
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            body = buf[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError("truncated AVI chunk")
            pos += 8 + size + (size & 1)
            if cid == b"LIST":
                walk(body[4:], in_movi or body[:4] == b"movi")
            elif cid == b"avih":
                width = int.from_bytes(body[32:36], "little")
                height = int.from_bytes(body[36:40], "little")
            elif cid == b"strh":
                strh_type = body[:4]
            elif cid == b"strf" and strh_type == b"vids":
                # BITMAPINFOHEADER.biBitCount (ADVICE r12): a 32-bpp DIB
                # stream would pass a >=-length check and silently decode
                # garbage; gate it like every other unsupported shape. A
                # vids strf too short to carry biBitCount (e.g. a
                # BITMAPCOREHEADER) is malformed, NOT a skipped gate — a
                # width-1 16-bpp stream pads to the same row_bytes as
                # 24-bpp and would silently slip past the exact-size
                # check below (round-13 review finding).
                if len(body) < 16:
                    raise ValueError("truncated AVI video strf header")
                bpp = int.from_bytes(body[14:16], "little")
                if bpp != 24:
                    raise NotImplementedError(
                        f"native video decode covers 24-bpp DIB frames; "
                        f"{bpp}-bpp streams require a codec library "
                        "(plug ffmpeg here)"
                    )
                # pair each strf with exactly its preceding strh: a stray
                # second strf in a malformed strl list must not be
                # re-interpreted as the video format header (ADVICE r13)
                strh_type = None
            elif in_movi and cid[2:4] == b"dc":
                raise NotImplementedError(
                    "native video decode covers uncompressed-DIB AVI ('##db' "
                    "frames); codec streams require a library (plug ffmpeg here)"
                )
            elif in_movi and cid[2:4] == b"db":
                keep = n_seen % every == 0
                n_seen += 1
                if not keep:
                    continue
                if width is None or height is None:
                    raise ValueError("AVI frame before header")
                if width * height == 0:
                    raise ValueError("degenerate AVI dimensions")
                row_bytes = (width * 3 + 3) // 4 * 4
                if len(body) < row_bytes * height:
                    raise ValueError("truncated AVI frame data")
                if len(body) != row_bytes * height:
                    # belt-and-braces next to the strf gate: a frame that
                    # isn't exactly rows×row_bytes is not the 24-bpp DIB
                    # layout this decoder understands
                    raise NotImplementedError(
                        "AVI '##db' frame size does not match 24-bpp DIB "
                        "layout; other bit depths require a codec library"
                    )
                # vectorized bottom-up de-pad + BGR→RGB (round-12 verdict
                # #1): reshape to (rows, row_bytes), slice padding, flip
                # both axes in one view
                rows = (
                    np.frombuffer(body, dtype=np.uint8)
                    .reshape(height, row_bytes)[:, : width * 3]
                    .reshape(height, width, 3)
                )
                frames.append(np.ascontiguousarray(rows[::-1, :, ::-1]).tobytes())

    walk(b[12:], False)
    if width is None:
        raise ValueError("AVI missing avih header")
    return width, height, frames


VIDEO_FRAME_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("dhash_hex", T.StringType()),
    ]
)


def video_frame_dhash(
    media: DataFrame, every: int = 1, real_decode: bool = False
) -> DataFrame:
    """(doc_id, frame_no, dhash_hex) — per-sampled-frame perceptual hash
    over ``mapInPandas``: the fan-out contract of :func:`sample_frames`
    with REAL pixels when ``real_decode`` (AVI '##db' frames through the
    image path's `_dhash64_pixels`). Two videos sharing >= K frame
    hashes are near-dup candidates — frame-set containment, resolved by
    the same banded machinery as the still-image path (each frame row
    joins dhash_pairs' topology; per-video containment is a groupBy over
    matched frame counts). The stand-in hashes byte-chunks, keeping the
    fan-out testable without payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, hxs = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if real_decode:
                    w, h, frames = _decode_avi_frames(b, every=every)
                    # frame_no is the SOURCE frame index (kept-index ×
                    # cadence) so both modes number frames identically
                    for kept_i, pix in enumerate(frames):
                        ids.append(doc_id)
                        nos.append(kept_i * every)
                        hxs.append(f"{_dhash64_pixels(w, h, pix):016x}")
                else:
                    n = max(1, len(b) // 256)
                    for fno in range(0, n, every):
                        ids.append(doc_id)
                        nos.append(fno)
                        chunk = b[fno * 256 : (fno + 1) * 256]
                        hxs.append(hashlib.md5(chunk).hexdigest()[:16])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "dhash_hex": hxs})

    return media.mapInPandas(batches, schema=VIDEO_FRAME_DHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Per-image pixel statistics (round 14, session 2) — the pre-training
# image triage every vision pipeline runs before decode-heavy work:
# drop black/blank frames (mean + extreme-fraction), near-constant
# images (distinct values), clipped exposures. One numpy kernel shared
# by the registered stand-in (payload bytes as an 8-bit gray buffer —
# oracle-reproducible, ASCII fixture) and the real decoded-pixel path
# (pinned by planted-pixel pytest like the other codec kernels).
# ---------------------------------------------------------------------------

IMG_DARK_MAX = 64     # v < 64  → "dark" (bottom quartile of 8-bit range)
IMG_BRIGHT_MIN = 192  # v ≥ 192 → "bright" (top quartile)

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("mean_ppm", T.LongType()),
        T.StructField("frac_dark_ppm", T.LongType()),
        T.StructField("frac_bright_ppm", T.LongType()),
        T.StructField("distinct_vals", T.IntegerType()),
        T.StructField("min_val", T.IntegerType()),
        T.StructField("max_val", T.IntegerType()),
    ]
)


def image_stats_values(vals: "np.ndarray") -> tuple:
    """Exact integer stats over a uint8 value buffer: (n, mean_ppm,
    frac_dark_ppm, frac_bright_ppm, distinct, min, max). mean_ppm is
    1e6-fixed-point via integer floor division — Python ints, no float
    in the path, so the oracle's // reproduces it bit-exactly."""
    n = int(vals.size)
    if n == 0:
        return (0, 0, 0, 0, 0, 0, 0)
    s = int(vals.sum(dtype=np.int64))
    dark = int((vals < IMG_DARK_MAX).sum())
    bright = int((vals >= IMG_BRIGHT_MIN).sum())
    return (
        n,
        s * 1_000_000 // n,
        dark * 1_000_000 // n,
        bright * 1_000_000 // n,
        int(np.unique(vals).size),
        int(vals.min()),
        int(vals.max()),
    )


def image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas: payload → per-image stats row. The
    payload is read as an 8-bit gray pixel buffer (the stand-in
    contract — with a real codec the same kernel runs over
    _decode_pixels output; see tests for the planted-pixel pin).

    100-TB shape: a pure map stage — payload bytes never shuffle, one
    stats row out per image; the Python boundary is one vectorized
    numpy pass per Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                image_stats_values(np.frombuffer(bytes(p), dtype=np.uint8))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_px": [r[0] for r in rows],
                    "mean_ppm": [r[1] for r in rows],
                    "frac_dark_ppm": [r[2] for r in rows],
                    "frac_bright_ppm": [r[3] for r in rows],
                    "distinct_vals": [r[4] for r in rows],
                    "min_val": [r[5] for r in rows],
                    "max_val": [r[6] for r in rows],
                }
            )

    return media.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered stand-in: stats over the utf-8 payload (pure ASCII in
    the fixture, so the SQL oracle reproduces the byte values as
    codepoints — the mm_decode_meta strategy: the Arrow/mapInPandas
    execution path is oracle-verified, the real pixel source is pinned
    by pytest). Empty payloads are excluded in BOTH engines — SQL's
    string_split('','') yields [''] (codepoint -1), not an empty set,
    so the only agreeing semantics is "stats are defined for non-empty
    buffers" (session-2 self-review finding)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    return image_stats(with_binary_payload(docs))


MM_IMAGE_STATS_ORACLE = f"""
WITH ch AS (
  SELECT doc_id, unicode(c) AS v
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
        FROM documents WHERE length(text) > 0)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST((SUM(v) * 1000000) // COUNT(*) AS BIGINT) AS mean_ppm,
       CAST((SUM(CASE WHEN v < {IMG_DARK_MAX} THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS frac_dark_ppm,
       CAST((SUM(CASE WHEN v >= {IMG_BRIGHT_MIN} THEN 1 ELSE 0 END) * 1000000)
            // COUNT(*) AS BIGINT) AS frac_bright_ppm,
       CAST(COUNT(DISTINCT v) AS INT) AS distinct_vals,
       CAST(MIN(v) AS INT) AS min_val,
       CAST(MAX(v) AS INT) AS max_val
FROM ch
GROUP BY doc_id
"""


SPECS.append(QuerySpec("mm_image_stats", mm_image_stats, MM_IMAGE_STATS_ORACLE))
