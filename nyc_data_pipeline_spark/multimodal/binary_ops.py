"""Multimodal column pattern (north-star M4): opaque binary payloads +
typed metadata, with decode as a Pandas-native batch operator.

Design (the part that matters at 100 TB):
- media lives in a `binary` column next to a typed metadata struct
  (byte length, mime, digest) — scans prune to metadata without
  touching payload bytes;
- decode / feature-extraction runs via `mapInPandas`: Arrow-batched,
  schema-stable, partition-parallel.  `decode_media` carries REAL
  pure-Python parsers for the uncompressed raster formats (PPM P6 and
  24-bit BI_RGB BMP); compressed formats (JPEG/PNG/audio/video) plug a
  codec library into the same seam.  `fake_decode_features` remains the
  decoder-independent referee for the plumbing itself.

Every path here is oracle-checked: metadata (mm_metadata), the real
decode (mm_decode_features — DuckDB predicts the decoded pixel stats
from the raster-construction rule), and the plumbing referee
(mm_decode_plumbing).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, head_hex string, tail_hex string, "
    "slice_md5 string, hist string"
)

_HEX_DIGITS = "0123456789ABCDEF"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat utf-8 text bytes as the opaque payload and
    build the typed metadata struct the real media tables carry."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.octet_length(text_col).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.md5(text_col).alias("digest"),
        ).alias("meta"),
    )


def _parse_ppm_p6(payload: bytes) -> dict:
    """Binary PPM (P6) parser: magic, comment-aware whitespace-separated
    header tokens (width, height, maxval), then raw RGB triplets.
    Pure-Python and dependency-free — the netpbm header grammar
    (https://netpbm.sourceforge.net/doc/ppm.html) is simple enough that
    no codec library is needed."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        # skip whitespace and '#'-to-newline comments between tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("2-byte-sample PPM not supported")
    need = 3 * width * height
    pixels = payload[pos : pos + need]
    if len(pixels) != need:
        raise ValueError(
            f"PPM raster truncated: need {need}, got {len(pixels)}"
        )
    return {
        "format": "ppm",
        "width": width,
        "height": height,
        "maxval": maxval,
        "pixels": bytes(pixels),  # row-major RGB
    }


def _parse_bmp_24(payload: bytes) -> dict:
    """Uncompressed 24-bit BI_RGB Windows BMP parser (BITMAPINFOHEADER):
    little-endian header fields, 4-byte-aligned rows stored bottom-up
    (top-down when height is negative).  Returns row-major RGB pixels
    like the PPM path so downstream features are format-agnostic."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    width, raw_h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    height, bottom_up = abs(raw_h), raw_h > 0
    stride = (3 * width + 3) & ~3  # rows pad to 4-byte boundaries
    rows = []
    for r in range(height):
        src = height - 1 - r if bottom_up else r
        off = data_off + src * stride
        row = payload[off : off + 3 * width]
        if len(row) != 3 * width:
            raise ValueError("BMP raster truncated")
        # BMP stores BGR; flip each triplet to RGB
        rows.append(
            bytes(
                row[3 * c + (2 - k)] for c in range(width) for k in range(3)
            )
        )
    return {
        "format": "bmp",
        "width": width,
        "height": height,
        "maxval": 255,
        "pixels": b"".join(rows),
    }


def decode_media(payload: bytes, mime: str) -> dict:
    """Real decode hook.  Pure-Python parsers cover the uncompressed
    raster formats (PPM P6, 24-bit BI_RGB BMP) — header parse + pixel
    extraction with no external codec.  Compressed formats (JPEG/PNG/
    audio/video) would swap in PIL/ffmpeg at this exact seam; the
    mapInPandas plumbing above/below is unchanged either way."""
    payload = bytes(payload)
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return _parse_ppm_p6(payload)
    if mime in ("image/bmp", "image/x-ms-bmp"):
        return _parse_bmp_24(payload)
    raise ValueError(
        f"no pure-Python decoder for mime {mime!r}; plug a codec "
        "library into decode_media for compressed formats"
    )


def _fake_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    def feats(b: bytes) -> tuple:
        h = bytes(b).hex().upper()
        nib = h[0::2]  # high nibble of each byte
        return (
            len(b),
            h[:8],
            h[-8:],
            hashlib.md5(h[:128].encode()).hexdigest(),
            ",".join(str(nib.count(d)) for d in _HEX_DIGITS),
        )

    for pdf in batches:
        rows = pdf["payload"].map(feats)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": rows.map(lambda r: r[0]),
                "head_hex": rows.map(lambda r: r[1]),
                "tail_hex": rows.map(lambda r: r[2]),
                "slice_md5": rows.map(lambda r: r[3]),
                "hist": rows.map(lambda r: r[4]),
            }
        )


def fake_decode_features(binary_df: DataFrame) -> DataFrame:
    """Deterministic stand-in 'decoder': Arrow-batched mapInPandas over
    the payload column producing fixed-schema features."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _fake_feature_batches, schema=FEATURE_SCHEMA
    )


@register(
    "mm_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           'text/plain' AS mime,
           md5(text) AS digest
    FROM documents
    """,
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over the multimodal table: never touches
    payload bytes (column pruning does the work at scale)."""
    d = load_table(spark, sf_dir, "documents")
    b = attach_binary_payload(d)
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.digest").alias("digest"),
    )


FRAME_BYTES = 64
SAMPLE_EVERY = 2
THUMB_BYTES = 32


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n_bytes
        FROM documents WHERE octet_length(encode(text)) > 0
    ),
    frames AS (
        SELECT doc_id, n_bytes, h,
               unnest(generate_series(0, CAST(ceil(n_bytes / {FRAME_BYTES}.0) AS BIGINT) - 1))
                 AS fidx
        FROM b
    )
    SELECT doc_id, fidx,
           CAST(len(substring(h, CAST(fidx * {2 * FRAME_BYTES} + 1 AS BIGINT),
                              {2 * FRAME_BYTES})) / 2 AS INTEGER) AS frame_len,
           md5(substring(h, CAST(fidx * {2 * FRAME_BYTES} + 1 AS BIGINT),
               {2 * FRAME_BYTES})) AS frame_md5,
           md5(substring(h, 1, {2 * THUMB_BYTES})) AS thumb_md5
    FROM frames
    WHERE fidx % {SAMPLE_EVERY} = 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling + byte-budget 'resize' over the binary payload —
    the video/audio access pattern: fixed-size byte frames, every
    SAMPLE_EVERY-th kept, plus a truncated thumbnail digest.  All
    JVM-side (binary substring + explode; payload bytes never cross to
    Python); the oracle reproduces the slices over the hex encoding,
    certifying the binary arithmetic byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    b = attach_binary_payload(d).filter(F.col("meta.n_bytes") > 0)
    frames = b.selectExpr(
        "doc_id",
        "payload",
        f"explode(sequence(0, CAST(ceil(meta.n_bytes / {FRAME_BYTES}.0) AS BIGINT) - 1))"
        " AS fidx",
    ).filter(F.col("fidx") % SAMPLE_EVERY == 0)
    return frames.selectExpr(
        "doc_id",
        "fidx",
        f"octet_length(substring(payload, CAST(fidx * {FRAME_BYTES} + 1 AS INT), "
        f"{FRAME_BYTES})) AS frame_len",
        f"md5(encode(hex(substring(payload, CAST(fidx * {FRAME_BYTES} + 1 AS INT), "
        f"{FRAME_BYTES})), 'utf-8')) AS frame_md5",
        f"md5(encode(hex(substring(payload, 1, {THUMB_BYTES})), 'utf-8')) AS thumb_md5",
    )


# --- Real decode path ------------------------------------------------------
#
# The fixture carries no image files, so the raster is SYNTHESIZED
# deterministically per doc — a genuine P6 PPM (comment-bearing header,
# per-doc height, raster = the doc's leading utf-8 bytes) — and then
# decoded FOR REAL by `decode_media`'s pure-Python parser inside
# mapInPandas.  The parser is load-bearing: width/height/maxval come
# out of the header grammar, pixels out of the raster offset math; the
# DuckDB oracle never sees the PPM — it predicts the decoded stats
# independently from the construction (hex-pair arithmetic over the
# same text bytes), so a parser bug (offset, comment handling,
# truncation) breaks the hash.

PPM_W = 4  # fixed raster width; height varies 2..4 per doc


def attach_ppm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a real binary P6 PPM per document: `P6`, a comment
    line, `{PPM_W} {h}` with h = 2 + doc_id % 3, maxval 255, then a
    raster of the doc's first 3·PPM_W·h utf-8 bytes.  Docs too short
    for the tallest raster are excluded so the contract is uniform."""
    raw = df.select(
        "doc_id", F.encode(F.col(text_col), "utf-8").alias("raw")
    )
    return (
        raw.filter(F.octet_length("raw") >= 3 * PPM_W * 4)
        .withColumn("ih", (F.lit(2) + F.col("doc_id") % 3).cast("int"))
        .select(
            "doc_id",
            F.concat(
                F.encode(
                    F.concat(
                        F.lit(f"P6\n# synthetic raster\n{PPM_W} "),
                        F.col("ih").cast("string"),
                        F.lit("\n255\n"),
                    ),
                    "utf-8",
                ),
                F.expr(f"substring(raw, 1, {3 * PPM_W} * ih)"),
            ).alias("payload"),
            F.lit("image/x-portable-pixmap").alias("mime"),
        )
    )


REAL_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, maxval int, n_px int, "
    "sum_r bigint, sum_g bigint, sum_b bigint, px_min int, px_max int, "
    "mean_milli bigint"
)


def _real_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    cols = [
        "doc_id", "width", "height", "maxval", "n_px",
        "sum_r", "sum_g", "sum_b", "px_min", "px_max", "mean_milli",
    ]
    for pdf in batches:
        out = []
        for doc_id, payload, mime in zip(
            pdf["doc_id"], pdf["payload"], pdf["mime"]
        ):
            m = decode_media(payload, mime)
            px = m["pixels"]
            out.append(
                (
                    doc_id,
                    m["width"],
                    m["height"],
                    m["maxval"],
                    m["width"] * m["height"],
                    sum(px[0::3]),
                    sum(px[1::3]),
                    sum(px[2::3]),
                    min(px),
                    max(px),
                    sum(px) * 1000 // len(px),
                )
            )
        yield pd.DataFrame(out, columns=cols)


def real_decode_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas over (doc_id, payload, mime) running the
    REAL `decode_media` parser; emits per-image integer pixel stats."""
    return media_df.select("doc_id", "payload", "mime").mapInPandas(
        _real_decode_batches, schema=REAL_FEATURE_SCHEMA
    )


@register(
    "mm_decode_features",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               2 + doc_id % 3 AS ih
        FROM documents
        WHERE octet_length(encode(text)) >= {3 * PPM_W * 4}
    ),
    px AS (
        SELECT doc_id, ih, i,
               (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2 * i + 1 AS BIGINT), 1)) - 1) * 16
             + (strpos('0123456789ABCDEF',
                       substr(hx, CAST(2 * i + 2 AS BIGINT), 1)) - 1) AS v
        FROM b, LATERAL unnest(range(0, {3 * PPM_W} * ih)) AS r(i)
    )
    SELECT doc_id,
           CAST({PPM_W} AS INTEGER) AS width,
           CAST(ih AS INTEGER) AS height,
           CAST(255 AS INTEGER) AS maxval,
           CAST({PPM_W} * ih AS INTEGER) AS n_px,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN v END) AS BIGINT) AS sum_b,
           CAST(MIN(v) AS INTEGER) AS px_min,
           CAST(MAX(v) AS INTEGER) AS px_max,
           CAST(SUM(v) * 1000 // ({3 * PPM_W} * ih) AS BIGINT) AS mean_milli
    FROM px
    GROUP BY doc_id, ih
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode end-to-end: synthesize a binary P6 PPM per doc
    (comment-bearing header, per-doc dimensions), parse it with the
    pure-Python `decode_media` inside Arrow-batched mapInPandas, and
    emit integer pixel statistics.  The oracle recomputes the expected
    stats from the raster-construction rule alone (hex-pair byte
    arithmetic in DuckDB), so header parsing, raster offsets, and
    channel layout are all certified byte-for-byte — the codec seam
    the earlier rounds stubbed is now a working decoder."""
    d = load_table(spark, sf_dir, "documents")
    return real_decode_features(attach_ppm_payload(d))


@register(
    "mm_decode_plumbing",
    oracle="""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    n AS (
        SELECT doc_id, h, n_bytes,
               regexp_replace(h, '(.).', '\\1', 'g') AS nib
        FROM b
    )
    SELECT doc_id,
           CAST(n_bytes AS INTEGER) AS n_bytes,
           substring(h, 1, 8) AS head_hex,
           substring(h, greatest(1, 2 * n_bytes - 7), 8) AS tail_hex,
           md5(substring(h, 1, 128)) AS slice_md5,
           array_to_string(list_transform(
               ['0','1','2','3','4','5','6','7','8','9','A','B','C','D','E','F'],
               d -> CAST(length(nib) - length(replace(nib, d, '')) AS INTEGER)
           ), ',') AS hist
    FROM n
    """,
)
def mm_decode_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decoder-independent referee for the mapInPandas plumbing
    (formerly `mm_decode_features`'s body): the deterministic stand-in
    'decoder' emits byte length, head/tail hex slices, an md5 over the
    first 64 bytes' hex, and a 16-bucket high-nibble histogram — all
    reproducible by DuckDB over the same binary column.  Kept alongside
    the real-decode query above so the Arrow batch shape and schema
    contract stay certified independently of any codec."""
    d = load_table(spark, sf_dir, "documents")
    return fake_decode_features(attach_binary_payload(d))


PHASH_BANDS = 4  # 4 bands x 16 bits of the 64-bit fingerprint


@register(
    "mm_phash_near_dup",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, md5(text) AS digest FROM documents
        UNION ALL
        SELECT doc_id + 1000000, md5(text) FROM documents
        WHERE doc_id % 9 = 0
    ),
    bands AS (
        SELECT doc_id, 0 AS band, substr(digest, 1, 4) AS bval FROM corpus
        UNION ALL
        SELECT doc_id, 1, substr(digest, 5, 4) FROM corpus
        UNION ALL
        SELECT doc_id, 2, substr(digest, 9, 4) FROM corpus
        UNION ALL
        SELECT doc_id, 3, substr(digest, 13, 4) FROM corpus
    ),
    reps AS (
        SELECT band, bval, MIN(doc_id) AS rep FROM bands GROUP BY 1, 2
    )
    SELECT b.doc_id, CAST(MIN(r.rep) AS BIGINT) AS rep_id
    FROM bands b JOIN reps r ON r.band = b.band AND r.bval = b.bval
    GROUP BY b.doc_id
    """,
)
def mm_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate assignment over the binary media
    column: fingerprint each payload, band the 64-bit hash into
    {PHASH_BANDS}x16-bit blocks, and keep-one per bucket (rep = min
    doc_id over all of a doc's buckets) — the banded-Hamming LSH every
    image-dedup pipeline runs (pHash/aHash at ≤{PHASH_BANDS - 1}-bit
    distance collide in ≥1 band by pigeonhole, exactly the simhash.py
    argument).  The fingerprint here is the payload digest's first 64
    bits — a deterministic stand-in wired through the same seam as
    decode_media (a real pHash needs the image codec this container
    lacks; swapping it changes ONE expression, none of the banding or
    keep-one algebra).  A simulated re-crawl (every 9th doc re-ingested
    under a new id) provides true collisions: re-crawled pairs share
    all bands and collapse to one rep.  Linear: O(n·bands) rows, two
    hash shuffles, no pair enumeration."""
    d = load_table(spark, sf_dir, "documents")
    recrawl = d.filter(F.col("doc_id") % 9 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    corpus = attach_binary_payload(d.unionByName(recrawl)).select(
        "doc_id", F.col("meta.digest").alias("digest")
    )
    band_structs = ", ".join(
        f"struct({b} AS band, substr(digest, {b * 4 + 1}, 4) AS bval)"
        for b in range(PHASH_BANDS)
    )
    bands = corpus.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bval").alias("bval"))
    reps = bands.groupBy("band", "bval").agg(F.min("doc_id").alias("rep"))
    return (
        bands.join(reps, ["band", "bval"])
        .groupBy("doc_id")
        .agg(F.min("rep").cast("bigint").alias("rep_id"))
    )


# --- Audio: s16le PCM window energy ----------------------------------------
#
# The audio leg of the multimodal story (images: PPM/BMP decode above;
# video: frame sampling): fixed-rate PCM is the raw-audio interchange
# format, and the first feature every audio pipeline computes is
# windowed energy/RMS (VAD, silence trimming, loudness normalization).
# The payload is SYNTHESIZED deterministically (the doc's leading
# AUDIO_BYTES utf-8 bytes reinterpreted as little-endian signed 16-bit
# samples — the fixture ships no .wav files), and then decoded FOR
# REAL: numpy `frombuffer(dtype='<i2')` inside Arrow-batched
# mapInPandas, where byte order and two's-complement signedness are
# load-bearing.  The DuckDB oracle never sees numpy — it re-derives
# every sample from hex-pair arithmetic over the same bytes
# (lo + 256*hi, minus 65536 when the sign bit is set), so an
# endianness or sign bug breaks the hash.  Energy ships as the exact
# integer Σx² carrier (rms = sqrt(energy/n) is one float step for the
# consumer).

AUDIO_BYTES = 128           # 64 samples per doc
WIN_SAMPLES = 8             # -> 8 windows per doc

PCM_WINDOW_SCHEMA = (
    "doc_id bigint, widx int, n_samples int, energy bigint, peak int"
)


def attach_pcm_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the s16le payload: the doc's first AUDIO_BYTES utf-8
    bytes (docs too short are excluded so the contract is uniform)."""
    raw = df.select(
        "doc_id", F.encode(F.col(text_col), "utf-8").alias("raw")
    )
    return raw.filter(F.octet_length("raw") >= AUDIO_BYTES).select(
        "doc_id",
        F.expr(f"substring(raw, 1, {AUDIO_BYTES})").alias("payload"),
    )


def _pcm_window_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    cols = ["doc_id", "widx", "n_samples", "energy", "peak"]
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            x = np.frombuffer(bytes(payload), dtype="<i2").astype(np.int64)
            for w in range(len(x) // WIN_SAMPLES):
                seg = x[w * WIN_SAMPLES:(w + 1) * WIN_SAMPLES]
                out.append(
                    (
                        int(doc_id),
                        w,
                        int(seg.size),
                        int((seg * seg).sum()),
                        int(np.abs(seg).max()),
                    )
                )
        yield pd.DataFrame(out, columns=cols)


def pcm_window_energy(pcm_df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> per-window (widx, n_samples, energy, peak)
    via the real numpy s16le decode in Arrow-batched mapInPandas."""
    return pcm_df.mapInPandas(_pcm_window_batches, PCM_WINDOW_SCHEMA)


def _audio_oracle() -> str:
    hv = "(strpos('0123456789ABCDEF', {c}) - 1)"
    lo = (
        f"(16 * {hv.format(c='substr(h, 4 * i + 1, 1)')}"
        f" + {hv.format(c='substr(h, 4 * i + 2, 1)')})"
    )
    hi = (
        f"(16 * {hv.format(c='substr(h, 4 * i + 3, 1)')}"
        f" + {hv.format(c='substr(h, 4 * i + 4, 1)')})"
    )
    return f"""
    WITH b AS (
        SELECT doc_id,
               substr(hex(encode(text)), 1, {2 * AUDIO_BYTES}) AS h
        FROM documents
        WHERE octet_length(encode(text)) >= {AUDIO_BYTES}
    ),
    samples AS (
        SELECT doc_id, i,
               CASE WHEN {hi} * 256 + {lo} >= 32768
                    THEN {hi} * 256 + {lo} - 65536
                    ELSE {hi} * 256 + {lo} END AS s
        FROM b, LATERAL unnest(range(0, {AUDIO_BYTES // 2})) AS t(i)
    )
    SELECT doc_id,
           CAST(i // {WIN_SAMPLES} AS INTEGER) AS widx,
           CAST(COUNT(*) AS INTEGER) AS n_samples,
           CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy,
           CAST(MAX(abs(s)) AS INTEGER) AS peak
    FROM samples
    GROUP BY doc_id, i // {WIN_SAMPLES}
    """


@register("mm_audio_rms_windows", oracle=_audio_oracle())
def mm_audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy over real s16le PCM decode: synthesize the
    byte stream per doc, decode with numpy frombuffer inside
    mapInPandas ({WIN_SAMPLES}-sample windows), emit exact integer
    energy and peak per window.  The oracle re-derives every sample
    from hex-pair arithmetic (lo + 256·hi, two's complement), so byte
    order and signedness are certified sample-for-sample."""
    d = load_table(spark, sf_dir, "documents")
    return pcm_window_energy(attach_pcm_payload(d))


# --- Real resize path -------------------------------------------------------
#
# The transform leg of the decode story: a genuine 2x2 box-average
# downsample over the REAL decoded raster (mm_frame_sample's byte-
# budget cut is the transport-level resize; this is the pixel-level
# one).  Integer semantics end-to-end: each output pixel is the floor
# mean of its 2x2 source block, odd trailing rows are dropped (floor
# output height), so the DuckDB oracle can re-derive EVERY output
# pixel from the raster-construction rule and certify placement via a
# position-weighted checksum — a transposed block, swapped channel, or
# off-by-one row silently changes the checksum.

THUMB_SCHEMA = (
    "doc_id bigint, out_w int, out_h int, t_sum_r bigint, t_sum_g bigint, "
    "t_sum_b bigint, t_min int, t_max int, t_checksum bigint"
)


def _thumbnail_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    import numpy as np

    cols = [
        "doc_id", "out_w", "out_h", "t_sum_r", "t_sum_g", "t_sum_b",
        "t_min", "t_max", "t_checksum",
    ]
    for pdf in batches:
        out = []
        for doc_id, payload, mime in zip(
            pdf["doc_id"], pdf["payload"], pdf["mime"]
        ):
            m = decode_media(payload, mime)
            a = (
                np.frombuffer(bytes(m["pixels"]), dtype=np.uint8)
                .astype(np.int64)
                .reshape(m["height"], m["width"], 3)
            )
            # floor-crop BOTH dims to even (odd trailing row/column
            # dropped) — without the column crop numpy would silently
            # BROADCAST the mismatched odd-width slices instead of
            # erroring (caught by the hypothesis property test)
            eh = (m["height"] // 2) * 2
            ew = (m["width"] // 2) * 2
            a = a[:eh, :ew]
            t = (
                a[0::2, 0::2] + a[0::2, 1::2]
                + a[1::2, 0::2] + a[1::2, 1::2]
            ) // 4
            flat = t.reshape(-1)
            weights = np.arange(1, flat.size + 1, dtype=np.int64)
            out.append(
                (
                    doc_id,
                    t.shape[1],
                    t.shape[0],
                    int(t[:, :, 0].sum()),
                    int(t[:, :, 1].sum()),
                    int(t[:, :, 2].sum()),
                    int(flat.min()),
                    int(flat.max()),
                    int((flat * weights).sum()),
                )
            )
        yield pd.DataFrame(out, columns=cols)


def thumbnail_stats(media_df: DataFrame) -> DataFrame:
    """Arrow-batched mapInPandas: real decode + 2x2 integer box
    downsample; emits thumbnail stats + placement checksum."""
    return media_df.select("doc_id", "payload", "mime").mapInPandas(
        _thumbnail_batches, schema=THUMB_SCHEMA
    )


def _hexv(i_expr: str) -> str:
    """DuckDB: byte value at 0-based offset `i_expr` of the hex text."""
    return (
        f"((strpos('0123456789ABCDEF', substr(hx, CAST(2 * ({i_expr}) + 1 "
        f"AS BIGINT), 1)) - 1) * 16 + (strpos('0123456789ABCDEF', "
        f"substr(hx, CAST(2 * ({i_expr}) + 2 AS BIGINT), 1)) - 1))"
    )


def _thumb_px(r: str = "r", c: str = "c", ch: str = "ch") -> str:
    """DuckDB: the 2x2 floor box mean for thumb pixel (r, c, ch)."""
    src = lambda dr, dc: _hexv(
        f"3 * ((2 * {r} + {dr}) * {PPM_W} + (2 * {c} + {dc})) + {ch}"
    )
    return (
        f"({src(0, 0)} + {src(0, 1)} + {src(1, 0)} + {src(1, 1)}) // 4"
    )


@register(
    "mm_thumbnail_resize",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               2 + doc_id % 3 AS ih
        FROM documents
        WHERE octet_length(encode(text)) >= {3 * PPM_W * 4}
    ),
    t AS (
        SELECT doc_id, ih, r, c, ch,
               {_thumb_px()} AS v,
               3 * (r * ({PPM_W} // 2) + c) + ch + 1 AS w8
        FROM b,
        LATERAL unnest(range(0, ih // 2)) AS rr(r),
        LATERAL unnest(range(0, {PPM_W} // 2)) AS cc(c),
        LATERAL unnest(range(0, 3)) AS cc2(ch)
    )
    SELECT doc_id,
           CAST({PPM_W} // 2 AS INTEGER) AS out_w,
           CAST(ih // 2 AS INTEGER) AS out_h,
           CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS t_sum_r,
           CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS t_sum_g,
           CAST(SUM(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS t_sum_b,
           CAST(MIN(v) AS INTEGER) AS t_min,
           CAST(MAX(v) AS INTEGER) AS t_max,
           CAST(SUM(v * w8) AS BIGINT) AS t_checksum
    FROM t
    GROUP BY doc_id, ih
    """,
)
def mm_thumbnail_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel resize end-to-end: synthesize the P6 payload, decode
    it with the pure-Python parser, 2x2 integer box-downsample the
    raster in numpy inside Arrow-batched mapInPandas, and emit
    thumbnail stats + a position-weighted checksum.  The oracle
    re-derives every OUTPUT pixel independently from the construction
    rule (four hex-pair lookups + floor mean each), so block geometry,
    channel layout, odd-row cropping, and pixel placement are all
    hash-certified.  Completes decode → transform on the image lane
    (mm_frame_sample remains the transport-level byte-budget cut)."""
    d = load_table(spark, sf_dir, "documents")
    return thumbnail_stats(attach_ppm_payload(d))
