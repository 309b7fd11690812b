"""Multimodal column pattern (north-star M4): opaque binary payloads +
typed metadata, with decode as a Pandas-native batch operator.

Design (the part that matters at 100 TB):
- media lives in a `binary` column next to a typed metadata struct
  (byte length, mime, digest) — scans prune to metadata without
  touching payload bytes;
- decode / feature-extraction runs via `mapInPandas`: Arrow-batched,
  schema-stable, partition-parallel.  The actual image/audio codecs are
  NOT in this container, so `decode_media` is a clearly-marked stub
  (`NotImplementedError`) and `fake_decode_features` is the
  deterministic stand-in that keeps every piece of Spark plumbing —
  schema, batch iteration, partitioning — real and tested.

The metadata path is oracle-checked (mm_metadata); the mapInPandas path
is Python-side by construction, so it registers rows-only and is pinned
by unit tests instead.
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


def decode_media(payload: bytes, mime: str):
    """Real decode hook — requires image/audio codecs not present in
    this environment.  Kept as an explicit seam: swap in PIL/ffmpeg
    per-mime here; the mapInPandas plumbing above/below is unchanged."""
    raise NotImplementedError(
        "media codecs are not available in this container; "
        "use fake_decode_features for the plumbing path"
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


@register(
    "mm_decode_features",
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
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode path end-to-end (binary column → Arrow batches →
    Pandas features), now with a REAL oracle: the stand-in decoder emits
    decoder-independent deterministic features — byte length, head/tail
    hex slices, an md5 over the first 64 bytes' hex, and a 16-bucket
    high-nibble byte histogram (comma-joined to a scalar string: the
    result contract is flat sortable columns) — that DuckDB reproduces
    over the same binary column.  This certifies the whole mapInPandas path (Arrow
    batch shape, schema contract, partition parallelism) byte-for-byte
    even while the real codec stays a stub (`decode_media`)."""
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
