"""Multimodal-column queries (SURVEY.md §7 Phase 5d; graded
first-class alongside the §2 inventory).

Payloads are opaque BINARY columns + typed metadata structs
(operators/multimodal.py). Metadata-only ops (`mm_blob_meta`,
`mm_frame_sample`) are fully SQL-expressible and oracle-checked; the
decode stage (`mm_decode_features`) opens payload bytes in an
Arrow-batched mapInPandas and registers rows-only (codec output is not
expressible in DuckDB SQL); tests/test_multimodal.py verifies its
values against an independent pure-numpy reference instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators import multimodal as MM
from ..registry import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.attach_blob(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )


@query(
    "mm_blob_meta",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/ppm'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/y4m' END AS format,
           octet_length(encode(text)) AS n_bytes,
           (octet_length(encode(text)) % 240) + 1 AS n_frames,
           md5(text) AS digest
    FROM documents
    """,
)
def mm_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque media payloads: format tag, byte
    length, frame count, content digest. Metadata predicates push down
    to parquet without reading payload bytes — the core reason payloads
    ride as opaque BINARY next to a typed struct."""
    m = _media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.n_frames").alias("n_frames"),
        F.md5("blob").alias("digest"),
    )


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, unnest(range(0, (octet_length(encode(text)) % 240) + 1,
                                10)) AS frame_idx
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling from video metadata — pure JVM
    sequence+explode, zero payload I/O (the decode stage then fetches
    only sampled frames on a real pipeline)."""
    return MM.frame_sample(_media(spark, sf_dir), "doc_id", every=10)


@query(
    "mm_resize",
    oracle="""
    SELECT doc_id,
           least(octet_length(encode(text)), 256) AS n_bytes,
           (least(octet_length(encode(text)), 256) % 240) + 1 AS n_frames
    FROM documents
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize payloads to a 256-byte budget (deterministic truncate
    codec standing in for image/audio downsampling) and rederive
    metadata. The oracle checks the metadata algebra (clamped byte
    length, frame count); the payload transform itself is pinned by
    tests against a pure-Python reference."""
    resized = MM.resize_payload(_media(spark, sf_dir), "doc_id", 256)
    return resized.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.n_frames").alias("n_frames"),
    )


@query("mm_decode_features", oracle=None)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec decode + feature-extract: raw bytes are transcoded
    into genuine containers (netpbm P6 / RIFF WAV PCM16 / YUV4MPEG2 —
    operators/multimodal.encode_media), then `decode_media` parses the
    actual container headers and the features are a 16-bin histogram
    over DECODED pixel/sample values, all inside Arrow-batched
    mapInPandas stages. Rows-only driver check (container parsing is
    not expressible in DuckDB SQL); tests pin exact values against an
    independent struct-module reference parser and exact encode/decode
    round-trips. The registered projection serializes the feature
    vector to a CSV string — registered queries must emit scalar-only
    columns for the external canonicalizer."""
    feats = MM.decode_features(
        MM.transcode(_media(spark, sf_dir), "doc_id"), "doc_id", fake=None
    )
    return feats.select(
        "doc_id",
        "n_bytes",
        "n_samples",
        F.array_join(
            F.transform(
                "features", lambda x: F.format_number(x, 6)
            ),
            ",",
        ).alias("features"),
    )
