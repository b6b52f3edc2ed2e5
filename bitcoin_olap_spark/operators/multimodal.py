"""Multimodal-column operators: image/audio/video as opaque `binary`
columns with typed metadata.

The pattern (the one a 100 TB training-data pipeline needs):

- payloads are ``binary`` columns ridden alongside a typed metadata
  struct (``format``, ``n_bytes``, ``n_frames``) — never parsed by the
  engine itself, so scans stay columnar and metadata predicates push
  down to parquet without touching payload bytes;
- decode / feature-extract / resize run as Arrow-batched
  ``mapInPandas`` stages — the only place payload bytes are opened —
  so the expensive step is embarrassingly parallel, partition-local,
  and sized by ``spark.sql.files.maxPartitionBytes`` rather than row
  count;
- frame sampling and other metadata-only derivations stay JVM-side
  (``F.sequence`` + ``explode``) — no payload I/O at all.

The container has no image/audio codecs, so the real decoder is gated
behind an import-try and raises ``NotImplementedError`` (clearly
marked STUB); the deterministic fallback "decode" is a byte histogram
— real Spark plumbing (schema, batching, partitioning) with a fake
codec, per the build contract.

Testdata has no binary table, so `attach_blob` synthesizes the payload
deterministically from `documents.text` (UTF-8 bytes); every operator
downstream treats it as opaque media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: histogram bins for the deterministic fake "decoder"
N_FEATURE_BINS = 16

#: deterministic fake frame count: bounded, derived from payload size
MAX_FRAMES = 240


def media_format(id_col: Column) -> Column:
    """Deterministic format tag (stands in for real content sniffing)."""
    return (
        F.when(id_col % 3 == 0, "image/png")
        .when(id_col % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )


def attach_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize the multimodal shape from a text corpus: opaque
    `blob BINARY` payload + `media_meta STRUCT<format, n_bytes,
    n_frames>`. On a real dataset these columns arrive from the source
    (parquet BINARY + sidecar metadata); this constructor only exists
    because the synthetic testdata ships no binary table."""
    blob = F.encode(F.col(text_col), "UTF-8")
    n_bytes = F.octet_length(F.col(text_col)).cast("long")
    return df.select(
        F.col(id_col),
        blob.alias("blob"),
        F.struct(
            media_format(F.col(id_col)).alias("format"),
            n_bytes.alias("n_bytes"),
            ((n_bytes % MAX_FRAMES) + F.lit(1)).alias("n_frames"),
        ).alias("media_meta"),
    )


def frame_sample(
    df: DataFrame, id_col: str, every: int = 10
) -> DataFrame:
    """Sample every `every`-th frame index per media row — metadata-only,
    pure JVM (`F.sequence` + `explode`), zero payload I/O. Returns
    (id_col, frame_idx LONG)."""
    n_frames = F.col("media_meta.n_frames")
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                (n_frames - 1).cast("long"),
                F.lit(every).cast("long"),
            )
        ).alias("frame_idx"),
    )


def _decode_real(payload: bytes, fmt: str):  # pragma: no cover - STUB
    """STUB: real codec path. The container ships no image/audio libs;
    on a production cluster this is where PIL / soundfile / pyav load
    `payload`."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "STUB: media codecs (PIL/soundfile/pyav) are not installed "
            "in this environment; use fake='histogram' decoding"
        ) from exc
    raise NotImplementedError("STUB: real decode path not wired yet")


def resize_payload(
    df: DataFrame, id_col: str, target_bytes: int = 256, fake: str = "truncate"
) -> DataFrame:
    """Resize/downsample payloads to a byte budget, updating metadata:
    (id_col, blob BINARY, media_meta STRUCT<...>) with n_bytes <=
    target_bytes and n_frames rederived.

    Same mapInPandas seam as decode_features: `fake='truncate'` is the
    deterministic stand-in codec (byte-truncate — a real pipeline swaps
    in PIL resize / audio downsample behind `fake=None`, which raises
    the gated STUB). Runs payload-local, no shuffle; output partition
    sizes shrink to the byte budget, which is the operator's point at
    100 TB (decode-and-shrink early, ship small bytes downstream)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, blob binary, "
        "media_meta struct<format:string,n_bytes:bigint,n_frames:bigint>"
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fake is None:
                _decode_real(
                    pdf["blob"].iloc[0], pdf["media_meta"].iloc[0]["format"]
                )
            blobs = [bytes(b)[:target_bytes] for b in pdf["blob"]]
            meta = [
                {
                    "format": m["format"],
                    "n_bytes": len(b),
                    "n_frames": (len(b) % MAX_FRAMES) + 1,
                }
                for m, b in zip(pdf["media_meta"], blobs)
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "blob": blobs, "media_meta": meta}
            )

    return df.mapInPandas(run, schema=out_schema)


def decode_features(
    df: DataFrame, id_col: str, fake: str = "histogram"
) -> DataFrame:
    """Decode payloads and emit fixed-width features:
    (id_col, n_bytes LONG, features ARRAY<DOUBLE> of N_FEATURE_BINS).

    Arrow-batched `mapInPandas`: payload bytes cross into Python once
    per batch, features come back columnar. `fake='histogram'` uses the
    deterministic byte-histogram codec (normalized 16-bin histogram of
    payload bytes); `fake=None` calls the gated real decoder (raises
    NotImplementedError here — see `_decode_real`)."""
    import numpy as np

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_bytes long, features array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fake is None:
                _decode_real(
                    pdf["blob"].iloc[0], pdf["media_meta"].iloc[0]["format"]
                )
            feats, sizes = [], []
            for payload in pdf["blob"]:
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(
                    buf >> 4, minlength=N_FEATURE_BINS
                ).astype(np.float64)
                total = hist.sum()
                feats.append(hist / total if total else hist)
                sizes.append(len(buf))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=out_schema)
