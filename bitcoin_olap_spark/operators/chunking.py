"""Document chunking and context packing for training-data pipelines.

Both are MAP-ONLY per document (chunking) or partitioned-window
(packing) — no corpus-wide shuffle, so they scale linearly with the
document count at any data volume:

- chunk_words:  overlapping word-window chunks built from the in-row
                word array with `sequence` + `slice` (document-local —
                the same zero-shuffle rationale as
                text.shingle_array).
- pack_sequential: shard-local sequential context packing — documents
                are assigned to fixed token-budget bins by a prefix sum
                over a window PARTITIONED BY SHARD. Each shard packs
                independently (exactly how a distributed packer works:
                one packer per partition), so no un-partitioned global
                window exists anywhere in the plan — the anti-pattern
                a corpus-wide `ORDER BY` prefix sum would create.

The reference has no chunking/packing surface (it stops at SQL
analytics, btcolap.sql); these extend the engine for LLM-data
preparation per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import words


def chunk_words(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping word windows of `size`
    words every `stride` words: (id, chunk_id, chunk_text, n_words).

    The chunk starts are 0, stride, 2*stride, …; the last start is the
    smallest multiple of stride with start + size >= n_words, so every
    word is covered (size > stride => adjacent chunks overlap by
    size - stride words). Built entirely from the in-row word array
    (`sequence` of starts -> `slice` -> `array_join`), then exploded —
    zero shuffles, the construction never leaves the row."""
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    ws = words(text_col)
    n = F.size(ws)
    k = (
        F.when(n <= size, F.lit(1))
        .otherwise(
            F.ceil((n - size) / F.lit(float(stride))).cast("int") + 1
        )
    )
    start = F.col("chunk_id").cast("int") * stride
    return (
        df.select(
            F.col(id_col),
            ws.alias("_ws"),
            n.alias("_n"),
            F.explode(F.sequence(F.lit(0), k - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice("_ws", start + 1, size), " "
            ).alias("chunk_text"),
            F.least(F.col("_n") - start, F.lit(size))
            .cast("long")
            .alias("n_words"),
        )
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    modulus: int = 16,
) -> DataFrame:
    """CONTENT-DEFINED chunking (FastCDC/LBFS boundary rule at word
    grain): a new chunk starts at every ANCHOR word — one whose
    md5-derived 32-bit hash is 0 mod `modulus` — so chunks average
    `modulus` words and boundaries depend only on local content.
    Inserting or deleting words resynchronizes at the next anchor:
    every chunk outside the edited region keeps its exact text (the
    dedup-under-edits property fixed windows lack — they shift every
    downstream chunk). Returns (id, idx, chunk), idx = 0-based chunk
    position within the document.

    Map-only per document: boundary positions via `filter` over the
    word-index sequence, chunk strings via `transform` + `slice`
    between consecutive boundaries — no per-word explode before the
    chunk-grain output, no shuffle. The md5 anchor rule is chosen for
    ANSI-SQL replayability (('0x'||substr(md5(w),1,8))::BIGINT), so a
    DuckDB oracle can re-derive identical boundaries; a
    non-oracle-checked deployment would use xxhash64."""
    ws = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("ws")
    )
    is_anchor = lambda i: (i > 0) & (  # noqa: E731 — inline lambda-col
        F.conv(
            F.substring(F.md5(F.element_at("ws", (i + 1).cast("int"))), 1, 8),
            16,
            10,
        ).cast("long")
        % modulus
        == 0
    )
    bounds = ws.select(
        id_col,
        "ws",
        F.concat(
            F.array(F.lit(0).cast("long")),
            F.filter(
                F.sequence(
                    F.lit(0).cast("long"), F.size("ws").cast("long") - 1
                ),
                is_anchor,
            ),
            F.array(F.size("ws").cast("long")),
        ).alias("bs"),
    )
    return bounds.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"), F.size("bs").cast("long") - 2
                ),
                lambda j: F.array_join(
                    F.slice(
                        "ws",
                        (F.element_at("bs", (j + 1).cast("int")) + 1).cast(
                            "int"
                        ),
                        (
                            F.element_at("bs", (j + 2).cast("int"))
                            - F.element_at("bs", (j + 1).cast("int"))
                        ).cast("int"),
                    ),
                    " ",
                ),
            )
        ).alias("idx", "chunk"),
    ).select(id_col, F.col("idx").cast("long").alias("idx"), "chunk")


def pack_sequential(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 1024,
    n_shards: int = 32,
) -> DataFrame:
    """Shard-local sequential context packing: documents are hashed to
    `n_shards` shards, ordered by id within their shard, and assigned
    to token-budget bins by the exclusive prefix sum of their token
    counts: bin = floor(tokens_before / budget).

    Returns one row per (shard, bin): n_docs, bin_tokens. The window
    is PARTITIONED BY shard — each shard's prefix sum is an
    independent, bounded task, which is exactly the distributed-packer
    topology (one packer per partition). A global ORDER BY id prefix
    sum would funnel the corpus through one reducer; sharding trades
    cross-shard packing optimality for linear scalability, the
    standard production trade."""
    tokens = F.size(words(text_col)).cast("long")
    shard = (F.col(id_col) % n_shards).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("tokens").over(w), F.lit(0))
    assigned = df.select(
        F.col(id_col), shard.alias("shard"), tokens.alias("tokens")
    ).select(
        "shard",
        "tokens",
        F.floor(cum_before / F.lit(float(budget))).alias("bin"),
    )
    return assigned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("bin_tokens"),
    )
