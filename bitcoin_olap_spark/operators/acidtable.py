"""Minimal ACID table format: versioned manifests + copy-on-write data.

The reference's dedup maintenance DELETEs rows in place
(btcolap.sql:1-15, dupedeleter.sql:1); plain parquet has no in-place
delete, and no lakehouse format (Delta/Iceberg) ships in this
environment — so this module implements the essential subset of their
PUBLIC design (Delta's _delta_log JSON commits, Iceberg's snapshot
manifests) from first principles:

- A table is a directory: `data/` holds immutable parquet files,
  `_log/` holds one JSON manifest per version (`00000003.json`),
  each listing the EXACT data files that make up that snapshot.
- Readers resolve a snapshot by manifest — never by listing `data/`
  — so concurrent writers never corrupt a read (files are immutable,
  manifests are immutable, a version is a closed file list). Reading
  an old version IS time travel.
- Writers follow copy-on-write at FILE granularity: a DELETE
  identifies the files that contain matching rows (input_file_name()
  — one filtered scan), rewrites ONLY those files without the deleted
  rows, and commits a new manifest = untouched files + rewritten
  files. On a 100 TB table where a predicate touches 0.1% of files,
  the delete rewrites 0.1% of the data and the commit is a metadata
  operation for the rest — the property that makes ACID maintenance
  feasible at scale.
- Commits are atomic + optimistic: the manifest is written to a temp
  name and `os.link`-ed (fails if the target exists) into place, so
  two concurrent writers racing to version N+1 cannot both win;
  the loser re-reads and retries — Delta's optimistic concurrency
  protocol, single-writer-wins per version.

Scale note: the manifest holds file PATHS (plus row counts), i.e.
metadata bounded by file count, not data size; Spark reads the listed
files with the ordinary vectorized parquet reader, so all pushdown/
pruning behavior is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _log_dir(root: str) -> str:
    return os.path.join(root, "_log")


def _data_dir(root: str) -> str:
    return os.path.join(root, "data")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.json")


def current_version(root: str) -> int:
    """Highest committed version, or -1 for an empty/uninitialized
    table. O(#versions) listing of the log directory only."""
    log = _log_dir(root)
    if not os.path.isdir(log):
        return -1
    versions = [
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    ]
    return max(versions) if versions else -1


def read_manifest(root: str, version: int | None = None) -> dict:
    v = current_version(root) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no committed version in {root}")
    with open(_manifest_path(root, v)) as f:
        return json.load(f)


def _commit(root: str, version: int, files: list[str], op: str) -> None:
    """Atomically publish `version`. os.link fails with EEXIST if a
    concurrent writer already committed this version — optimistic
    concurrency, loser retries against the new snapshot."""
    os.makedirs(_log_dir(root), exist_ok=True)
    manifest = {
        "version": version,
        "op": op,
        "files": sorted(files),
        "n_files": len(files),
    }
    tmp = os.path.join(_log_dir(root), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, _manifest_path(root, version))
    except FileExistsError:
        raise ConcurrentCommitError(
            f"version {version} already committed in {root}"
        )
    finally:
        os.unlink(tmp)


class ConcurrentCommitError(RuntimeError):
    """Another writer won the race to this version number."""


def _write_data_files(df: DataFrame, root: str) -> list[str]:
    """Write df as immutable parquet files under data/ (a fresh
    UUID-named subdirectory per write — files are never overwritten)
    and return their paths."""
    sub = os.path.join(_data_dir(root), uuid.uuid4().hex)
    df.write.mode("error").parquet(sub)
    return [
        os.path.join(sub, f)
        for f in os.listdir(sub)
        if f.endswith(".parquet")
    ]


def init_table(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Create version 0 from df. Errors if the table already exists."""
    if current_version(root) >= 0:
        raise FileExistsError(f"table already initialized at {root}")
    files = _write_data_files(df, root)
    _commit(root, 0, files, op="init")
    return 0


def snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The table AS OF `version` (latest if None) — time travel is
    just reading an older manifest's closed file list."""
    m = read_manifest(root, version)
    return spark.read.parquet(*m["files"])


def delete_where(spark: SparkSession, root: str, cond) -> int:
    """ACID DELETE via file-level copy-on-write: only files that
    contain at least one matching row are rewritten (without their
    matching rows); every other file carries over into the new
    manifest untouched. Returns the committed version."""
    base = current_version(root)
    m = read_manifest(root, base)
    snap = spark.read.parquet(*m["files"])
    # one filtered scan finds the affected files; the predicate pushes
    # into the parquet scan, so unaffected files are mostly skipped by
    # row-group stats before they are even read
    affected = {
        r["f"]
        for r in snap.filter(cond)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    # input_file_name returns URIs (file://...); normalize to paths
    affected = {f.replace("file://", "").split("?")[0] for f in affected}
    kept = [f for f in m["files"] if f not in affected]
    new_files = list(kept)
    if affected:
        # DELETE removes rows where cond is TRUE only; under three-
        # valued logic ~NULL is NULL (filtered out), which would
        # silently drop NULL-predicate rows from rewritten files while
        # identical rows in untouched files survive — data loss that
        # depends on file co-location. coalesce pins NULL -> keep.
        rewritten = spark.read.parquet(*sorted(affected)).filter(
            ~F.coalesce(cond, F.lit(False))
        )
        new_files += _write_data_files(rewritten, root)
    _commit(root, base + 1, new_files, op="delete")
    return base + 1


def vacuum(root: str, keep_versions: int = 1) -> int:
    """Physically remove data files referenced ONLY by manifests older
    than the newest `keep_versions` (and those manifests). Returns the
    number of files removed. The destructive companion op every CoW
    format needs — separated from delete_where so time travel works
    until the user explicitly gives it up."""
    latest = current_version(root)
    # a caller asking to keep more history than exists is a no-op, not
    # a crash: clamp so the live-file loop never sees a negative version
    cutoff = max(latest - keep_versions + 1, 0)
    live: set[str] = set()
    for v in range(cutoff, latest + 1):
        live.update(read_manifest(root, v)["files"])
    removed = 0
    for v in range(0, cutoff):
        path = _manifest_path(root, v)
        if not os.path.exists(path):
            continue
        for f in read_manifest(root, v)["files"]:
            if f not in live and os.path.exists(f):
                os.unlink(f)
                removed += 1
        os.unlink(path)
    # drop now-empty data subdirectories
    ddir = _data_dir(root)
    if os.path.isdir(ddir):
        for sub in os.listdir(ddir):
            p = os.path.join(ddir, sub)
            if os.path.isdir(p) and not any(
                f.endswith(".parquet") for f in os.listdir(p)
            ):
                shutil.rmtree(p, ignore_errors=True)
    return removed


def merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """ACID MERGE (upsert) via the same file-level copy-on-write as
    delete_where: files containing a matched key are rewritten with
    those rows replaced by their update; unmatched update rows append
    as new files; untouched files carry over by reference. The matched-
    file probe is one semi-join keyed scan (update keys are typically
    tiny vs the table, so AQE broadcasts them), and the rewrite reads
    ONLY affected files — O(touched files + updates), never O(table).
    Returns the committed version."""
    base = current_version(root)
    m = read_manifest(root, base)
    snap = spark.read.parquet(*m["files"])
    keys = updates.select(*key_cols).distinct()
    # SQL MERGE (and Delta) error when multiple source rows match one
    # target key; appending duplicates verbatim would silently corrupt
    # key uniqueness — enforce the same contract here
    n_updates, n_keys = updates.count(), keys.count()
    if n_updates != n_keys:
        raise ValueError(
            f"merge_upsert: updates contain {n_updates - n_keys} "
            f"duplicate rows for {key_cols}; pre-deduplicate on the "
            "merge key (one source row per target key, as SQL MERGE "
            "requires)"
        )
    # input_file_name() must bind while the plan has ONE source — stamp
    # it on the snapshot scan BEFORE joining the update keys
    stamped = snap.withColumn("__f", F.input_file_name())
    affected = {
        r["__f"]
        for r in stamped.join(keys, key_cols, "left_semi")
        .select("__f")
        .distinct()
        .collect()
    }
    affected = {f.replace("file://", "").split("?")[0] for f in affected}
    kept = [f for f in m["files"] if f not in affected]
    new_files = list(kept)
    if affected:
        old_rows = spark.read.parquet(*sorted(affected))
        survivors = old_rows.join(keys, key_cols, "left_anti")
        new_files += _write_data_files(survivors, root)
    # matched updates replace their old rows; unmatched updates insert
    new_files += _write_data_files(updates, root)
    _commit(root, base + 1, new_files, op="merge")
    return base + 1


def optimize(
    spark: SparkSession, root: str, target_files: int = 4
) -> int:
    """OPTIMIZE: rewrite the current snapshot's many small files into
    `target_files` compacted ones as a NEW version — content-identical,
    layout-only (the lakehouse maintenance command; Delta OPTIMIZE /
    Iceberg rewrite_data_files). Because it commits through the same
    manifest protocol, readers of older versions are untouched and a
    concurrent writer conflict is detected, not silently lost. Returns
    the committed version."""
    base = current_version(root)
    m = read_manifest(root, base)
    snap = spark.read.parquet(*m["files"])
    files = _write_data_files(snap.repartition(target_files), root)
    _commit(root, base + 1, files, op="optimize")
    return base + 1


def add_columns(
    spark: SparkSession, root: str, new_df: DataFrame
) -> int:
    """Schema evolution by appending a batch with EXTRA columns: old
    data files keep their narrow schema on disk (never rewritten);
    snapshots read with mergeSchema so pre-evolution rows surface the
    new columns as NULL — Delta/Iceberg's add-column semantics, which
    at 100 TB is the difference between a metadata change and a
    full-table rewrite. Returns the committed version."""
    base = current_version(root)
    m = read_manifest(root, base)
    files = m["files"] + _write_data_files(new_df, root)
    _commit(root, base + 1, files, op="add-columns")
    return base + 1


def snapshot_merged(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """snapshot() with schema merging across the version's files —
    needed once add_columns has widened the table."""
    m = read_manifest(root, version)
    return spark.read.option("mergeSchema", "true").parquet(*m["files"])
