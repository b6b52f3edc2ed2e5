"""Minimal ACID table format: versioned manifests + copy-on-write data.

The reference's dedup maintenance DELETEs rows in place
(btcolap.sql:1-15, dupedeleter.sql:1); plain parquet has no in-place
delete, and no lakehouse format (Delta/Iceberg) ships in this
environment — so this module implements the essential subset of their
PUBLIC design (Delta's _delta_log JSON commits, Iceberg's snapshot
manifests) from first principles:

- A table is a directory: `data/` holds immutable parquet files,
  `_log/` holds one JSON manifest per version (`00000003.json`).
  Manifests are DELTAS: each lists only the files ADDED and REMOVED
  relative to the previous version, so the per-commit metadata write
  is O(changed files) — at 100 TB (1e6+ live files) an append or a
  targeted DELETE commits a few-hundred-byte manifest, not a
  megabytes-long full listing. Every ``CHECKPOINT_EVERY``-th version
  additionally materializes a full file listing as a sidecar
  (`00000016.checkpoint.json`), Delta's checkpoint-parquet pattern,
  so resolving any snapshot replays a bounded number of deltas.
- Readers resolve a snapshot by manifest — never by listing `data/`
  — so concurrent writers never corrupt a read (files are immutable,
  manifests are immutable, a version is a closed file list: nearest
  checkpoint at-or-below + delta replay forward). Reading an old
  version IS time travel.
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

import datetime
import decimal
import json
import os
import shutil
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _log_dir(root: str) -> str:
    return os.path.join(root, "_log")


def _data_dir(root: str) -> str:
    return os.path.join(root, "data")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.json")


def _checkpoint_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.checkpoint.json")


#: full-listing checkpoint cadence (Delta writes a checkpoint parquet
#: every 10 commits for the same reason): snapshot resolution replays
#: at most this many delta manifests past the nearest checkpoint.
CHECKPOINT_EVERY = 16


def current_version(root: str) -> int:
    """Highest committed version, or -1 for an empty/uninitialized
    table. O(#versions) listing of the log directory only."""
    log = _log_dir(root)
    if not os.path.isdir(log):
        return -1
    versions = [
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".json")
        and ".checkpoint." not in f
        and f.split(".")[0].isdigit()
    ]
    return max(versions) if versions else -1


def _read_raw(root: str, version: int) -> dict:
    """One version's manifest as written (delta: op + add/remove) —
    O(changed files), no snapshot resolution."""
    if version < 0:
        raise FileNotFoundError(f"no committed version in {root}")
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _resolve_files(root: str, version: int) -> list[str]:
    """The closed data-file list of snapshot `version`: walk back to
    the nearest checkpoint (or legacy full manifest) at-or-below, then
    replay the delta manifests forward. Bounded by CHECKPOINT_EVERY
    deltas after the first checkpoint exists."""
    deltas: list[dict] = []
    v = version
    while True:
        if v < 0:
            raise FileNotFoundError(
                f"no checkpoint or base manifest at or below version "
                f"{version} in {root}"
            )
        cp = _checkpoint_path(root, v)
        if os.path.exists(cp):
            with open(cp) as f:
                files = set(json.load(f)["files"])
            break
        m = _read_raw(root, v)
        if "files" in m:  # legacy full manifest (pre-delta format)
            files = set(m["files"])
            break
        deltas.append(m)
        if v == 0:  # version 0's delta is against the empty table
            files = set()
            break
        v -= 1
    for m in reversed(deltas):
        files.difference_update(m["remove"])
        files.update(m["add"])
    return sorted(files)


def read_manifest(
    root: str, version: int | None = None, resolve: bool = True
) -> dict:
    """Manifest of `version` (latest if None). With resolve=True the
    snapshot's full file list is materialized under "files"/"n_files"
    (checkpoint + delta replay); resolve=False returns the raw delta
    record (op/add/remove) in O(changed files) — the cheap path for
    log scans that only need commit metadata."""
    v = current_version(root) if version is None else version
    m = _read_raw(root, v)
    if resolve:
        files = _resolve_files(root, v)
        m["files"] = files
        m["n_files"] = len(files)
    return m


def write_checkpoint(root: str, version: int | None = None) -> int:
    """Materialize a full file-listing checkpoint sidecar for
    `version` (latest if None) — atomic via temp-file + os.replace, so
    a concurrent reader never sees a partial listing. Idempotent."""
    v = current_version(root) if version is None else version
    files = _resolve_files(root, v)
    # the dvs union rides in every checkpoint so merge-on-read deletes
    # survive vacuum (the cutoff checkpoint is written before the
    # delta manifests carrying the 'dv' keys are dropped)
    dvs = _resolve_dv_files(root, v)
    tmp = os.path.join(_log_dir(root), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"version": v, "files": files, "dvs": dvs}, f)
    os.replace(tmp, _checkpoint_path(root, v))
    return v


def _earliest_version(root: str) -> int:
    """Lowest version whose manifest still exists in the log (vacuum
    removes manifests below its cutoff). 0 on a never-vacuumed or
    empty table."""
    log = _log_dir(root)
    if not os.path.isdir(log):
        return 0
    return min(
        (
            int(f.split(".")[0])
            for f in os.listdir(log)
            if f.endswith(".json")
            and ".checkpoint." not in f
            and f.split(".")[0].isdigit()
        ),
        default=0,
    )


def _table_id_path(root: str) -> str:
    return os.path.join(_log_dir(root), "_table_id")


def table_id(root: str) -> str:
    """Stable uuid identifying THIS incarnation of the table (Delta's
    metadata.id): written once when the log is created, removed with
    the table, so a table dropped and recreated at the same root gets
    a DIFFERENT id. committed_ops keys its per-process cache on it —
    an op-tag coincidence on a recreated table can no longer validate
    a stale cache entry. Created lazily (atomic os.link, first writer
    wins) for tables that predate the id file."""
    p = _table_id_path(root)
    try:
        with open(p) as f:
            return f.read().strip()
    except FileNotFoundError:
        pass
    os.makedirs(_log_dir(root), exist_ok=True)
    tmp = os.path.join(_log_dir(root), f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(uuid.uuid4().hex)
    try:
        os.link(tmp, p)
    except FileExistsError:
        pass  # a concurrent caller won the create race — use theirs
    finally:
        os.unlink(tmp)
    with open(p) as f:
        return f.read().strip()


def _vacuum_marker_path(root: str) -> str:
    return os.path.join(_log_dir(root), "_last_vacuum.json")


def _vacuumed_ops_path(root: str) -> str:
    return os.path.join(_log_dir(root), "_vacuumed_ops.json")


def _vacuumed_ops(root: str) -> set:
    """Op tags of manifests vacuum has physically removed — persisted
    so exactly-once dedup history (append_idempotent) survives table
    maintenance, Delta's txn appId/version sidecar pattern."""
    p = _vacuumed_ops_path(root)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f)["ops"])


def _record_vacuumed_ops(root: str, ops: set) -> None:
    """Merge `ops` into the persisted vacuumed-op set (atomic replace).
    Written by vacuum BEFORE it unlinks the manifests that carry them,
    so committed_ops never loses a tag across maintenance."""
    merged = _vacuumed_ops(root) | set(ops)
    tmp = os.path.join(_log_dir(root), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"ops": sorted(merged)}, f)
    os.replace(tmp, _vacuumed_ops_path(root))


def _record_vacuum_cutoff(root: str, cutoff: int) -> None:
    """Durably record vacuum's cutoff (atomic replace, monotone): any
    version below it may have had its data files physically removed,
    so restore() must refuse such targets."""
    prev = vacuum_cutoff(root)
    if cutoff <= prev:
        return
    tmp = os.path.join(_log_dir(root), f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump({"cutoff": cutoff}, f)
    os.replace(tmp, _vacuum_marker_path(root))


def vacuum_cutoff(root: str) -> int:
    """Earliest version guaranteed restorable: versions below this may
    reference physically vacuumed data files. 0 if never vacuumed."""
    p = _vacuum_marker_path(root)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["cutoff"])


def _commit(
    root: str,
    version: int,
    op: str,
    *,
    add: list[str] = (),
    remove: list[str] = (),
    stats: dict | None = None,
    cdc: list[str] | None = None,
    dv: list[str] | None = None,
    dv_reset: list[str] | None = None,
) -> None:
    """Atomically publish `version` as a DELTA manifest — only the
    files added/removed vs version-1, so the commit write is
    O(changed files) no matter how large the table is. os.link fails
    with EEXIST if a concurrent writer already committed this version
    — optimistic concurrency, loser retries against the new snapshot.
    Every CHECKPOINT_EVERY-th version also writes a full checkpoint
    sidecar AFTER the commit point (crash between the two is safe:
    resolution just walks back to the previous checkpoint)."""
    os.makedirs(_log_dir(root), exist_ok=True)
    if version == 0:
        table_id(root)  # stamp this incarnation's identity at birth
    manifest = {
        "version": version,
        "op": op,
        "add": sorted(add),
        "remove": sorted(remove),
    }
    if stats:
        # OPTIONAL per-file column min/max for data skipping —
        # readers that ignore this key stay correct (a file without
        # stats is simply never skipped), so old manifests and new
        # readers interoperate in both directions
        manifest["stats"] = stats
    if cdc is not None:
        # OPTIONAL write-time materialized change data (Delta's
        # _change_data design): same compatibility posture as stats —
        # snapshot readers never look at it, CDF readers require it
        # only for commits that removed files
        manifest["cdc"] = sorted(cdc)
    if dv is not None:
        # deletion-vector files this commit adds (merge-on-read
        # DELETE); snapshot readers subtract the accumulated union
        manifest["dv"] = sorted(dv)
    if dv_reset is not None:
        # REPLACE the accumulated vector set as of this commit —
        # restore rewinds it to the target version's set (else deletes
        # committed after the target would survive the rewind), and
        # layout rewrites (optimize) empty it, since their fresh files
        # made every old vector inert
        manifest["dv_reset"] = sorted(dv_reset)
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
    if version % CHECKPOINT_EVERY == 0:
        write_checkpoint(root, version)


class ConcurrentCommitError(RuntimeError):
    """Another writer won the race to this version number."""


def _strip_uri(p: str) -> str:
    """Reduce an executor-reported file URI (input_file_name() /
    _metadata.file_path, "file:/x" or "file:///x", possibly with a
    query suffix) to a plain absolute path. URIs are percent-encoded
    (a table root containing a space arrives as %20), so the path is
    unquoted AFTER the scheme/query handling — skipping this made
    every _manifest_form mapping miss on such roots, silently turning
    delete_where/merge_upsert into no-ops (ADVICE r9)."""
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return urllib.parse.unquote(p.split("?")[0])


def _manifest_form(
    uris, manifest_files: list[str], strict: bool = True
) -> set[str]:
    """Map executor-reported file URIs back to the EXACT path strings
    the manifest stores. input_file_name()/_metadata.file_path are
    always absolute, but manifests keep paths as the table root was
    given — under a relative root, recording or intersecting the
    absolute form would silently never match a manifest entry (the
    ADVICE r8 resurrection bug class), so every comparison goes
    through realpath on both sides. In strict mode (scan-derived
    URIs) a miss is a protocol violation — the scan read a file the
    snapshot does not own, or a URI form this decoder mishandles —
    and raising keeps it LOUD instead of silently committing an
    empty 'affected' set (ADVICE r9). strict=False is the
    INTERSECTION mode for deletion-vector targets (ADVICE r10):
    vectors are add-only until a dv_reset, so a live vector may
    legitimately target a since-removed file; the read path treats
    such targets as inert (the anti-join never matches), and the
    DV-pending interlock must mirror that by dropping them, not
    hard-failing every CoW delete/merge."""
    by_real = {os.path.realpath(f): f for f in manifest_files}
    out: set[str] = set()
    for u in uris:
        rp = os.path.realpath(_strip_uri(u))
        hit = by_real.get(rp)
        if hit is None:
            if not strict:
                continue
            raise ValueError(
                f"acid: scanned file {u!r} (realpath {rp!r}) is not in "
                f"the snapshot manifest ({len(manifest_files)} files) — "
                "URI decoding mismatch or concurrent table mutation"
            )
        out.add(hit)
    return out


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


def _stat_encode(v):
    """JSON-safe encoding for a manifest min/max value. Timestamps and
    dates become zero-padded ISO strings — ORDER-PRESERVING under the
    plain string comparison the probe uses, so no decode is needed for
    them. Decimals become exact strings (the probe decodes them back
    to Decimal — string order is NOT numeric order). Bytes become hex
    (order-preserving: fixed two digits per byte). Everything JSON
    already handles passes through, including None for an all-NULL
    file, which the probe treats as 'no stats'."""
    if isinstance(v, datetime.datetime):
        # naive and aware timestamps both isoformat; Spark returns
        # session-local naive datetimes for TIMESTAMP columns
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _probe_coerce(lo, hi):
    """Coerce the caller's probe bounds to the manifests' encoded
    domain, returning (lo, hi, decode) where decode maps a STORED
    value back into the comparison domain. For ISO-encoded types the
    encoded strings compare correctly, so the bounds are encoded and
    decode is identity; for Decimal the stored strings are decoded
    back to Decimal instead."""
    probe = lo if lo is not None else hi
    if isinstance(probe, (datetime.datetime, datetime.date)):
        # Compare in the DATETIME domain, never the encoded-string
        # one: a date probe against a TIMESTAMP column's stats (or a
        # datetime probe against a DATE column's) mixes 10-char and
        # 19+-char ISO encodings, and plain string order then FALSELY
        # PRUNES boundary files — a stored min '2024-01-31T00:00:00'
        # sorts after the 10-char hi '2024-01-31' even though its
        # midnight rows satisfy the exact filter (SQL casts the date
        # bound to midnight). Decoding both sides to datetime makes
        # the boundary compare equal instead of skipped.
        def _to_dt(v):
            if isinstance(v, datetime.datetime):
                return v
            return datetime.datetime(v.year, v.month, v.day)

        return (
            _to_dt(lo) if lo is not None else None,
            _to_dt(hi) if hi is not None else None,
            lambda s: datetime.datetime.fromisoformat(s),
        )
    if isinstance(probe, (bytes, bytearray)):
        enc = _stat_encode
        return (
            enc(lo) if lo is not None else None,
            enc(hi) if hi is not None else None,
            lambda s: s,
        )
    if isinstance(probe, decimal.Decimal):
        return lo, hi, lambda s: decimal.Decimal(s)
    if isinstance(probe, (int, float)) and not isinstance(probe, bool):
        # the STORED stat decides the decode branch too: a DECIMAL
        # column's stats are exact strings ('9.50'), and an int/float
        # probe falling through to identity would compare str-vs-number
        # (TypeError) instead of pruning
        return (
            lo,
            hi,
            lambda s: decimal.Decimal(s) if isinstance(s, str) else s,
        )
    return lo, hi, lambda s: s


def _collect_file_stats(
    spark: SparkSession, files: list[str], cols: tuple
) -> dict:
    """Per-file min/max of `cols` over just-written files — ONE
    aggregate job at write time (grouped on input_file_name), the
    Delta/Iceberg write-side stats collection. Returns
    {path: {col: [lo, hi]}} with plain (non-URI) paths. Cost is a
    single scan of the batch being committed, never of the table."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"_mn_{c}"))
        aggs.append(F.max(c).alias(f"_mx_{c}"))
    rows = (
        spark.read.parquet(*files)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(*aggs)
        .collect()
    )
    out: dict = {}
    # stats dict keys must be the manifest's OWN path strings (relative
    # under a relative root), else the pruning probe never matches
    by_real = {os.path.realpath(f): f for f in files}
    for r in rows:
        path = by_real.get(
            os.path.realpath(_strip_uri(r["_f"])), _strip_uri(r["_f"])
        )
        out[path] = {
            c: [_stat_encode(r[f"_mn_{c}"]), _stat_encode(r[f"_mx_{c}"])]
            for c in cols
        }
    return out


def init_table(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    stats_cols: tuple = (),
    bloom_cols: tuple = (),
) -> int:
    """Create version 0 from df. Errors if the table already exists.
    stats_cols: columns whose per-file min/max land in the manifest
    for data skipping (snapshot_pruned). bloom_cols: columns whose
    per-file bloom bitmaps land there too (snapshot_bloom_lookup)."""
    if current_version(root) >= 0:
        raise FileExistsError(f"table already initialized at {root}")
    files = _write_data_files(df, root)
    stats = (
        _collect_file_stats(spark, files, stats_cols)
        if stats_cols
        else None
    )
    if bloom_cols:
        blooms = collect_file_blooms(spark, files, bloom_cols)
        stats = stats or {}
        for path, ent in blooms.items():
            stats.setdefault(path, {}).update(ent)
    _commit(root, 0, "init", add=files, stats=stats)
    return 0


def _resolve_stats(root: str, version: int) -> dict:
    """Merged per-file stats for snapshot `version`: replay every
    surviving delta manifest's optional stats key forward (removed
    files drop). Files committed without stats — or whose manifests
    were vacuumed away — simply have no entry and are never skipped,
    so the result is always safe, only possibly less selective.
    O(#surviving versions) manifest reads, like committed_ops."""
    stats: dict = {}
    for v in range(_earliest_version(root), version + 1):
        try:
            m = _read_raw(root, v)
        except FileNotFoundError:
            continue
        for f in m.get("remove", ()):
            stats.pop(f, None)
        stats.update(m.get("stats") or {})
    return stats


def snapshot_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
):
    """Range read with FILE SKIPPING: resolve the snapshot's file
    list, drop every file whose manifest [min, max] for `col` cannot
    intersect [lo, hi] (files without stats always read), scan only
    the survivors, and apply the exact filter to the survivors' rows.
    This is the table-format half of pruning — partition pruning's
    sibling that works on UNPARTITIONED layout, and the reason
    Delta/Iceberg record write-side stats: at 100 TB a range query
    over a range-clustered table opens O(matching files), not
    O(table). Returns (DataFrame, n_files_read, n_files_total)."""
    v = current_version(root) if version is None else version
    files = _resolve_files(root, v)
    stats = _resolve_stats(root, v)
    lo_c, hi_c, decode = _probe_coerce(lo, hi)
    kept = []
    for f in files:
        s = stats.get(f, {}).get(col)
        # a null min or max means the file's column is entirely NULL
        # (or stats were unrecorded) — 'no stats', never skipped: the
        # exact row filter below still excludes its rows, so keeping
        # it is only less selective, never wrong
        if s is None or s[0] is None or s[1] is None:
            kept.append(f)
        elif decode(s[0]) <= hi_c and decode(s[1]) >= lo_c:
            kept.append(f)
    dvs = _resolve_dv_files(root, v)
    df = (
        _apply_dvs(spark, spark.read.parquet(*kept), dvs).filter(
            (F.col(col) >= lo) & (F.col(col) <= hi)
        )
        if kept
        else spark.read.parquet(*files).filter(F.lit(False))
    )
    return df, len(kept), len(files)


def append(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    op: str = "append",
    stats_cols: tuple = (),
) -> int:
    """ACID append: write new immutable files, commit a delta manifest
    listing ONLY them — O(batch) commit cost at any table size (the
    shape a streaming sink needs). An append semantically conflicts
    with nothing, so losing the optimistic version race just rebases:
    re-read the head and re-commit the same file list (Delta's
    blind-append concurrency rule; the data files were already
    durable, only the metadata pointer moves). Returns the committed
    version. stats_cols: per-file min/max for data skipping, as in
    init_table."""
    files = _write_data_files(df, root)
    stats = (
        _collect_file_stats(spark, files, stats_cols)
        if stats_cols
        else None
    )
    while True:
        v = current_version(root) + 1
        try:
            _commit(root, v, op, add=files, stats=stats)
            return v
        except ConcurrentCommitError:
            continue


#: per-process incremental scan state for committed_ops: root ->
#: (table_id, last_scanned_version, op_of_that_version, frozenset(ops)).
#: Each call only reads manifests committed since the last scan, so a
#: long-running stream's per-batch idempotence check is O(new commits),
#: not O(#versions) — cumulative cost linear, not quadratic. The
#: table_id pins the entry to ONE table incarnation: a table removed
#: and recreated at the same root gets a fresh uuid, so a same-numbered
#: version carrying the same generic op tag (plain "append") can never
#: validate a stale entry and silently skip a first-time batch.
_OPS_CACHE: dict[str, tuple[str, int, str, frozenset]] = {}


def clone(root: str, dest: str, version: int | None = None) -> int:
    """SHALLOW CLONE (Delta's CLONE TABLE): dest's version 0 is one
    delta manifest whose add-list is the source snapshot's resolved
    data files — ZERO data movement, O(files) metadata, at any table
    size. Because data files are immutable and every write lands in a
    fresh UUID directory, the two tables diverge freely afterwards:
    appends/deletes/optimize on either side never touch files the
    other references. The documented caveat is Delta's own: VACUUM on
    the SOURCE does not know about clone references — vacuum only
    unlinks files the source's retained versions no longer list, so a
    cloned-then-deleted file can be vacuumed away under the clone;
    production policy is vacuum-after-clone-retirement (same contract
    as Delta shallow clones)."""
    if current_version(dest) >= 0:
        raise FileExistsError(f"table already initialized at {dest}")
    v = current_version(root) if version is None else version
    files = _resolve_files(root, v)
    os.makedirs(_data_dir(dest), exist_ok=True)
    # deletion vectors are part of the snapshot's logical content —
    # a clone that dropped them would resurrect MoR-deleted rows
    _commit(
        dest,
        0,
        f"clone:{root}@{v}",
        add=files,
        dv=_resolve_dv_files(root, v) or None,
    )
    return 0


def committed_ops(root: str) -> set:
    """The set of op tags ever committed to the log — union of the
    surviving manifests' tags and the persisted tags of vacuumed
    manifests (_vacuumed_ops), so the exactly-once history survives
    table maintenance. Incremental: a per-process cache remembers the
    highest version already scanned and only newer manifests are read
    (validated by re-reading the cached version's op, so a table
    recreated at the same root can't serve stale tags)."""
    head = current_version(root)
    ops = _vacuumed_ops(root)
    if head < 0:
        return ops
    tid = table_id(root)
    start = _earliest_version(root)
    cached = _OPS_CACHE.get(root)
    if cached is not None:
        cached_tid, last_v, last_op, cached_ops = cached
        if cached_tid == tid and start <= last_v <= head:
            try:
                valid = _read_raw(root, last_v)["op"] == last_op
            except FileNotFoundError:
                # cached version vacuumed since: its tag is in
                # _vacuumed_ops, the newer cached tags are still good
                valid = True
            if valid:
                ops |= cached_ops
                start = last_v + 1
    for v in range(start, head + 1):
        try:
            ops.add(_read_raw(root, v)["op"])
        except FileNotFoundError:
            # concurrent vacuum unlinked it mid-scan; vacuum persists
            # dropped tags BEFORE unlinking, so re-read the sidecar
            ops |= _vacuumed_ops(root)
    try:
        head_op = _read_raw(root, head)["op"]
        _OPS_CACHE[root] = (tid, head, head_op, frozenset(ops))
    except FileNotFoundError:
        _OPS_CACHE.pop(root, None)
    return ops


def append_idempotent(
    spark: SparkSession, root: str, df: DataFrame, op: str
) -> int | None:
    """EXACTLY-ONCE append keyed by `op` — the streaming-sink commit
    protocol (a batch id rides in `op`, so a replayed foreachBatch
    sees its id already committed and skips; no sink-side dedup
    state). Returns the committed version, or None when this op was
    already durable.

    Race behavior, pinned by tests/test_properties.py: losing the
    optimistic version race to a FOREIGN commit rebases onto the new
    head and retries — another writer's commit never silently drops
    this batch; losing it to a retry of THIS op (its id now in the
    log) reclaims our just-written files as orphans and skips. The
    op-dedup check runs at the TOP of every retry iteration (not only
    in the conflict handler), so a concurrent duplicate that commits
    between our head read and link is caught on the next pass.

    Residual window: if two writers carry the SAME op concurrently,
    one can pass the loop-top check, compute head+1, and link before
    the other's commit becomes visible to it — check-then-link cannot
    be fully closed without a log-wide lock. True exactly-once
    therefore assumes at most ONE in-flight writer per op id (the
    foreachBatch contract: one query instance replays a batch id
    sequentially, never two live instances of the same batch)."""
    if op in committed_ops(root):
        return None  # retried batch: its version is already durable
    new_files = _write_data_files(df, root)
    while True:
        # re-check BEFORE picking a target version: a duplicate of
        # this op that committed since the last check must win here,
        # otherwise our os.link lands on a fresh version number with
        # no conflict and the batch is durable twice. committed_ops is
        # incrementally cached, so this is O(commits since last check).
        if op in committed_ops(root):
            for f in new_files:
                if os.path.exists(f):
                    os.unlink(f)
            return None
        try:
            # delta commit: the manifest lists ONLY this batch's
            # files — O(batch), not O(table)
            v = current_version(root) + 1
            _commit(root, v, op, add=new_files)
            return v
        except ConcurrentCommitError:
            continue


def snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """The table AS OF `version` (latest if None) — time travel is
    just resolving an older version's closed file list, minus any
    accumulated deletion vectors (merge-on-read deletes; a no-op
    branch when the table has none)."""
    v = current_version(root) if version is None else version
    return _apply_dvs(
        spark,
        spark.read.parquet(*_resolve_files(root, v)),
        _resolve_dv_files(root, v),
    )


def table_changes(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """CHANGE-DATA-FEED read: the row-level diff between two snapshots
    of a keyed CoW table — (key, change in insert/update/delete,
    old_<col>, new_<col> per non-key column), unchanged keys omitted.
    The inverse of a CDC APPLY (operators-level twin of Delta's
    `table_changes` / CDF): downstream consumers subscribe to the diff
    instead of re-scanning the table.

    The scale property comes from the manifest log, not the data: a
    file present in BOTH versions is immutable, so its rows are
    bit-identical on both sides and can never produce a change row —
    only the manifest-level file DIFFERENCE (added XOR removed between
    the two versions) is scanned. Old rows come from removed files,
    new rows from added files, and ONE full-outer join on the key
    classifies every survivor: old-only = delete, new-only = insert,
    both-with-different-values = update (rows a copy-on-write rewrite
    carried verbatim into a new file join equal and are filtered).
    On a 100 TB table where a day's commits touch 0.1% of files, the
    diff reads 0.2% of the data and the join is keyed on the same
    columns the table is clustered by. Requires both snapshots to
    share the key schema; non-key columns are taken from the newer
    snapshot (add_columns evolution widens old rows with NULLs, which
    null-safe compare treats as a change — the CDF convention)."""
    v_to = current_version(root) if v_to is None else v_to
    for v in range(v_from + 1, v_to + 1):
        m = _read_raw(root, v)
        # a merge-on-read delete — or a restore rewinding the vector
        # set — changes rows WITHOUT changing the file sets this diff
        # compares; silently missing those rows would be wrong, so
        # refuse and point at the feed. Layout rewrites' empty resets
        # are content-identical and stay diffable.
        if m.get("dv") or (
            m.get("dv_reset") is not None
            and not str(m.get("op", "")).startswith("optimize")
        ):
            raise ChangeDataUnavailable(
                f"version {v} changed rows via deletion vectors; the "
                "file-difference diff cannot see MoR changes — use "
                "the CDF feed (cdf=True writers) instead"
            )
    f_from = set(_resolve_files(root, v_from))
    f_to = set(_resolve_files(root, v_to))
    removed = sorted(f_from - f_to)
    added = sorted(f_to - f_from)
    ref = spark.read.parquet(
        *(added or removed or _resolve_files(root, v_to))
    )
    cols = list(ref.columns)
    val_cols = [c for c in cols if c not in key_cols]

    def _scan(files: list[str]) -> DataFrame:
        if files:
            return spark.read.parquet(*files).select(*cols)
        return spark.createDataFrame([], ref.schema).select(*cols)

    # presence markers, not key-null checks: a legitimately-NULL key
    # value must not misclassify its row (eqNullSafe matches NULLs)
    old = _scan(removed).select(
        *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(1).alias("__in_old"),
    )
    new = _scan(added).select(
        *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(1).alias("__in_new"),
    )
    on = None
    for k in key_cols:
        cond = old[f"__o_{k}"].eqNullSafe(new[f"__n_{k}"])
        on = cond if on is None else (on & cond)
    joined = old.join(new, on, "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    differs = F.lit(False)
    for c in val_cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(
            F.col(f"__n_{c}")
        )
    out_keys = [
        F.coalesce(F.col(f"__o_{k}"), F.col(f"__n_{k}")).alias(k)
        for k in key_cols
    ]
    out_vals = [
        e
        for c in val_cols
        for e in (
            F.col(f"__o_{c}").alias(f"old_{c}"),
            F.col(f"__n_{c}").alias(f"new_{c}"),
        )
    ]
    return (
        joined.withColumn("change", change)
        .filter((F.col("change") != "update") | differs)
        .select(*out_keys, F.col("change"), *out_vals)
    )


def _change_dir(root: str, version: int) -> str:
    """Per-commit-ATTEMPT materialized change-data directory (the
    design of Delta's `_change_data` folder): rows describing what
    commit `version` did, written BY the commit, so CDF reads are pure
    file scans with no read-time join. The uuid suffix makes the dir
    per-attempt: under the optimistic-concurrency protocol two racers
    can both target version N — a fixed vN dir would let the loser's
    rmtree-and-rewrite destroy files the eventual winner's committed
    manifest references (same reason _write_data_files uses a fresh
    uuid subdir per write). Orphans from lost attempts are
    garbage-collected by vacuum's referenced-by-no-surviving-manifest
    sweep."""
    return os.path.join(root, "_change_data", f"v{version}-{uuid.uuid4().hex}")


def _write_change_files(df: DataFrame, root: str, version: int) -> list[str]:
    """Persist change rows for `version` as immutable parquet under
    _change_data/ (outside data/, so they are never part of any
    snapshot) and return their paths. Never overwrites: each attempt
    gets a fresh uuid dir."""
    sub = _change_dir(root, version)
    df.write.mode("error").parquet(sub)
    return [
        os.path.join(sub, f)
        for f in os.listdir(sub)
        if f.endswith(".parquet")
    ]


class ChangeDataUnavailable(RuntimeError):
    """A commit in the requested CDF range rewrote files without
    materializing change data (cdf=False) — same contract as Delta's
    'change data was not recorded' error. Point-to-point diffs are
    still available via the join-based table_changes()."""


def change_inventory(
    root: str, v_from: int, v_to: int | None = None
) -> list[tuple[str, str | None, int]]:
    """Driver-side (metadata-only) plan of a CDF read over versions
    (v_from, v_to]: one (file, derived_change_type, version) task per
    change file. Commits that only ADD files (init/append/ingest) need
    no materialized change data — their added data files ARE the
    insert rows, tagged at read time (Delta's exact optimization):
    added rows genuinely appear, whatever the op name — so an
    add-only restore reads as inserts too. ANY commit that removed
    files (delete, merge, optimize, a typical restore) must have been
    written with cdf=True, else ChangeDataUnavailable — never a
    silently wrong feed. Layout-only commits (optimize /
    optimize_zorder) record an EMPTY change set (cdc=[]): content-
    identical rewrites have no row-level delta, so the feed skips
    them instead of erroring — Delta's OPTIMIZE-emits-no-events rule. Cost: O(log entries) driver
    metadata; every yielded task is an independent file scan — the
    whole feed is embarrassingly parallel with NO read-time join."""
    v_to = current_version(root) if v_to is None else v_to
    out: list[tuple[str, str | None, int]] = []
    for v in range(v_from + 1, v_to + 1):
        m = _read_raw(root, v)
        cdc = m.get("cdc")
        if cdc is not None:
            out += [(f, None, v) for f in sorted(cdc)]
        elif (
            not m.get("remove")
            and not m.get("dv")
            and m.get("dv_reset") is None
            and "files" not in m
        ):
            out += [(f, "insert", v) for f in sorted(m.get("add", ()))]
        else:
            # removed files OR deletion vectors: rows changed in a way
            # the added files alone cannot describe
            raise ChangeDataUnavailable(
                f"version {v} ({m.get('op')}) changed rows without "
                "materialized change data; re-run the writer with "
                "cdf=True or use table_changes() for a join-based diff"
            )
    return out


def changes_since(root: str, v_from: int) -> tuple[int, int]:
    """(head version, number of change files after v_from) — the
    metadata poll a CDF subscriber runs per micro-batch."""
    head = current_version(root)
    return head, len(change_inventory(root, v_from, head))


# ------------------------------------------- deletion vectors (MoR)
#
# Merge-on-read DELETE: instead of rewriting every touched file
# (copy-on-write), the commit records the deleted rows' POSITIONS —
# (file, row_index) pairs, the public design of Iceberg v2 positional
# delete files and Delta deletion vectors — and readers subtract them
# with one broadcast anti-join. Write cost collapses from O(touched
# files' rows) to O(deleted positions); the read pays the anti-join
# until OPTIMIZE materializes the vectors into compacted files (after
# which the old vectors reference removed files and become inert).


class DeletionVectorsPending(RuntimeError):
    """A copy-on-write rewrite (delete_where / merge_upsert / clone)
    was asked to run against files that live deletion vectors still
    target: the raw rewrite would copy vector-hidden rows into fresh
    files, resurrecting them. Run optimize() first to materialize the
    vectors."""


def _dv_dir(root: str, version: int) -> str:
    # per-attempt uuid dir, same rationale as _change_dir: a racing
    # loser must never clobber files the winner's manifest references
    return os.path.join(root, "_deletes", f"v{version}-{uuid.uuid4().hex}")


def _write_dv_files(df: DataFrame, root: str, version: int) -> list[str]:
    sub = _dv_dir(root, version)
    df.write.mode("error").parquet(sub)
    return [
        os.path.join(sub, f)
        for f in os.listdir(sub)
        if f.endswith(".parquet")
    ]


def _resolve_dv_files(root: str, version: int) -> list[str]:
    """Accumulated deletion-vector files visible at `version`: walk
    back to the nearest checkpoint (its optional 'dvs' key carries the
    union — which is also what keeps MoR deletes durable across
    vacuum: the cutoff checkpoint is written before old manifests
    drop), then union the 'dv' keys of the newer delta manifests.
    Vectors are add-only; ones targeting since-removed files are
    inert, not invalid (the anti-join simply never matches them)."""
    dvs: set[str] = set()
    deltas: list[dict] = []
    v = version
    while True:
        if v < 0:
            return sorted(dvs)
        cp = _checkpoint_path(root, v)
        if os.path.exists(cp):
            with open(cp) as f:
                dvs = set(json.load(f).get("dvs", []))
            break
        m = _read_raw(root, v)
        deltas.append(m)
        if "files" in m:  # legacy full manifest predates DV support
            break
        if "dv_reset" in m:  # replacement point: nothing older matters
            break
        if v == 0:
            break
        v -= 1
    for m in reversed(deltas):  # oldest first: resets must apply in order
        if "dv_reset" in m:
            dvs = set(m["dv_reset"])
        dvs.update(m.get("dv", ()))
    return sorted(dvs)


def _dv_row_count(dvs: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in dvs)


#: above this many positions the anti-join side is left un-hinted so
#: AQE can pick a shuffle join instead of an oversized broadcast
DV_BROADCAST_MAX_ROWS = 5_000_000


def _apply_dvs(spark: SparkSession, df: DataFrame, dvs: list[str]) -> DataFrame:
    """Subtract deletion vectors from a RAW file scan (df must be the
    scan itself so the _metadata pseudo-column binds): one anti-join
    on (file, position). Vectors are bounded by deleted-not-yet-
    compacted rows, so the delete side broadcasts below
    DV_BROADCAST_MAX_ROWS (a production format would pack them as
    roaring bitmaps; the parquet pair relation keeps the oracle
    compare and the join shape identical)."""
    if not dvs:
        return df
    dv = spark.read.parquet(*dvs).select("_dv_file", "_dv_pos")
    if _dv_row_count(dvs) <= DV_BROADCAST_MAX_ROWS:
        dv = F.broadcast(dv)
    stamped = df.select(
        F.col("_metadata.file_path").alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_pos"),
        "*",
    )
    return stamped.join(dv, ["_dv_file", "_dv_pos"], "left_anti").drop(
        "_dv_file", "_dv_pos"
    )


def _live_dv_targets(root: str, version: int | None = None) -> set[str]:
    """Data files of `version` that some deletion vector still
    targets (plain paths). Metadata-cheap: one footer-column read per
    vector file."""
    v = current_version(root) if version is None else version
    dvs = _resolve_dv_files(root, v)
    if not dvs:
        return set()
    import pyarrow.parquet as pq

    # _manifest_form realpath-normalizes BOTH sides (same rule as
    # vacuum's containment check): _metadata.file_path is always an
    # absolute URI, but manifests store paths as the table root was
    # given — a relative root would otherwise make the intersection
    # empty, silently disabling the DeletionVectorsPending interlock
    # and letting a CoW rewrite resurrect vector-hidden rows.
    targets: set[str] = set()
    for f in dvs:
        targets.update(
            str(p)
            for p in pq.read_table(f, columns=["_dv_file"]).column(0)
        )
    # intersection mode: a vector targeting a since-removed file is
    # inert on the read path, so it must not trip the DV-pending
    # interlock either (ADVICE r10 — contract reconciled with the
    # _resolve_dv_files docstring)
    return _manifest_form(targets, _resolve_files(root, v), strict=False)


def delete_where_mor(
    spark: SparkSession, root: str, cond, cdf: bool = False
) -> int:
    """ACID DELETE via MERGE-ON-READ deletion vectors: no data file is
    rewritten — the commit stores the matching rows' (file, row_index)
    positions under _deletes/ and readers subtract them. Write cost is
    O(matching positions) regardless of how many files they live in,
    the trade Iceberg v2 positional deletes / Delta deletion vectors
    make for delete-heavy workloads; reads pay one anti-join until
    optimize() materializes the vectors. Positions already covered by
    earlier vectors are not re-recorded (idempotent under re-matching
    predicates). cdf=True also materializes the deleted rows as
    change data, so the CDF feed sees MoR deletes exactly like CoW
    ones. Returns the committed version."""
    base = current_version(root)
    files = _resolve_files(root, base)
    scan = spark.read.parquet(*files).select(
        F.col("_metadata.file_path").alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_pos"),
        "*",
    )
    prior = _resolve_dv_files(root, base)
    live = scan
    if prior:
        pr = spark.read.parquet(*prior).select("_dv_file", "_dv_pos")
        if _dv_row_count(prior) <= DV_BROADCAST_MAX_ROWS:
            pr = F.broadcast(pr)
        live = scan.join(pr, ["_dv_file", "_dv_pos"], "left_anti")
    hits = live.filter(F.coalesce(cond, F.lit(False)))
    dv_files = _write_dv_files(
        hits.select("_dv_file", "_dv_pos"), root, base + 1
    )
    change_files: list[str] = []
    if cdf:
        deleted = hits.drop("_dv_file", "_dv_pos").withColumn(
            "_change_type", F.lit("delete")
        )
        change_files = _write_change_files(deleted, root, base + 1)
    _commit(
        root,
        base + 1,
        "delete-mor",
        dv=dv_files,
        cdc=change_files if cdf else None,
    )
    return base + 1


def merge_upsert_mor(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_cols: list[str],
    cdf: bool = False,
) -> int:
    """ACID MERGE (upsert) via MERGE-ON-READ: matched target rows are
    deletion-vectored by position and ALL update rows append as new
    files — no existing file is ever rewritten. Write cost is
    O(updates + matched positions), the Iceberg v2 MoR MERGE trade
    (copy-on-write merge_upsert pays O(touched files' rows) instead);
    reads pay the same position anti-join as delete_where_mor until
    optimize() compacts. Enforces the one-source-row-per-key MERGE
    contract. cdf=True materializes update_preimage / update_postimage
    / insert change rows so the CDF feed sees the merge exactly like
    the CoW path's. Returns the committed version."""
    base = current_version(root)
    files = _resolve_files(root, base)
    keys = updates.select(*key_cols).distinct()
    n_updates, n_keys = updates.count(), keys.count()
    if n_updates != n_keys:
        raise ValueError(
            f"merge_upsert_mor: updates contain {n_updates - n_keys} "
            f"duplicate rows for {key_cols}; pre-deduplicate on the "
            "merge key (one source row per target key, as SQL MERGE "
            "requires)"
        )
    scan = spark.read.parquet(*files).select(
        F.col("_metadata.file_path").alias("_dv_file"),
        F.col("_metadata.row_index").alias("_dv_pos"),
        "*",
    )
    prior = _resolve_dv_files(root, base)
    live = scan
    if prior:
        pr = spark.read.parquet(*prior).select("_dv_file", "_dv_pos")
        if _dv_row_count(prior) <= DV_BROADCAST_MAX_ROWS:
            pr = F.broadcast(pr)
        live = scan.join(pr, ["_dv_file", "_dv_pos"], "left_anti")
    # matched old rows: still-live rows whose key is in the update set
    matched = live.join(F.broadcast(keys), key_cols, "left_semi")
    dv_files = _write_dv_files(
        matched.select("_dv_file", "_dv_pos"), root, base + 1
    )
    new_files = _write_data_files(updates, root)
    change_files: list[str] = []
    if cdf:
        old_keys = matched.select(*key_cols).distinct()
        pre = matched.drop("_dv_file", "_dv_pos").withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = updates.join(old_keys, key_cols, "left_semi").withColumn(
            "_change_type", F.lit("update_postimage")
        )
        ins = updates.join(old_keys, key_cols, "left_anti").withColumn(
            "_change_type", F.lit("insert")
        )
        change_files = _write_change_files(
            pre.unionByName(post).unionByName(ins), root, base + 1
        )
    _commit(
        root,
        base + 1,
        "merge-mor",
        add=new_files,
        dv=dv_files,
        cdc=change_files if cdf else None,
    )
    return base + 1


def table_history(spark: SparkSession, root: str) -> DataFrame:
    """DESCRIBE HISTORY as a relation (Delta's public command): one
    row per commit from the surviving log — version, op, and what the
    commit carried (adds / removes / materialized change data /
    deletion vectors, as booleans plus file counts). Metadata-only:
    the driver reads O(log entries) JSON manifests and never touches
    a data file — the audit read every lakehouse ships."""
    first_v = _earliest_version(root)
    head = current_version(root)
    rows = []
    for v in range(first_v, head + 1):
        m = _read_raw(root, v)
        legacy = m.get("files")
        add = m.get("add", legacy or ())
        rows.append(
            (
                v,
                str(m.get("op", "")),
                len(add),
                len(m.get("remove", ())),
                bool(add),
                bool(m.get("remove")),
                m.get("cdc") is not None,
                bool(m.get("dv")),
            )
        )
    return spark.createDataFrame(
        rows,
        "version bigint, op string, n_added int, n_removed int, "
        "has_adds boolean, has_removes boolean, has_cdc boolean, "
        "has_dv boolean",
    )


def delete_where(spark: SparkSession, root: str, cond, cdf: bool = False) -> int:
    """ACID DELETE via file-level copy-on-write: only files that
    contain at least one matching row are rewritten (without their
    matching rows); every other file carries over into the new
    manifest untouched. Returns the committed version.

    cdf=True additionally materializes the deleted rows (plus a
    `_change_type='delete'` column) under _change_data/ and records
    them in the manifest — write-time CDC. The change scan reads the
    SAME affected files the rewrite already reads (one extra filtered
    pass over O(touched files), never the table), and downstream CDF
    reads become pure parallel file scans with no join at all."""
    base = current_version(root)
    if _live_dv_targets(root, base):
        raise DeletionVectorsPending(
            "copy-on-write DELETE on a table with live deletion "
            "vectors; run optimize() first to materialize them"
        )
    files = _resolve_files(root, base)
    snap = spark.read.parquet(*files)
    # one filtered scan finds the affected files; the predicate pushes
    # into the parquet scan, so unaffected files are mostly skipped by
    # row-group stats before they are even read
    affected = _manifest_form(
        (
            r["f"]
            for r in snap.filter(cond)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        ),
        files,
    )
    new_files: list[str] = []
    if affected:
        # DELETE removes rows where cond is TRUE only; under three-
        # valued logic ~NULL is NULL (filtered out), which would
        # silently drop NULL-predicate rows from rewritten files while
        # identical rows in untouched files survive — data loss that
        # depends on file co-location. coalesce pins NULL -> keep.
        rewritten = spark.read.parquet(*sorted(affected)).filter(
            ~F.coalesce(cond, F.lit(False))
        )
        new_files = _write_data_files(rewritten, root)
    change_files: list[str] = []
    if cdf and affected:
        deleted = (
            spark.read.parquet(*sorted(affected))
            .filter(F.coalesce(cond, F.lit(False)))
            .withColumn("_change_type", F.lit("delete"))
        )
        change_files = _write_change_files(deleted, root, base + 1)
    # delta commit: untouched files carry over implicitly — the
    # manifest write is O(affected files), not O(table files)
    _commit(
        root,
        base + 1,
        "delete",
        add=new_files,
        remove=sorted(affected),
        cdc=change_files if cdf else None,
    )
    return base + 1


def vacuum(
    root: str,
    keep_versions: int = 1,
    _max_rescans: int = 8,
    orphan_retention_s: float = 7 * 24 * 3600,
) -> int:
    """Physically remove data files referenced ONLY by manifests older
    than the newest `keep_versions` (and those manifests). Returns the
    number of files removed. The destructive companion op every CoW
    format needs — separated from delete_where so time travel works
    until the user explicitly gives it up.

    Also reclaims ORPHANS: data files under data/ referenced by NO
    surviving manifest at all — the debris of (a) a writer killed
    after its data-file write but before its manifest link landed
    (the commit point), and (b) commit-race losers, whose rewrite
    files were abandoned when ConcurrentCommitError sent them back to
    retry from the new head. Neither kind is reachable through the
    log, so the reference-counted dropped-minus-live pass can never
    see them. Delta's VACUUM rule applies: an unreferenced file is
    deleted only once it is older than `orphan_retention_s` (default
    7 days) — an IN-FLIGHT healthy writer also has data files on disk
    with no manifest yet, and the age gate is what keeps a concurrent
    vacuum from destroying its commit-in-progress. Stale `.tmp-*`
    droppings in _log (a killed writer's unlinked manifest/checkpoint
    temps) are swept under the same age gate. Tests pass
    orphan_retention_s=0 after quiescing writers.

    Writer coordination: the live set comes from a point-in-time log
    scan, so a writer committing DURING the scan (including a
    `restore()` to an old version, which re-adds that version's files
    to the head) could reference a file this pass is about to unlink.
    Two guards close the race: (a) after computing the live set the
    head is re-read, and if new versions appeared the scan restarts
    against the new head (up to `_max_rescans` times, then raises);
    (b) `restore()` refuses targets below the last vacuum cutoff — a
    restore that wins the re-scan race still cannot resurrect dropped
    manifests. Concurrent vacuum+vacuum remains single-maintainer
    (unlink is idempotent here, but run one at a time)."""
    for _ in range(_max_rescans):
        latest = current_version(root)
        # a caller asking to keep more history than exists is a no-op,
        # not a crash: clamp so the live-file loop never sees a
        # negative version
        cutoff = max(latest - keep_versions + 1, 0)
        # single forward replay from the earliest surviving version (a
        # prior vacuum left it checkpointed): accumulate the union of
        # files referenced by dropped versions vs kept versions —
        # O(total delta entries), never versions x files
        first_v = _earliest_version(root)
        files = set(_resolve_files(root, first_v))
        dropped: set[str] = set()
        live: set[str] = set()
        dropped_ops: set[str] = set()
        for v in range(first_v, latest + 1):
            if v > first_v:
                m = _read_raw(root, v)
                if "files" in m:  # legacy full manifest
                    files = set(m["files"])
                else:
                    files.difference_update(m["remove"])
                    files.update(m["add"])
            if v < cutoff:
                dropped |= files
                # this manifest is about to be unlinked: preserve its
                # op tag so exactly-once dedup history survives
                dropped_ops.add(_read_raw(root, v)["op"])
            else:
                live |= files
        # durably record the cutoff BEFORE the head re-check (guard
        # (b)): a restore() racing this pass either commits before the
        # re-check — the head moved, we rescan — or commits after it,
        # by which point the marker is already visible and restore
        # refuses pre-cutoff targets. Recording it earlier than the
        # decision to proceed is safe: the marker is monotone and only
        # ever CONSERVATIVE (it refuses restores, never allows one).
        if cutoff > first_v:
            _record_vacuum_cutoff(root, cutoff)
        # re-read the head AFTER the scan: if a writer committed while
        # we replayed the log, the live set may be stale — rescan
        if current_version(root) == latest:
            break
    else:
        raise ConcurrentCommitError(
            "vacuum: table head kept moving across "
            f"{_max_rescans} rescans; retry when writers quiesce"
        )
    # the cutoff version must stay resolvable once older manifests are
    # gone: checkpoint it before deleting anything, and persist the
    # dropped manifests' op tags before their files go (committed_ops
    # reads this sidecar so append_idempotent's dedup never forgets)
    if cutoff > first_v:
        write_checkpoint(root, cutoff)
        if dropped_ops:
            _record_vacuumed_ops(root, dropped_ops)
    removed = 0
    # table-root containment (Delta's rule: VACUUM only ever deletes
    # files under the table directory): a shallow clone's manifests
    # reference the SOURCE table's absolute paths, so an uncontained
    # unlink here would let delete/merge-then-vacuum on the CLONE
    # physically destroy source-owned data files. Foreign files simply
    # drop out of the clone's manifests; their lifecycle belongs to
    # the table that owns them.
    # realpath (not abspath) on BOTH sides: a table opened via a
    # symlinked root stores manifest paths under the symlink while the
    # data dir resolves elsewhere (or vice versa) — abspath comparison
    # would then skip unlinking the table's OWN dead files, a silent
    # storage leak with `removed` undercounting
    own_data = os.path.realpath(_data_dir(root)) + os.sep
    for f in sorted(dropped - live):
        if not os.path.realpath(f).startswith(own_data):
            continue
        if os.path.exists(f):
            os.unlink(f)
            removed += 1
    for v in range(first_v, cutoff):
        for path in (_manifest_path(root, v), _checkpoint_path(root, v)):
            if os.path.exists(path):
                os.unlink(path)
    # Orphan reclaim (crash / lost-race debris): any parquet under
    # data/ that no SURVIVING manifest references and that is older
    # than the retention gate. `live` is exactly the union of the
    # kept versions' resolved file sets (computed in the replay
    # above), so after the dropped-file unlinks everything legitimate
    # on disk is in it; what is not is either an in-flight commit's
    # fresh write (protected by age) or debris. The age gate is
    # mtime-based, same as Delta VACUUM's retention check.
    now = time.time()
    live_real = {os.path.realpath(f) for f in live}
    ddir = _data_dir(root)
    if os.path.isdir(ddir):
        for sub in sorted(os.listdir(ddir)):
            subp = os.path.join(ddir, sub)
            if not os.path.isdir(subp):
                continue
            for fn in sorted(os.listdir(subp)):
                if not fn.endswith(".parquet"):
                    continue
                p = os.path.join(subp, fn)
                if os.path.realpath(p) in live_real:
                    continue
                try:
                    if now - os.path.getmtime(p) < orphan_retention_s:
                        continue
                    os.unlink(p)
                    removed += 1
                except FileNotFoundError:
                    pass  # a concurrent maintainer got there first
    # a killed writer's manifest/checkpoint temp never reached its
    # `finally: os.unlink` — sweep aged .tmp-* droppings from _log
    log = _log_dir(root)
    if os.path.isdir(log):
        for fn in sorted(os.listdir(log)):
            if not fn.startswith(".tmp-"):
                continue
            p = os.path.join(log, fn)
            try:
                if now - os.path.getmtime(p) >= orphan_retention_s:
                    os.unlink(p)
            except FileNotFoundError:
                pass
    # Garbage-collect _change_data and _deletes by the same
    # dropped-minus-live pattern as data files: a dir survives iff a
    # surviving manifest (cdc/dv key) or a surviving version's resolved
    # DV set still references one of its files. This reclaims (a)
    # dropped versions' change data — CDF history shares time travel's
    # retention window (Delta's rule), (b) DV files a dv_reset
    # (optimize/restore) orphaned once no surviving version resolves
    # them, and (c) per-attempt uuid dirs abandoned by lost commit
    # races. Dirs whose encoded version exceeds the head observed at
    # scan time are kept — they may belong to an in-flight commit
    # racing this vacuum (the winner's manifest lands after our scan).
    # Always under this table's own root, so no containment question
    # arises.
    live_aux: set[str] = set()
    # One backward resolution at the cutoff, then a SINGLE forward
    # replay across cutoff..latest maintaining the running DV set
    # (dv_reset truncates, dv appends — the same transition
    # _resolve_dv_files applies), unioning each version's resolved
    # set. Per-version _resolve_dv_files calls here were
    # O(kept_versions * log length) driver-side JSON reads (ADVICE
    # r9); this is O(log length), matching the data-file loop above.
    dvs_running = set(_resolve_dv_files(root, cutoff))
    live_aux.update(dvs_running)
    live_aux.update(_read_raw(root, cutoff).get("cdc") or ())
    for v in range(cutoff + 1, latest + 1):
        m = _read_raw(root, v)
        live_aux.update(m.get("cdc") or ())
        if "files" in m:  # legacy full manifest predates DV support
            dvs_running = set()
        if "dv_reset" in m:
            dvs_running = set(m["dv_reset"])
        dvs_running.update(m.get("dv", ()))
        live_aux.update(dvs_running)
    live_aux = {os.path.realpath(p) for p in live_aux}
    for aux_name in ("_change_data", "_deletes"):
        adir = os.path.join(root, aux_name)
        if not os.path.isdir(adir):
            continue
        for sub in sorted(os.listdir(adir)):
            p = os.path.join(adir, sub)
            if not os.path.isdir(p) or not sub.startswith("v"):
                continue
            v_str = sub[1:].split("-", 1)[0]
            if v_str.isdigit() and int(v_str) > latest:
                continue
            referenced = any(
                os.path.realpath(os.path.join(p, f)) in live_aux
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
            if not referenced:
                shutil.rmtree(p, ignore_errors=True)
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
    cdf: bool = False,
) -> int:
    """ACID MERGE (upsert) via the same file-level copy-on-write as
    delete_where: files containing a matched key are rewritten with
    those rows replaced by their update; unmatched update rows append
    as new files; untouched files carry over by reference. The matched-
    file probe is one semi-join keyed scan (update keys are typically
    tiny vs the table, so AQE broadcasts them), and the rewrite reads
    ONLY affected files — O(touched files + updates), never O(table).
    Returns the committed version.

    cdf=True materializes write-time change data under _change_data/:
    matched old rows as `update_preimage`, their replacement update
    rows as `update_postimage`, unmatched update rows as `insert` —
    Delta's exact CDF row vocabulary. The split reuses relations the
    merge already computes (affected-file rows + the updates), so the
    extra cost is O(touched files + updates); CDF reads then never
    join at all."""
    base = current_version(root)
    if _live_dv_targets(root, base):
        raise DeletionVectorsPending(
            "copy-on-write MERGE on a table with live deletion "
            "vectors; run optimize() first to materialize them"
        )
    base_files = _resolve_files(root, base)
    snap = spark.read.parquet(*base_files)
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
    affected = _manifest_form(
        (
            r["__f"]
            for r in stamped.join(keys, key_cols, "left_semi")
            .select("__f")
            .distinct()
            .collect()
        ),
        base_files,
    )
    new_files: list[str] = []
    if affected:
        old_rows = spark.read.parquet(*sorted(affected))
        survivors = old_rows.join(keys, key_cols, "left_anti")
        new_files += _write_data_files(survivors, root)
    # matched updates replace their old rows; unmatched updates insert
    new_files += _write_data_files(updates, root)
    change_files: list[str] = []
    if cdf:
        if affected:
            old_rows = spark.read.parquet(*sorted(affected))
            old_keys = old_rows.select(*key_cols).distinct()
            pre = old_rows.join(keys, key_cols, "left_semi").withColumn(
                "_change_type", F.lit("update_preimage")
            )
            post = updates.join(
                old_keys, key_cols, "left_semi"
            ).withColumn("_change_type", F.lit("update_postimage"))
            ins = updates.join(
                old_keys, key_cols, "left_anti"
            ).withColumn("_change_type", F.lit("insert"))
            changes = pre.unionByName(post).unionByName(ins)
        else:
            changes = updates.withColumn("_change_type", F.lit("insert"))
        change_files = _write_change_files(changes, root, base + 1)
    # delta commit: O(touched files + updates) metadata, not O(table)
    _commit(
        root,
        base + 1,
        "merge",
        add=new_files,
        remove=sorted(affected),
        cdc=change_files if cdf else None,
    )
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
    old_files = _resolve_files(root, base)
    # DV-aware read: compaction MATERIALIZES merge-on-read deletes —
    # vector-hidden rows never enter the compacted files, after which
    # the old vectors target only removed files and are inert
    snap = _apply_dvs(
        spark,
        spark.read.parquet(*old_files),
        _resolve_dv_files(root, base),
    )
    files = _write_data_files(snap.repartition(target_files), root)
    # layout-only: content-identical rewrites have no row-level delta,
    # so the commit records an EMPTY change set (cdc=[]) — a CDF feed
    # skips it instead of erroring (Delta: OPTIMIZE emits no events)
    _commit(
        root,
        base + 1,
        "optimize",
        add=files,
        remove=old_files,
        cdc=[],
        # every old file is gone, so every vector is inert: empty the
        # set so readers skip the anti-join branch entirely (recorded
        # only when there was anything to empty)
        dv_reset=[] if _resolve_dv_files(root, base) else None,
    )
    return base + 1


def zorder_key(cols: list[str], bits: int = 8):
    """Z-ORDER (Morton) key of `cols` as a Column over `df` — the
    multi-dimensional clustering kernel behind Delta's OPTIMIZE
    ZORDER BY: each column min/max-normalizes to a `bits`-bit bucket
    (integer-exact: ((x - mn) * 2^bits) div (mx - mn + 1), all
    int64), and the buckets' bits INTERLEAVE (col k contributes bit i
    to z-bit i*n_cols + k), so nearby z-values are nearby in EVERY
    dimension at once. Sorting a table by z and cutting it into
    range-contiguous files gives each file a tight min/max envelope
    on ALL the clustered columns — the property that lets per-file
    stats skipping (snapshot_pruned) prune range queries on any of
    them, where a single-column sort serves only its own column. The
    min/max normalization needs one tiny aggregate; pass its 1-row
    relation in by crossJoin before calling (see optimize_zorder) —
    the z expression itself is pure JVM bit arithmetic, reproducible
    in ANSI SQL for the oracle. Returns the Column; caller aliases.
    2 cols x 8 bits = 16-bit z (int64-safe to 4 cols x 15 bits)."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for k, c in enumerate(cols):
            bit = F.shiftright(F.col(f"_zb_{c}"), i).bitwiseAND(
                F.lit(1)
            )
            z = z + F.shiftleft(bit, i * n + k)
    return z


def optimize_zorder(
    spark: SparkSession,
    root: str,
    cols: list[str],
    target_files: int = 8,
    bits: int = 8,
) -> int:
    """OPTIMIZE ZORDER BY: rewrite the current snapshot clustered on
    the interleaved z-key of `cols` and re-commit with fresh per-file
    min/max stats on those columns — content-identical, layout-only,
    through the same manifest protocol as optimize(). After it, a
    range predicate on ANY clustered column prunes files via
    snapshot_pruned (~sqrt locality per dimension for 2 columns),
    where a plain range-partitioned layout prunes only its sort
    column — at 100 TB this is the difference between opening
    O(matching) and O(all) files for the second dimension
    (property-tested: tests/test_properties.py). One pass: a 1-row
    min/max aggregate broadcasts onto the scan, rows range-partition
    by z (contiguous z-interval per output file) and sort within
    partitions, and the rewrite commits as remove(old)+add(new).
    Returns the committed version."""
    base = current_version(root)
    old_files = _resolve_files(root, base)
    # DV-aware, like optimize: clustering must not resurrect
    # vector-hidden rows
    snap = _apply_dvs(
        spark,
        spark.read.parquet(*old_files),
        _resolve_dv_files(root, base),
    )
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("long").alias(f"_mn_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"_mx_{c}"))
    mm = snap.agg(*aggs)
    j = snap.crossJoin(F.broadcast(mm))
    for c in cols:
        j = j.withColumn(
            f"_zb_{c}",
            F.expr(
                f"(( (CAST({c} AS BIGINT) - _mn_{c}) * {1 << bits} )"
                f" div (_mx_{c} - _mn_{c} + 1))"
            ),
        )
    j = j.withColumn("_z", zorder_key(cols, bits))
    helper = [f"_mn_{c}" for c in cols] + [f"_mx_{c}" for c in cols] + [
        f"_zb_{c}" for c in cols
    ]
    clustered = (
        j.repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *helper)
    )
    files = _write_data_files(clustered, root)
    stats = _collect_file_stats(spark, files, tuple(cols))
    _commit(
        root,
        base + 1,
        "optimize-zorder",
        add=files,
        remove=old_files,
        stats=stats,
        cdc=[],  # layout-only, like optimize: no row-level delta
        dv_reset=[] if _resolve_dv_files(root, base) else None,
    )
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
    files = _write_data_files(new_df, root)
    # the delta manifest lists ONLY the appended wide files: schema
    # evolution at 100 TB really is a metadata-sized commit here
    _commit(root, base + 1, "add-columns", add=files)
    return base + 1


def restore(spark: SparkSession, root: str, version: int) -> int:
    """RESTORE the table to an earlier version AS A NEW COMMIT
    (Delta's RESTORE TABLE ... VERSION AS OF): the delta manifest
    removes every file the current head references that the target
    doesn't, and re-adds every target file the head dropped — pure
    metadata, no data movement, and the mistaken versions stay in the
    log for audit until vacuum. The inverse of nothing: restoring is
    itself undoable by another restore. Returns the new version.

    Targets below the last vacuum cutoff are refused: their data files
    may already be physically gone (or mid-unlink by a concurrent
    vacuum), so a restore there would commit a snapshot referencing
    deleted data."""
    cut = vacuum_cutoff(root)
    if version < cut:
        raise ValueError(
            f"restore: version {version} is below the vacuum cutoff "
            f"{cut}; its data files may have been physically removed"
        )
    head = current_version(root)
    cur = set(_resolve_files(root, head))
    tgt = set(_resolve_files(root, version))
    # the deletion-vector set rewinds WITH the file set: vectors
    # committed after the target would otherwise keep hiding rows the
    # restored snapshot must show. Recorded only when it actually
    # changes, so DV-free restores stay file-diffable.
    cur_dvs = _resolve_dv_files(root, head)
    tgt_dvs = _resolve_dv_files(root, version)
    _commit(
        root,
        head + 1,
        f"restore-v{version}",
        add=sorted(tgt - cur),
        remove=sorted(cur - tgt),
        dv_reset=tgt_dvs if tgt_dvs != cur_dvs else None,
    )
    return head + 1


def snapshot_merged(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """snapshot() with schema merging across the version's files —
    needed once add_columns has widened the table."""
    v = current_version(root) if version is None else version
    return _apply_dvs(
        spark,
        spark.read.option("mergeSchema", "true").parquet(
            *_resolve_files(root, v)
        ),
        _resolve_dv_files(root, v),
    )


# --------------------------------------------------------------- blooms

BLOOM_BITS = 4096
BLOOM_K = 5


def _bloom_positions(col_expr, bits: int, k: int):
    """k bit positions for one value: xxhash64 under k seeds, pmod to
    the bit-array width. Lives as a Spark expression so the write and
    probe sides share the exact JVM hash (never re-implemented driver-
    side in Python)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col_expr, F.lit(s)), F.lit(bits))
            for s in range(k)
        ]
    )


def collect_file_blooms(
    spark: SparkSession,
    files: list[str],
    cols: tuple,
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> dict:
    """Per-file BLOOM FILTER of `cols` over just-written files — the
    point-lookup complement of _collect_file_stats' min/max: on an
    UNCLUSTERED layout every file's [min, max] spans the whole domain
    and range stats skip nothing, but a per-file bloom still answers
    'is key X definitely absent from this file'. ONE distributed
    aggregate per column at write time: each row explodes to its k
    bit positions map-side, bits OR together grouped on
    (file, word-index), and the driver assembles the sparse word map
    {path: {'bloom:col': {'b': bits, 'k': k,
    'w': {word_idx: int64}}}} — entries ride the manifest's existing
    per-file stats dict, so resolution, vacuum, and old readers need
    no changes (unknown keys are ignored; files without blooms are
    never skipped). Cost is one scan of the committed batch; the
    bitmap is bits/8 bytes per file per column (512 B at the 4096
    default — manifest-weight like Delta's)."""
    out: dict = {}
    for c in cols:
        pos = (
            spark.read.parquet(*files)
            .select(
                F.input_file_name().alias("_f"),
                F.explode(_bloom_positions(F.col(c), bits, k)).alias(
                    "_p"
                ),
            )
        )
        words = (
            pos.select(
                "_f",
                (F.col("_p") / 64).cast("long").alias("_w"),
                F.expr("shiftleft(1L, CAST(_p % 64 AS INT))").alias("_b"),
            )
            .groupBy("_f", "_w")
            .agg(F.bit_or("_b").alias("_m"))
            .collect()
        )
        by_real = {os.path.realpath(f): f for f in files}
        for r in words:
            # same manifest-form keying as _collect_file_stats
            path = by_real.get(
                os.path.realpath(_strip_uri(r["_f"])), _strip_uri(r["_f"])
            )
            ent = out.setdefault(path, {}).setdefault(
                f"bloom:{c}", {"b": bits, "k": k, "w": {}}
            )
            ent["w"][str(r["_w"])] = r["_m"]
    return out


def snapshot_bloom_lookup(
    spark: SparkSession,
    root: str,
    col,
    value,
    version: int | None = None,
):
    """Point-lookup read with BLOOM file skipping: resolve the
    snapshot's files, probe each file's manifest bloom for `value`
    (files without a bloom always read — same safety posture as
    snapshot_pruned), scan only the maybe-present files, and apply
    the exact equality filter. False positives cost one extra file
    scan; false negatives cannot happen because the probe uses the
    IDENTICAL Spark-side xxhash64 expression the write side folded
    into the bitmap (one 1-row JVM job per distinct (bits, k) config,
    never a Python re-implementation of the hash). Returns
    (DataFrame, n_files_read, n_files_total)."""
    v = current_version(root) if version is None else version
    files = _resolve_files(root, v)
    stats = _resolve_stats(root, v)
    key = f"bloom:{col}"
    configs = {
        (e["b"], e["k"])
        for f in files
        for e in [stats.get(f, {}).get(key)]
        if e is not None
    }
    # xxhash64 is TYPE-sensitive (hashing 0 as INT != as BIGINT), so
    # the probe literal must carry the stored column's exact type
    probe_lit = F.lit(value)
    if files:
        dtype = spark.read.parquet(files[0]).schema[col].dataType
        probe_lit = probe_lit.cast(dtype)
    pos_by_cfg = {}
    for bits, k in configs:
        pos_by_cfg[(bits, k)] = (
            spark.range(1)
            .select(_bloom_positions(probe_lit, bits, k).alias("p"))
            .collect()[0]["p"]
        )
    kept = []
    for f in files:
        e = stats.get(f, {}).get(key)
        if e is None:
            kept.append(f)
            continue
        w = e["w"]
        hit = all(
            (int(w.get(str(p // 64), 0)) >> (p % 64)) & 1
            for p in pos_by_cfg[(e["b"], e["k"])]
        )
        if hit:
            kept.append(f)
    dvs = _resolve_dv_files(root, v)
    df = (
        _apply_dvs(spark, spark.read.parquet(*kept), dvs).filter(
            F.col(col) == value
        )
        if kept
        else spark.read.parquet(*files).filter(F.lit(False))
    )
    return df, len(kept), len(files)
