"""Storage layer: the points table as hour-bucket-partitioned Parquet.

Reference write path (engine.zig:317-369, storage/segment.zig:11-57): sort
points by ts, split by UTC hour, write compressed segments + manifest entry.
Spark-first translation:

- ``write_points``: repartition by hour_bucket, sort within partitions by
  (series_id, ts), ``partitionBy("hour_bucket")`` Parquet. Parquet row-group
  min/max stats on (series_id, ts) replace the manifest; the partition
  directory listing replaces manifest pruning.
- ``hour_bucket_bounds``: the ONE rewrite Catalyst cannot do for us (SURVEY
  §4.1): derive hour_bucket partition predicates from ts predicates so a
  time-ranged query prunes partitions instead of scanning all of them.
- ``compact_points`` / ``apply_retention`` / ``drop_expired_partitions``:
  the compaction dedup (compact.zig:36-49, (series_id, ts) last-wins) and
  TTL jobs (retention.zig:4-20) as batch jobs. Partition drops are
  metadata/filesystem operations — no data rewrite.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sydradb_spark.model import SECONDS_PER_HOUR

POINT_COLS = ["series_id", "series", "tags", "ts", "value", "hour_bucket"]


def _write_tasks(spark: SparkSession) -> int:
    """Explicit shuffle width for partitioned writes. ``repartition(col)``
    without a count plans REPARTITION_BY_COL, which AQE re-optimizes through
    extra query stages — measured 3.5x slower than the pinned
    REPARTITION_BY_NUM shuffle for the hour-partitioned write at identical
    file layout (ROUND6_NOTES §10). The count follows the session's shuffle
    sizing, which cluster_conf scales with the data."""
    return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))


def write_points(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    txn: tuple[str, int] | None = None,
) -> None:
    """Hour-partitioned write, ts-sorted within files (reference segment
    writer). One shuffle on hour_bucket; files within a partition are sorted
    so Parquet page stats make ts-range reads skip pages.

    Commits a file manifest (sydradb_spark.manifest) so readers flip between
    consistent versions atomically: overwrite and new-table writes always
    commit; appends extend the table's manifest when it has one. Appending
    to a pre-manifest table keeps plain directory semantics.

    ``txn=(app_id, txn_version)`` makes the append idempotent: a write whose
    txn is already in the manifest's ledger (a replayed streaming batch —
    reference WAL replay-above-highwater guard, engine.zig:406-437) is a
    no-op. The pre-check skips the parquet write entirely on the common
    replay path; the commit itself re-checks inside the CAS loop, so a
    replay that staged files but loses the ledger check leaves only
    unreferenced orphans for ``manifest.vacuum`` — LATEST never sees a
    duplicate row.

    Appends to a MANIFESTED table stage through a PRIVATE
    ``.staging-<uuid>/`` dir and rename the part files into the layout
    before committing (r12): Spark's ``mode("append")`` shares Hadoop's
    ``_temporary/0`` staging across jobs, so two concurrent appenders to
    one table destroy each other's in-flight staging when either commits
    (found by the two-streams-one-table soak test). Private staging makes
    concurrent appends collision-free, gives the commit the EXACT moved
    file list instead of a directory-listing diff, and a crash between the
    renames and the manifest commit leaves only unreferenced orphans —
    same contract as before. Hidden dot-dirs are invisible to Spark's file
    index and to ``manifest.data_files``; crashed staging dirs are
    reclaimed by ``manifest.vacuum``."""
    from sydradb_spark import manifest as mf

    # __ns/__tsr/__ssrc are the events-adapter pushdown hints
    # (tables.normalize_events / events_points) — redundant with ts/series;
    # stored tables prune via hour_bucket, and series is a real stored
    # column so its filters push natively.
    for hint in ("__ns", "__tsr", "__ssrc"):
        if hint in df.columns:
            df = df.drop(hint)
    fresh = not Path(path).exists()
    manifested = mf.has_manifest(path)
    if txn is not None and manifested:
        # the pre-check applies to EVERY mode: in overwrite mode especially,
        # the destructive parquet rewrite would otherwise run before the
        # ledger check, and a replayed txn's commit would no-op while LATEST
        # kept referencing the pre-overwrite files the rewrite just deleted
        last = mf.read_txn(path, txn[0])
        if last is not None and last >= txn[1]:
            return  # replayed batch — this txn is already durable
    shaped = (
        df.select(*POINT_COLS, *[c for c in df.columns if c not in POINT_COLS])
        .repartition(_write_tasks(df.sparkSession), F.col("hour_bucket"))
        .sortWithinPartitions("series_id", "ts")
        .write.partitionBy("hour_bucket")
    )
    if manifested and not fresh:
        moved = _stage_and_publish(shaped, path)
        if mode == "append":
            # an empty batch still commits (txn ledger must record the batch)
            mf.commit(path, mutate=lambda old: old + moved, txn=txn)
        else:
            # overwrite on a LIVE manifested table is a manifest-level flip,
            # NOT a Spark directory truncation (r13 review): static
            # partitionOverwriteMode deletes the whole path — _manifest/,
            # version history, and BOTH apps' txn ledgers included — and
            # readers crash mid-scan on the vanished files. Staging the new
            # files in and committing a full-replacement list keeps readers
            # atomic (old files stay until vacuum) and commit_cas carries
            # the ledger forward.
            mf.commit(path, files=moved, txn=txn)
    else:
        shaped.mode(mode).parquet(path)
        if mode == "overwrite" or fresh:
            mf.commit(path, mf.data_files(path), txn=txn)


def _stage_and_publish(shaped_writer, path: str) -> list[str]:
    """Write through a PRIVATE ``.staging-<uuid>/`` dir and rename the part
    files into the live layout, returning the EXACT moved-file list for the
    manifest commit. This is the only safe append shape under concurrent
    committers (r12 + r13 reviews): Spark's ``mode("append")`` into the
    live path shares Hadoop's ``_temporary/0`` staging across jobs, and a
    before/after ``data_files()`` diff double-commits (or drops) a
    concurrent appender's files. Publication time is stamped on every
    renamed file — rename(2) preserves the staging mtime, which would void
    ``manifest.vacuum``'s age guard for writes longer than the window."""
    import os
    import uuid

    stage = Path(path) / f".staging-{uuid.uuid4().hex}"
    try:
        shaped_writer.mode("overwrite").parquet(str(stage))
        moved: list[str] = []
        for f in sorted(stage.glob("hour_bucket=*/*.parquet")):
            rel = f.relative_to(stage)
            dst = Path(path) / rel
            dst.parent.mkdir(exist_ok=True)
            crc = f.with_name(f".{f.name}.crc")  # local-FS checksum sibling
            if crc.exists():
                crc_dst = dst.with_name(f".{dst.name}.crc")
                crc.rename(crc_dst)
                os.utime(crc_dst)
            f.rename(dst)
            os.utime(dst)
            moved.append(str(rel))
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return moved


def read_points(spark: SparkSession, path: str) -> DataFrame:
    """Read the table's LATEST manifest version (plain directory read for
    pre-manifest tables)."""
    from sydradb_spark import manifest as mf

    if mf.has_manifest(path):
        files = mf.read_files(path)
        if not files:
            from sydradb_spark.model import POINTS_SCHEMA

            return spark.createDataFrame([], POINTS_SCHEMA)
        df = (
            spark.read.option("basePath", path)
            .parquet(*[f"{path}/{f}" for f in files])
        )
    else:
        df = spark.read.parquet(path)
    extra = [c for c in df.columns if c not in POINT_COLS]
    # the partition column comes back as the inferred directory-value type
    return df.select(
        "series_id",
        "series",
        "tags",
        "ts",
        "value",
        F.col("hour_bucket").cast("long").alias("hour_bucket"),
        *extra,
    )


def read_points_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time travel: read a specific committed manifest version (files are
    immutable and retained until ``manifest.vacuum``)."""
    from sydradb_spark import manifest as mf
    from sydradb_spark.model import POINTS_SCHEMA

    files = mf.read_files(path, version=version)
    if not files:
        return spark.createDataFrame([], POINTS_SCHEMA)
    df = spark.read.option("basePath", path).parquet(*[f"{path}/{f}" for f in files])
    extra = [c for c in df.columns if c not in POINT_COLS]
    return df.select(
        *POINT_COLS[:5],
        F.col("hour_bucket").cast("long").alias("hour_bucket"),
        *extra,
    )


def hour_bucket_bounds(ts_min: int | None, ts_max: int | None) -> Column | None:
    """ts bounds → hour_bucket partition predicate (SURVEY §4.1). A point at
    ts lives in partition (ts div 3600)*3600, so ts ∈ [mn, mx] implies
    hour_bucket ∈ [floor(mn), floor(mx)]."""
    conds: list[Column] = []
    if ts_min is not None:
        conds.append(
            F.col("hour_bucket") >= (ts_min // SECONDS_PER_HOUR) * SECONDS_PER_HOUR
        )
    if ts_max is not None:
        conds.append(
            F.col("hour_bucket") <= (ts_max // SECONDS_PER_HOUR) * SECONDS_PER_HOUR
        )
    if not conds:
        return None
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    return pred


def scan_range(
    spark: SparkSession,
    path: str,
    series_id: int | None = None,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Engine.queryRange (engine.zig:376-378): partition pruning via derived
    hour_bucket bounds + row-group skipping via the (series_id, ts) sort."""
    df = read_points(spark, path)
    hb = hour_bucket_bounds(start, end)
    if hb is not None:
        df = df.where(hb)
    if series_id is not None:
        df = df.where(F.col("series_id") == series_id)
    if start is not None:
        df = df.where(F.col("ts") >= start)
    if end is not None:
        df = df.where(F.col("ts") <= end)
    return df


# --- compaction (dedup) -------------------------------------------------------
def compact_points(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """(series_id, ts) last-wins dedup (compact.zig:36-49). ``order_col`` is
    the ingest order (e.g. a WAL sequence); without one, max(value) is the
    documented deterministic tiebreak. Single shuffle on (series_id, ts);
    map-side combine keeps it partial-aggregating."""
    # struct wrapper (r13 review): max_by SKIPS rows whose ordering key is
    # null, so a (series_id, ts) group whose every duplicate has value=null
    # aggregated to a NULL __row — an all-null row with its identity
    # destroyed. struct(null) is a non-null ordering key (null field sorts
    # lowest), so a non-null value still wins and an all-null group keeps
    # one intact row instead of corrupting the table.
    order = F.col(order_col) if order_col else F.struct(F.col("value"))
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy("series_id", "ts")
        .agg(F.max_by(payload, order).alias("__row"))
        .select("__row.*")
    )


def _swap_dir(staged: Path, live: Path) -> None:
    """Replace ``live`` with ``staged`` via rename → rename → remove. The only
    crash window leaves ``live`` momentarily absent with the old data intact
    at ``<live>.old`` (recoverable by hand); the previous remove-then-rename
    order could lose the partition outright. True atomicity needs a table
    format's commit (Delta/Iceberg) — this is the best a bare filesystem
    rename gives."""
    old = live.with_name(live.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    if live.exists():
        live.rename(old)
    staged.rename(live)
    shutil.rmtree(old, ignore_errors=True)


def compact_storage(spark: SparkSession, path: str, order_col: str | None = None) -> None:
    """Rewrite the stored table deduped (the reference's segment-merge job).
    The staged table's manifest gets the live table's txn ledger BEFORE the
    swap, so a streaming batch whose checkpoint commit is still pending
    cannot re-append after compaction (replay guard survives rewrites)."""
    from sydradb_spark import manifest as mf

    compacted = compact_points(read_points(spark, path), order_col)
    tmp = path.rstrip("/") + ".compact.tmp"
    write_points(compacted, tmp, mode="overwrite")
    mf.carry_ledger(path, tmp)
    _swap_dir(Path(tmp), Path(path))


# --- retention (TTL) ----------------------------------------------------------
def retention_keep_predicate(
    now_epoch: int, ttl_days: dict[str, int], default_days: int | None = None
) -> Column:
    """Per-namespace TTL (config.zig:101-105; retention.zig:4-20): a point
    expires when now - (hour_bucket + 3600) > ttl. Namespace = series text
    before the first '.'."""
    ns = F.split(F.col("series"), r"\.").getItem(0)
    age = F.lit(now_epoch) - (F.col("hour_bucket") + SECONDS_PER_HOUR)
    keep = (
        F.lit(True)
        if default_days is None
        else age <= default_days * 86400
    )
    for namespace, days in ttl_days.items():
        keep = F.when(ns == namespace, age <= days * 86400).otherwise(keep)
    return keep


def apply_retention(
    df: DataFrame,
    now_epoch: int,
    ttl_days: dict[str, int],
    default_days: int | None = None,
) -> DataFrame:
    return df.where(retention_keep_predicate(now_epoch, ttl_days, default_days))


def drop_expired_partitions(path: str, cutoff_hour_bucket: int) -> list[int]:
    """Global-TTL fast path: drop hour_bucket=N partitions with
    N + 3600 <= cutoff. Pure metadata — no data read/rewritten, which is
    what makes retention O(partitions) instead of O(rows) at 100 TB.
    Manifest tables commit a filtered file list (one atomic pointer flip;
    physical files go with ``manifest.vacuum``); plain tables remove the
    directories. Returns the dropped bucket values."""
    from sydradb_spark import manifest as mf

    def _expired(bucket: int) -> bool:
        return bucket + SECONDS_PER_HOUR <= cutoff_hour_bucket

    if mf.has_manifest(path):
        files = mf.read_files(path)
        dropped = sorted(
            {
                int(f.split("=", 1)[1].split("/", 1)[0])
                for f in files
                if _expired(int(f.split("=", 1)[1].split("/", 1)[0]))
            }
        )
        if dropped:
            mf.commit(
                path,
                mutate=lambda old: [
                    f
                    for f in old
                    if not _expired(int(f.split("=", 1)[1].split("/", 1)[0]))
                ],
            )
        return dropped

    dropped = []
    root = Path(path)
    for d in root.glob("hour_bucket=*"):
        bucket = int(d.name.split("=", 1)[1])
        if _expired(bucket):
            shutil.rmtree(d)
            dropped.append(bucket)
    return sorted(dropped)


def optimize_partitions(
    spark: SparkSession, path: str, max_files_per_partition: int = 4
) -> list[int]:
    """Merge small files within hour partitions — the maintenance job that
    keeps streaming appends (one file per micro-batch per partition) from
    degrading scans. Only partitions exceeding ``max_files_per_partition``
    are rewritten: their rows re-shuffle into one file per hour value,
    append into the live layout, and a single manifest commit swaps the
    file lists atomically (readers never see a partial merge). Returns the
    optimized hour_bucket values. Plain tables: use ``compact_storage``."""
    from collections import defaultdict

    from sydradb_spark import manifest as mf

    if not mf.has_manifest(path):
        raise ValueError("optimize_partitions requires a manifest table")
    files = mf.read_files(path)
    by_part: dict[int, list[str]] = defaultdict(list)
    for f in files:
        by_part[int(f.split("=", 1)[1].split("/", 1)[0])].append(f)
    targets = sorted(
        b for b, fs in by_part.items() if len(fs) > max_files_per_partition
    )
    if not targets:
        return []
    target_files = [f for b in targets for f in by_part[b]]
    df = spark.read.option("basePath", path).parquet(
        *[f"{path}/{f}" for f in target_files]
    )
    extra = [c for c in df.columns if c not in POINT_COLS]
    shaped = (
        df.select(
            *POINT_COLS[:5],
            F.col("hour_bucket").cast("long").alias("hour_bucket"),
            *extra,
        )
        .repartition(_write_tasks(spark), F.col("hour_bucket"))
        .sortWithinPartitions("series_id", "ts")
        .write.partitionBy("hour_bucket")
    )
    # private staging + exact moved list (r13 review): a direct
    # mode("append") with a before/after data_files() diff both shares
    # Hadoop's _temporary/0 with concurrent appenders AND double-commits
    # any file they rename in during this job's window
    new = _stage_and_publish(shaped, path)
    dropped = set(target_files)
    mf.commit(path, mutate=lambda old: [f for f in old if f not in dropped] + new)
    return targets


# --- snapshot / restore -------------------------------------------------------
def snapshot(path: str, dest: str) -> None:
    """Consistent copy of the stored table (reference snapshot.zig:3-47 copies
    MANIFEST + wal/ + segments/ + tags.json).

    Manifest tables snapshot in O(metadata): hardlink the LATEST version's
    data files (immutable once committed — writers only ever add files) and
    copy the manifest dir — no data bytes move, which is the only snapshot
    that works at 100 TB (the same trick as a table-format snapshot / cheap
    clone). Plain tables fall back to a full copy."""
    from sydradb_spark import manifest as mf

    if Path(dest).exists():
        raise FileExistsError(f"snapshot destination exists: {dest}")
    if not mf.has_manifest(path):
        shutil.copytree(path, dest)
        return
    src_root, dst_root = Path(path), Path(dest)
    files = mf.read_files(path)
    dst_root.mkdir(parents=True)
    import os

    for rel in files:
        target = dst_root / rel
        target.parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(src_root / rel, target)
        except OSError:  # cross-device etc. → real copy
            shutil.copy2(src_root / rel, target)
    # fresh v1 manifest listing exactly the snapshotted files, plus the
    # source's txn ledger (r13 review): restoring a snapshot WITHOUT the
    # ledger erases the streaming replay guard — a checkpoint-replayed
    # batch would re-append after the restore. Same reason compact_storage
    # carries it through whole-table rewrites.
    mf.commit(dest, files)
    mf.carry_ledger(path, dest)


def restore(snapshot_path: str, path: str) -> None:
    """Replace the live table with a snapshot (staged copy, then swap — the
    slow copytree happens before the live table is touched)."""
    live = Path(path)
    tmp = Path(path.rstrip("/") + ".restore.tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    shutil.copytree(snapshot_path, tmp)
    _swap_dir(tmp, live)


# --- durable DELETE -----------------------------------------------------------
def delete_where(
    spark: SparkSession,
    path: str,
    predicate: Column,
    ts_min: int | None = None,
    ts_max: int | None = None,
) -> None:
    """Partition-scoped anti-filter rewrite: only hour partitions overlapping
    the time bounds are read and rewritten; untouched partitions are never
    opened.

    Manifest tables get a true ATOMIC commit: replacement files append into
    the live layout (Parquet part names never collide), then one manifest
    commit drops every old file of the affected partitions and adds the new
    ones — a crash at any point leaves LATEST on a fully consistent version
    (the reference's MANIFEST swap; what Delta/Iceberg REPLACE WHERE does).
    Pre-manifest tables keep the staged rename-before-remove dir swap."""
    from sydradb_spark import manifest as mf

    # pin ONE manifest snapshot for both the read plan and the commit's
    # drop list — read_points would take its own LATEST, and a commit
    # landing between two listings would desynchronize them
    snapshot_version = (
        mf.latest_version(path) if mf.has_manifest(path) else None
    )
    df = (
        read_points_version(spark, path, snapshot_version)
        if snapshot_version is not None
        else read_points(spark, path)
    )
    hb = hour_bucket_bounds(ts_min, ts_max)
    scoped = df.where(hb) if hb is not None else df
    affected = [r[0] for r in scoped.select("hour_bucket").distinct().collect()]
    if not affected:
        return
    remaining = scoped.where(~F.coalesce(predicate, F.lit(False)))

    if snapshot_version is not None:
        # drop EXACTLY the files this rewrite read (the snapshot version's
        # affected-partition files), not everything under the partition
        # prefixes (r13 review): a concurrent append into an affected hour
        # lands files the DELETE's predicate never evaluated — a prefix
        # drop would silently delete those rows, and a before/after
        # directory diff would double-commit them
        affected_dirs = tuple(f"hour_bucket={b}/" for b in affected)
        rewritten = {
            f
            for f in mf.read_files(path, version=snapshot_version)
            if f.startswith(affected_dirs)
        }
        extra = [c for c in remaining.columns if c not in POINT_COLS]
        shaped = (
            remaining.select(*POINT_COLS, *extra)
            .repartition(_write_tasks(remaining.sparkSession), F.col("hour_bucket"))
            .sortWithinPartitions("series_id", "ts")
            .write.partitionBy("hour_bucket")
        )
        new = _stage_and_publish(shaped, path)
        mf.commit(
            path,
            mutate=lambda old: [f for f in old if f not in rewritten] + new,
        )
        return

    tmp = path.rstrip("/") + ".delete.tmp"
    if Path(tmp).exists():
        shutil.rmtree(tmp)
    write_points(remaining, tmp, mode="overwrite")
    for bucket in affected:
        live_dir = Path(path) / f"hour_bucket={bucket}"
        staged = Path(tmp) / f"hour_bucket={bucket}"
        if staged.exists():
            _swap_dir(staged, live_dir)
        elif live_dir.exists():  # absent = every row in the partition deleted
            shutil.rmtree(live_dir)
    shutil.rmtree(tmp, ignore_errors=True)
