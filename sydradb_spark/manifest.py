"""Versioned file manifests: atomic commits for the stored points table.

The reference tracks live segments in a MANIFEST and swaps it atomically
(src/sydra/storage/manifest.zig); the Spark translation is the same idea a
table format (Delta/Iceberg) uses — a JSON file list per version plus ONE
atomic pointer rename:

    <table>/_manifest/v1.json   {"version": 1, "files": ["hour_bucket=0/..."]}
    <table>/_manifest/v2.json
    <table>/_manifest/LATEST    "2"          <- rename() = the commit point

Writers stage new data files into the normal ``hour_bucket=*/`` layout
(Parquet part files have unique names, so appends never collide), then
commit the next version. The COMMIT POINT is the atomic exclusive
``link(2)`` of a fully-written temp file to ``v{N+1}.json`` — exactly one
committer can win a version (CAS), a loser re-reads and retries, and a
crash before the link leaves the table at the previous version; readers
never observe a partial rewrite. ``LATEST`` is a monotonic pointer HINT
advanced after the link (readers take ``max(pointer, listed versions)``,
so a stale or briefly regressed pointer is harmless). Same-host committers
additionally serialize on an advisory flock — cheap, and it keeps local
retry loops short — but correctness under multi-host concurrency rests on
the link CAS, which works on shared POSIX filesystems (incl. NFS) where
flock historically does not. Old version files stay on disk until
``vacuum`` (which also gives cheap time travel via ``read_version``).

Managed-table alternative: the same storage layout drops into Delta or
Iceberg by replacing this module's commit with the format's conditional
commit (their optimistic transaction log is this file's CAS, generalized);
``storage.write_points`` is the single seam that would change.

Object-store deployments (S3/GCS/Azure — no link, no rename, no flock):
``sydradb_spark.objectstore`` carries this exact protocol with the CAS
re-based on the stores' native conditional PUT (If-None-Match /
if-generation-match:0); same version race, same retry, same pointer-hint
semantics, concurrency-tested against the same two-committer barrier race.

Tables without a ``_manifest`` dir keep the plain directory semantics —
``storage.read_points`` falls back transparently.
"""

from __future__ import annotations

import json
from pathlib import Path

MANIFEST_DIR = "_manifest"


def _root(path: str) -> Path:
    # non-POSIX triage (VERDICT r13 item 1): Path('s3a://bucket/tbl') is a
    # RELATIVE local path 's3a:/bucket/tbl' on which mkdir/link/flock all
    # SUCCEED — the exactly-once ledger would land on the driver's local
    # disk while the data goes to the store, silently voiding the
    # guarantee (a second driver gets a fresh empty ledger). This module's
    # link(2)-CAS protocol is POSIX-only by construction; object-store
    # tables route their manifest through ``sydradb_spark.objectstore``
    # (storage.write_points ``store=``). file:// URIs are local paths.
    from sydradb_spark.ingest import _posix_checkpoint_path

    local = _posix_checkpoint_path(path)
    if local is None:
        raise ValueError(
            f"the POSIX manifest protocol cannot live on {path!r}: link(2) "
            "has no object-store equivalent — pass store= (an "
            "objectstore.ObjectStore scoped to this table) so the manifest "
            "commits through the store's conditional PUT"
        )
    return Path(local)


def _mdir(path: str) -> Path:
    return _root(path) / MANIFEST_DIR


def _tree_mtime(root: Path) -> float:
    """Newest mtime anywhere inside ``root`` (the dir itself included).
    A long-running Spark write into a staging tree advances only LEAF
    mtimes — judging liveness by the root dir's own mtime would let a
    vacuum rmtree a live writer's staging mid-write (ADVICE r12). Missing
    entries (racing their creator/deleter) count as 'now' = maximally
    young, so races always err toward keeping."""
    import time

    newest = 0.0
    try:
        newest = root.stat().st_mtime
        for p in root.rglob("*"):
            try:
                m = p.stat().st_mtime
            except FileNotFoundError:
                return time.time()
            if m > newest:
                newest = m
    except FileNotFoundError:
        return time.time()
    return newest


def has_manifest(path: str) -> bool:
    mdir = _mdir(path)
    return (mdir / "LATEST").exists() or any(mdir.glob("v*.json"))


def latest_version(path: str) -> int | None:
    """Newest committed version: max of the pointer hint and the listed
    version files. The listing makes a committed-but-unpointed version (a
    crash or a concurrent committer between link and pointer advance)
    visible, and makes a briefly regressed pointer harmless."""
    mdir = _mdir(path)
    cands = []
    latest = mdir / "LATEST"
    if latest.exists():
        try:
            cands.append(int(latest.read_text().strip()))
        except (ValueError, FileNotFoundError):
            # corrupt/empty/mid-replace pointer: the hint must never
            # decide anything, least of all brick the table — the listed
            # versions below are the source of truth (the objectstore
            # twin already guards this identically)
            pass
    if mdir.exists():
        cands.extend(int(p.stem[1:]) for p in mdir.glob("v*.json"))
    return max(cands) if cands else None


def _read_doc(path: str, version: int) -> dict:
    return json.loads((_mdir(path) / f"v{version}.json").read_text())


def read_files(path: str, version: int | None = None) -> list[str]:
    """Relative data-file paths of ``version`` (default: latest)."""
    v = version if version is not None else latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no manifest at {path}")
    return list(_read_doc(path, v)["files"])


def read_txn(path: str, app_id: str) -> int | None:
    """Highest transaction version committed for ``app_id`` (None when the
    table has no manifest or the app has never committed). The txn ledger is
    the streaming sink's replay guard — the Spark-side twin of the
    reference's WAL highwater-mark replay cutoff (engine.zig:406-437): a
    foreachBatch re-delivery of an already-durable ``batch_id`` is detected
    here and becomes a no-op instead of a duplicate append."""
    v = latest_version(path)
    if v is None:
        return None
    val = (_read_doc(path, v).get("txn") or {}).get(app_id)
    return None if val is None else int(val)


def read_ledger(path: str) -> dict[str, int]:
    """The full txn ledger of the latest version ({} when absent)."""
    v = latest_version(path)
    if v is None:
        return {}
    return {k: int(t) for k, t in (_read_doc(path, v).get("txn") or {}).items()}


def commit_replace(path: str, files: list[str], txn_map: dict[str, int] | None) -> int:
    """Full-replacement commit that also REPLACES the txn ledger — the
    restore path (r14): rewinding a table to a snapshot must rewind the
    replay guard WITH it, so a streaming batch delivered after the snapshot
    re-appends into the restored table instead of no-op'ing against the
    future ledger (and a ledger the snapshot never had doesn't survive the
    rewind). Offline-maintenance context: single committer, one publish
    attempt."""
    mdir = _mdir(path)
    mdir.mkdir(parents=True, exist_ok=True)
    cur = latest_version(path)
    nv = 1 if cur is None else cur + 1
    if not _publish_version(mdir, nv, files, dict(txn_map or {})):
        raise RuntimeError(f"commit_replace lost a version race at {path}")
    _advance_pointer(mdir, nv)
    return nv


def carry_ledger(src_path: str, dst_path: str) -> bool:
    """Copy ``src_path``'s txn ledger into ``dst_path``'s next manifest
    version (file list unchanged). Whole-table rewrites that STAGE a fresh
    table and swap it in (``storage.compact_storage``) would otherwise
    discard the ledger — and with it the streaming replay guard: a batch
    whose checkpoint commit is still pending would re-append after the
    compaction. Same-table commits don't need this (``commit_cas`` always
    carries the ledger forward). Returns False when there is nothing to
    carry. Offline-maintenance context: single committer assumed, one
    publish attempt."""
    v = latest_version(src_path)
    if v is None:
        return False
    txn_map = {k: int(t) for k, t in (_read_doc(src_path, v).get("txn") or {}).items()}
    if not txn_map:
        return False
    mdir = _mdir(dst_path)
    mdir.mkdir(parents=True, exist_ok=True)
    dv = latest_version(dst_path)
    files = read_files(dst_path, dv) if dv is not None else []
    nv = 1 if dv is None else dv + 1
    if not _publish_version(mdir, nv, files, txn_map):
        raise RuntimeError(f"carry_ledger lost a version race at {dst_path}")
    _advance_pointer(mdir, nv)
    return True


def data_files(path: str) -> list[str]:
    """Every parquet data file currently on disk (relative paths)."""
    root = _root(path)
    return sorted(
        str(f.relative_to(root)) for f in root.glob("hour_bucket=*/*.parquet")
    )


def _publish_version(
    mdir: Path, v: int, files: list[str], txn_map: dict[str, int] | None = None
) -> bool:
    """CAS: atomically publish ``v{v}.json`` iff no other committer already
    has. The payload is fully written to a temp file first, then ``link(2)``
    exposes it under the version name — link is atomic-exclusive (EEXIST
    when the version is taken) and never exposes a partial file, on local
    POSIX filesystems and NFS alike."""
    import os
    import uuid

    doc: dict = {"version": v, "files": sorted(files)}
    if txn_map:
        doc["txn"] = txn_map
    tmp = mdir / f".v{v}.{uuid.uuid4().hex}.tmp"
    tmp.write_text(json.dumps(doc))
    try:
        os.link(tmp, mdir / f"v{v}.json")
        return True
    except FileExistsError:
        return False
    finally:
        tmp.unlink(missing_ok=True)


def _advance_pointer(mdir: Path, v: int) -> None:
    """Best-effort monotonic advance of the LATEST hint. Two racing winners
    can briefly regress it (check-then-replace is not atomic across hosts);
    ``latest_version`` maxes the pointer with the listed versions, so the
    hint only ever speeds reads up, never decides correctness."""
    import uuid

    latest = mdir / "LATEST"
    try:
        if latest.exists() and int(latest.read_text().strip()) >= v:
            return
    except (ValueError, FileNotFoundError):
        pass
    tmp = mdir / f".LATEST.{uuid.uuid4().hex}.tmp"
    tmp.write_text(str(v))
    tmp.replace(latest)


def commit_cas(
    path: str,
    files: list[str] | None = None,
    *,
    mutate=None,
    txn: tuple[str, int] | None = None,
    max_retries: int = 16,
) -> int | None:
    """CAS-with-retry commit: the multi-host protocol (no locks).

    Each attempt reads the current version, computes the new file list, and
    tries to win ``v{N+1}.json`` via exclusive link; on losing the race it
    re-reads and retries with linear backoff, so a concurrent committer's
    files are never dropped. ``mutate(old_files) -> new_files`` may run once
    PER ATTEMPT against a fresh list — it must be a pure function of its
    input (every call site here appends/merges literals, which is).

    ``txn=(app_id, txn_version)`` makes the commit idempotent per app: the
    txn ledger (carried forward version-to-version) records the highest
    committed txn_version per app_id, and an attempt whose txn_version is
    already <= the ledger entry returns None WITHOUT committing — the
    re-check happens inside the CAS loop, so a racing duplicate committer
    loses either the version link or the ledger check, never both ways."""
    import time

    if (files is None) == (mutate is None):
        raise ValueError("pass exactly one of files= or mutate=")
    mdir = _mdir(path)
    mdir.mkdir(parents=True, exist_ok=True)
    for attempt in range(max_retries):
        cur = latest_version(path)
        v = 1 if cur is None else cur + 1
        try:
            cur_doc = _read_doc(path, cur) if cur is not None else {}
        except FileNotFoundError:
            # a concurrent committer advanced LATEST and a concurrent
            # vacuum(keep_versions small) pruned v{cur} between our
            # latest_version() and the read — re-read and retry, exactly
            # like losing the version race
            time.sleep(0.005 * (attempt + 1))
            continue
        txn_map = {k: int(tv) for k, tv in (cur_doc.get("txn") or {}).items()}
        if txn is not None:
            app_id, txn_v = txn
            if txn_map.get(app_id, -1) >= txn_v:
                return None  # already applied — replayed batch is a no-op
            txn_map[app_id] = txn_v
        new = (
            list(mutate(list(cur_doc.get("files", []))))
            if mutate is not None
            else list(files)  # type: ignore[arg-type]
        )
        if _publish_version(mdir, v, new, txn_map):
            _advance_pointer(mdir, v)
            return v
        time.sleep(0.005 * (attempt + 1))
    raise RuntimeError(
        f"manifest commit contention: lost the version race "
        f"{max_retries} times at {path}"
    )


def commit(
    path: str,
    files: list[str] | None = None,
    *,
    mutate=None,
    txn: tuple[str, int] | None = None,
) -> int | None:
    """Write the next version's file list and advance LATEST.

    Two forms:

    - ``commit(path, files)`` — full replacement; for overwrite / fresh
      tables where the new list doesn't depend on the old one.
    - ``commit(path, mutate=fn)`` — read-modify-write; ``fn(old_files) ->
      new_files`` sees the list actually being replaced. Appenders and
      compactors must use this form: computing the merged list outside the
      commit lets a concurrent committer's files be dropped (lost-append).

    ``txn=(app_id, txn_version)`` adds idempotency (see ``commit_cas``);
    returns None when the txn was already applied and nothing committed.

    Same-host committers serialize on an advisory flock (keeps local
    retries at zero); the commit point itself is ``commit_cas``'s exclusive
    version-file link, which stays correct when committers are on
    DIFFERENT hosts sharing the filesystem and flock is a no-op."""
    import fcntl

    if (files is None) == (mutate is None):
        raise ValueError("pass exactly one of files= or mutate=")
    mdir = _mdir(path)
    mdir.mkdir(parents=True, exist_ok=True)
    with open(mdir / "COMMIT_LOCK", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        return commit_cas(path, files, mutate=mutate, txn=txn)


def vacuum(
    path: str, keep_versions: int = 2, min_age_seconds: int = 600
) -> list[str]:
    """Remove data files unreferenced by the retained manifests (and the
    older manifest jsons). Returns removed file paths.

    Retained = the last ``keep_versions`` versions PLUS any version whose
    manifest is younger than ``min_age_seconds``. The age window is the
    local-race guard: a time-travel reader holding version N−k, or an
    appender that has staged data files but not yet committed, survives a
    concurrent vacuum as long as it started within the window. Files whose
    own mtime is inside the window are likewise never deleted (they may be
    a live writer's staged output). Set ``min_age_seconds=0`` only in
    offline maintenance where no concurrent readers/writers exist."""
    import time

    v = latest_version(path)
    if v is None:
        return []
    now = time.time()
    mdir = _mdir(path)

    def _young(p: Path) -> bool:
        try:
            return now - p.stat().st_mtime < min_age_seconds
        except FileNotFoundError:
            return True  # racing with its creator — leave it alone
    keep = set()
    # a version file already pruned by an earlier vacuum must be SKIPPED,
    # not treated as young (the missing-file fallback is for data files
    # racing their creator) — repeated vacuums leave holes below the kept
    # window, and reading a hole crashed the second maintenance pass
    kept_versions = {
        kv
        for kv in range(1, v + 1)
        if (mdir / f"v{kv}.json").exists()
        and (kv > v - keep_versions or _young(mdir / f"v{kv}.json"))
    }
    for kv in kept_versions:
        try:
            keep.update(read_files(path, kv))
        except FileNotFoundError:
            continue  # lost a race with a concurrent vacuum — nothing to keep
    removed = []
    root = _root(path)
    for rel in data_files(path):
        if rel not in keep and not _young(root / rel):
            f = root / rel
            # missing_ok: two concurrent maintenance vacuums (two streams,
            # one table) may both list the same unreferenced file — the
            # loser of the unlink race must not fail the batch (r13 review)
            f.unlink(missing_ok=True)
            crc = f.with_name(f".{f.name}.crc")  # local-FS checksum sibling
            crc.unlink(missing_ok=True)
            removed.append(rel)
    # prune partition dirs holding nothing but leftover hidden files —
    # age-guarded and race-tolerant (r13 review): a concurrent appender
    # renames the hidden .crc sibling BEFORE its parquet file, so a fresh
    # dir can legitimately hold only young hidden files; deleting them and
    # rmdir'ing would yank the parent from under the in-flight rename
    for d in root.glob("hour_bucket=*"):
        try:
            entries = list(d.iterdir()) if d.is_dir() else None
        except FileNotFoundError:
            continue  # racing another vacuum
        if entries is None or any(p.name[0] != "." for p in entries):
            continue
        if any(_young(p) for p in entries) or _young(d):
            continue  # possibly an appender's just-renamed .crc
        try:
            for p in entries:
                p.unlink(missing_ok=True)
            d.rmdir()
        except OSError:
            pass  # a file landed between the listing and the rmdir — keep
    for mf in _mdir(path).glob("v*.json"):
        # prune only versions from OUR snapshot's past (<= v) that are
        # neither kept nor young: a version committed concurrently during
        # this vacuum is > v (or young) and must survive — unlinking it
        # left LATEST pointing at a deleted manifest, making the table
        # unreadable AND uncommittable (r13 review, the severe one)
        kv = int(mf.stem[1:])
        if kv <= v and kv not in kept_versions and not _young(mf):
            mf.unlink(missing_ok=True)
    # orphaned commit temp files (a committer died between write and link)
    for tmp in _mdir(path).glob(".*.tmp"):
        if not _young(tmp):
            tmp.unlink(missing_ok=True)
    # crashed private append staging (a writer died before its renames —
    # storage.write_points r12); age-guarded by the NEWEST mtime within the
    # staging tree, not the root dir's own mtime — during a long Spark
    # write only leaf mtimes advance, and an append outliving the window
    # must not have its live staging reclaimed mid-write (ADVICE r12)
    import shutil

    for stg in root.glob(".staging-*"):
        if stg.is_dir() and now - _tree_mtime(stg) >= min_age_seconds:
            shutil.rmtree(stg, ignore_errors=True)
    return sorted(removed)
