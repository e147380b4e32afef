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
commit by writing ``v{N+1}.json`` and renaming ``LATEST.tmp`` over
``LATEST``. A crash before the rename leaves LATEST at the previous
version — readers never observe a partial rewrite, which closes the
delete/compact crash window the bare directory layout can only narrow.
Old version files stay on disk until ``vacuum`` (which also gives cheap
time travel via ``read_version``).

Tables without a ``_manifest`` dir keep the plain directory semantics —
``storage.read_points`` falls back transparently.
"""

from __future__ import annotations

import json
from pathlib import Path

MANIFEST_DIR = "_manifest"


def _mdir(path: str) -> Path:
    return Path(path) / MANIFEST_DIR


def has_manifest(path: str) -> bool:
    return (_mdir(path) / "LATEST").exists()


def latest_version(path: str) -> int | None:
    latest = _mdir(path) / "LATEST"
    if not latest.exists():
        return None
    return int(latest.read_text().strip())


def read_files(path: str, version: int | None = None) -> list[str]:
    """Relative data-file paths of ``version`` (default: latest)."""
    v = version if version is not None else latest_version(path)
    if v is None:
        raise FileNotFoundError(f"no manifest at {path}")
    doc = json.loads((_mdir(path) / f"v{v}.json").read_text())
    return list(doc["files"])


def data_files(path: str) -> list[str]:
    """Every parquet data file currently on disk (relative paths)."""
    root = Path(path)
    return sorted(
        str(f.relative_to(root)) for f in root.glob("hour_bucket=*/*.parquet")
    )


def commit(
    path: str,
    files: list[str] | None = None,
    *,
    mutate=None,
) -> int:
    """Write the next version's file list and atomically advance LATEST.

    Two forms:

    - ``commit(path, files)`` — full replacement; for overwrite / fresh
      tables where the new list doesn't depend on the old one.
    - ``commit(path, mutate=fn)`` — read-modify-write; ``fn(old_files) ->
      new_files`` runs while the commit lock is held, so the old list it
      sees IS the list being replaced. Appenders/compactors must use this
      form: computing the merged list outside the lock lets a concurrent
      committer's files be dropped from LATEST (lost-append race).

    An advisory flock around the read/mutate/write/rename sequence
    serializes same-host committers; cross-host concurrency still needs a
    real table format's conditional commit — the documented Delta/Iceberg
    swap-in point."""
    import fcntl

    if (files is None) == (mutate is None):
        raise ValueError("pass exactly one of files= or mutate=")
    mdir = _mdir(path)
    mdir.mkdir(parents=True, exist_ok=True)
    with open(mdir / "COMMIT_LOCK", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        cur = latest_version(path)
        v = 1 if cur is None else cur + 1
        if mutate is not None:
            old = read_files(path) if cur is not None else []
            files = list(mutate(old))
        (mdir / f"v{v}.json").write_text(
            json.dumps({"version": v, "files": sorted(files)})
        )
        tmp = mdir / "LATEST.tmp"
        tmp.write_text(str(v))
        tmp.replace(mdir / "LATEST")  # rename(2): the atomic commit point
    return v


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
    kept_versions = {
        kv
        for kv in range(1, v + 1)
        if kv > v - keep_versions or _young(mdir / f"v{kv}.json")
    }
    for kv in kept_versions:
        keep.update(read_files(path, kv))
    removed = []
    root = Path(path)
    for rel in data_files(path):
        if rel not in keep and not _young(root / rel):
            f = root / rel
            f.unlink()
            crc = f.with_name(f".{f.name}.crc")  # local-FS checksum sibling
            crc.unlink(missing_ok=True)
            removed.append(rel)
    # prune partition dirs holding nothing but leftover hidden files
    for d in root.glob("hour_bucket=*"):
        if d.is_dir() and not any(p.name[0] != "." for p in d.iterdir()):
            for p in d.iterdir():
                p.unlink()
            d.rmdir()
    for mf in _mdir(path).glob("v*.json"):
        if int(mf.stem[1:]) not in kept_versions:
            mf.unlink()
    return sorted(removed)
