"""Shared soak-prep plumbing (round 13, review finding): both soak scripts
materialize a twin as `chunks` arrival-ordered files in ONE
repartition("chunk") + partitionBy write, then rename each partition's part
file to `chunk_%04d.<ext>` with an mtime that forces arrival order under
maxFilesPerTrigger batching. The rename/empty/multi-part edge handling
lives here once so the two scripts cannot drift (they previously disagreed
on the multi-part case)."""

from __future__ import annotations

import glob
import os
import shutil
import time


def finalize_chunk_files(
    tmp: str,
    src_dir: str,
    chunks: int,
    ext: str,
    write_empty,
    merge_multi,
) -> None:
    """Move `tmp/chunk=i/part-*` to `src_dir/chunk_%04d.<ext>`, one file per
    chunk. ``write_empty(dst)`` fills a chunk whose time slice held no rows
    (the batch schedule the crash/txn math is built on must stay aligned);
    ``merge_multi(parts, dst)`` handles the repartition guarantee failing
    (e.g. a future maxRecordsPerFile split) — text concatenates, parquet
    re-writes coalesced. Removes ``tmp`` when done."""
    now = time.time()
    for i in range(chunks):
        parts = sorted(glob.glob(f"{tmp}/chunk={i}/part-*"))
        dst = f"{src_dir}/chunk_{i:04d}.{ext}"
        if len(parts) == 1:
            shutil.move(parts[0], dst)
        elif not parts:
            write_empty(dst)
        else:
            merge_multi(parts, dst)
        os.utime(dst, (now + i, now + i))
    shutil.rmtree(tmp, ignore_errors=True)


def concat_files(parts: list[str], dst: str) -> None:
    """Multi-part merge for line-oriented formats (NDJSON/text)."""
    with open(dst, "wb") as out:
        for p in parts:
            with open(p, "rb") as fh:
                shutil.copyfileobj(fh, out)
