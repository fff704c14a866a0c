"""Object-bucket sink: one object per row, executor-side, replay-safe.

Reference: `connectors/s3_bucket_sink` — a boto3 loop doing
``put_object(Bucket=..., Key=key, Body=body)`` for every (key, body)
pipeline value. The Spark mapping writes each partition's rows as
objects directly from the executors (no driver collect) against an
object-store abstraction:

- ``ObjectBucket`` — a directory-backed bucket with CREATE-EXCLUSIVE
  binary puts (``O_EXCL``), get, list, and delete. The create-exclusive
  contract is the load-bearing divergence from the reference's blind
  put_object: Structured Streaming redelivers whole micro-batches after
  a crash, and put-if-absent makes the replay CONVERGE (first write
  wins, replays are no-ops) instead of rewriting objects — the same
  discipline the manifest LogStore uses for its commit log
  (`sinks/manifest.py:225-263`). Pass ``overwrite=True`` for the
  reference's last-write-wins semantics where convergence is not wanted.
  Keys may contain ``/`` — they map to subdirectories, like S3 prefixes.
- ``object_bucket_sink`` — a foreachBatch fn writing each partition's
  rows from the executor process (the bucket is plain filesystem, so
  executor workers write directly — no socket hop, no driver collect).

A real S3 deployment swaps ObjectBucket for the cloud client with the
same three calls; the sink fn is written against the bucket PATH, not
the class, so the executor side stays pickle-free.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame


class ObjectBucket:
    """Directory-backed object bucket: create-exclusive binary puts."""

    def __init__(self, root: str | os.PathLike):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, key: str) -> Path:
        root = self.root.resolve()
        p = (self.root / key).resolve()
        # commonpath, not startswith: "/b/bucketX" must not pass for
        # root "/b/bucket"
        if os.path.commonpath([str(root), str(p)]) != str(root):
            raise ValueError(f"object key escapes the bucket: {key!r}")
        return p

    def put_if_absent(self, key: str, body: bytes) -> bool:
        """Create-exclusive write; False (untouched) if the key exists."""
        return _put_if_absent(str(self.root), key, body)

    def put(self, key: str, body: bytes) -> None:
        """Blind overwrite — the reference's put_object semantics."""
        p = self._path(key)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.parent / f"_tmp_{p.name}"
        tmp.write_bytes(body)
        tmp.rename(p)  # atomic publish

    def get(self, key: str) -> bytes:
        return self._path(key).read_bytes()

    def list(self, prefix: str = "") -> list[str]:
        out = []
        for p in self.root.rglob("*"):
            if p.is_file() and not p.name.startswith("_tmp_"):
                k = str(p.relative_to(self.root))
                if k.startswith(prefix):
                    out.append(k)
        return sorted(out)

    def delete(self, key: str) -> bool:
        try:
            self._path(key).unlink()
            return True
        except FileNotFoundError:
            return False


def _put_if_absent(root: str, key: str, body: bytes) -> bool:
    """Module-level so the executor-side closure stays tiny: O_EXCL is the
    cross-process create-exclusive primitive (two executors racing the
    same key: exactly one wins, the other sees EEXIST and moves on)."""
    rootr = os.path.realpath(root)
    path = os.path.realpath(os.path.join(root, key))
    if os.path.commonpath([rootr, path]) != rootr:
        raise ValueError(f"object key escapes the bucket: {key!r}")
    os.makedirs(os.path.dirname(path) or rootr, exist_ok=True)
    try:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        return False
    try:
        os.write(fd, body)
    finally:
        os.close(fd)
    return True


def object_bucket_sink(
    bucket_dir: str,
    key_col: str = "key",
    body_col: str = "body",
    overwrite: bool = False,
):
    """foreachBatch fn writing one object per row from the executors
    (`connectors/s3_bucket_sink`'s put loop, parallelized per partition).
    Default is put-if-absent (micro-batch replays converge); pass
    ``overwrite=True`` for the reference's blind-put semantics."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        def write_partition(rows):
            for row in rows:
                k = str(row[key_col])
                b = row[body_col]
                body = bytes(b) if isinstance(b, (bytes, bytearray)) else str(b).encode()
                if overwrite:
                    ObjectBucket(bucket_dir).put(k, body)
                else:
                    _put_if_absent(bucket_dir, k, body)

        batch_df.select(key_col, body_col).foreachPartition(write_partition)

    return sink
