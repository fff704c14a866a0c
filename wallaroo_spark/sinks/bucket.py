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
import uuid
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
        # writer-unique tmp (r16, ADVICE r15): a fixed tmp name let two
        # concurrent overwrite puts of the same key share one tmp path, so
        # one writer could publish the other's half-written bytes or crash
        # on a vanished rename source
        tmp = p.parent / f"_tmp_{os.getpid()}_{uuid.uuid4().hex}_{p.name}"
        try:
            _write_all(tmp, body)
            tmp.rename(p)  # atomic publish
        except BaseException:
            tmp.unlink(missing_ok=True)
            raise

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


def _write_all(path, body: bytes) -> None:
    """Write the full body and fsync before anyone can observe the file.

    A bare ``os.write`` may write fewer bytes than given without raising,
    and an unfsynced publish can surface a truncated object after a crash
    — either breaks the sink's 'replays converge' contract because the
    short object would be served as complete forever after.
    """
    fd = os.open(str(path), os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    try:
        view = memoryview(body)
        while view:
            n = os.write(fd, view)
            view = view[n:]
        os.fsync(fd)
    finally:
        os.close(fd)


def _put_if_absent(root: str, key: str, body: bytes) -> bool:
    """Module-level so the executor-side closure stays tiny.

    r16 (ADVICE r15): the previous form opened the FINAL path with O_EXCL
    and wrote the body directly — a crash or short write left a truncated
    object that every replay then skipped on EEXIST, permanently violating
    convergence, and concurrent readers could observe partial bodies.
    Now the body lands fully (and fsynced) in a writer-unique tmp file and
    is published with ``os.link`` — the filesystem's atomic
    create-exclusive primitive (two executors racing the same key: exactly
    one link succeeds, the loser sees EEXIST with the winner's COMPLETE
    body already in place)."""
    rootr = os.path.realpath(root)
    path = os.path.realpath(os.path.join(root, key))
    if os.path.commonpath([rootr, path]) != rootr:
        raise ValueError(f"object key escapes the bucket: {key!r}")
    os.makedirs(os.path.dirname(path) or rootr, exist_ok=True)
    tmp = os.path.join(
        os.path.dirname(path),
        f"_tmp_{os.getpid()}_{uuid.uuid4().hex}_{os.path.basename(path)}",
    )
    try:
        _write_all(tmp, body)
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        # the tmp is garbage on every path (link'd, lost the race, or the
        # write died mid-body) — a hard kill can still orphan one, which
        # list()/get() never serve (``_tmp_`` prefix) and whose unique
        # name no replay ever reuses
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass


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
