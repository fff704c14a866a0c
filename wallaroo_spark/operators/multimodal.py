"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not in the reference (its payloads are opaque pickles); this is the
100 TB-training-pipeline surface: media travel as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so media bytes never leave the executor
and partitions stream batch-by-batch (bounded memory regardless of blob
size).

The codec layer (pillow/ffmpeg-style libs) is NOT in this container, so the
decode kernels are deterministic STUBS behind ``_decode_image_stub`` —
clearly marked; swap the stub body for a real decoder and nothing else
changes (schema, batching, partitioning are the real, tested plumbing).

Scale notes: media rows are large and skew-prone — repartition by a content
hash before heavy kernels (``repartition_for_media``), keep
``maxPartitionBytes`` small for blob tables, and never collect binaries to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


def _decode_image_stub(raw: bytes) -> tuple[int, int, int, str]:
    """STUB decoder (no imaging libs in this container).

    Deterministic fake: derives (width, height, channels, format) from the
    byte content so tests are stable. Replace with e.g. PIL.Image.open for
    real decoding; the surrounding plumbing is production-shaped.
    """
    if not raw:
        raise NotImplementedError("empty media payload — real decoder required")
    w = 16 + raw[0] % 64
    h = 16 + raw[-1] % 64
    c = 1 + len(raw) % 3
    fmt = "png" if raw[:1] == b"\x89" else "jpg"
    return w, h, c, fmt


def attach_image_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """binary media -> media + decoded metadata struct columns."""

    def run(batches):
        import pandas as _pd

        def stub(raw):
            raw = bytes(raw)
            if not raw:
                raise NotImplementedError("empty media payload — real decoder required")
            return (16 + raw[0] % 64, 16 + raw[-1] % 64, 1 + len(raw) % 3,
                    "png" if raw[:1] == b"\x89" else "jpg")

        for pdf in batches:
            meta = [stub(m) for m in pdf[media_col]]
            pdf = pdf.copy()
            pdf["width"] = [m[0] for m in meta]
            pdf["height"] = [m[1] for m in meta]
            pdf["channels"] = [m[2] for m in meta]
            pdf["format"] = [m[3] for m in meta]
            yield pdf

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema=f"{fields}, {IMAGE_META_SCHEMA}")


def extract_features(df: DataFrame, media_col: str = "media", dim: int = 8) -> DataFrame:
    """media -> fixed-dim float feature vector (stub: byte histogram).

    Same mapInPandas shape a real embedding model would use (batched
    inference per Arrow batch).
    """

    def run(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            feats = []
            for m in pdf[media_col]:
                a = _np.frombuffer(bytes(m), dtype=_np.uint8)
                hist, _ = _np.histogram(a, bins=dim, range=(0, 256))
                norm = hist / max(1, len(a))
                feats.append([float(x) for x in norm])
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(run, schema=f"doc_id bigint, features array<double>")


def frame_sample(df: DataFrame, media_col: str = "media", every: int = 10) -> DataFrame:
    """video-ish payload -> one row per sampled frame (stub: fixed-size strides
    over the byte stream). Real impl swaps the stride loop for a demuxer."""

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, m in zip(pdf["doc_id"], pdf[media_col]):
                raw = bytes(m)
                step = max(1, every)
                for i, off in enumerate(range(0, len(raw), step)):
                    ids.append(did)
                    idxs.append(i)
                    frames.append(raw[off : off + step])
            yield _pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema="doc_id bigint, frame_idx int, frame binary")


def resize_media(df: DataFrame, media_col: str = "media", stride: int = 4) -> DataFrame:
    """media -> downsampled media (stub: keep every stride-th byte).

    The real-decoder version swaps the slice for an image resampler behind
    the same Arrow-batched mapInPandas shape; bytes never leave executors.
    Adds ``resized_len``; the media column is replaced in place.
    """

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            out = [bytes(bytes(m)[::stride]) for m in pdf[media_col]]
            pdf = pdf.copy()
            pdf[media_col] = out
            pdf["resized_len"] = [len(x) for x in out]
            yield pdf

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema=f"{fields}, resized_len int")


def repartition_for_media(df: DataFrame, media_col: str = "media", parts: int | None = None) -> DataFrame:
    """Spread skewed media rows by content hash before heavy kernels."""
    h = F.xxhash64(F.col(media_col))
    return df.repartition(parts, h) if parts else df.repartition(h)
