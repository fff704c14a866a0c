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


AHASH_BITS = 32
AHASH_BANDS = 8


def image_ahash(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """media -> 32-bit average-hash perceptual fingerprint (aHash shape).

    STUB kernel (no imaging libs in this container): instead of decoded
    8x8 luma, the payload's raw bytes split into 32 equal segments; bit i
    is set iff segment i's mean byte exceeds the payload mean. All
    comparisons are cross-multiplied integers (seg_sum * n > tot_sum *
    seg_len), exact on any engine — no float means. Swap the segment loop
    for decode + DCT and nothing else changes.

    Plumbing is the multimodal family's production shape: Arrow-batched
    mapInPandas, bytes never leave the executor. Output: (id_col, ahash).
    """

    def run(batches):
        import pandas as _pd

        def ah(raw):
            raw = bytes(raw)
            n = len(raw)
            if n == 0:
                raise NotImplementedError("empty media payload — real decoder required")
            tot = sum(raw)
            ssum = [0] * AHASH_BITS
            scnt = [0] * AHASH_BITS
            for k, byte in enumerate(raw):
                s = (k * AHASH_BITS) // n
                ssum[s] += byte
                scnt[s] += 1
            h = 0
            for i in range(AHASH_BITS):
                if scnt[i] and ssum[i] * n > tot * scnt[i]:
                    h |= 1 << i
            return h

        for pdf in batches:
            yield _pd.DataFrame(
                {id_col: pdf[id_col], "ahash": [ah(m) for m in pdf[media_col]]}
            )

    return df.mapInPandas(run, schema=f"{id_col} long, ahash long")


def ahash_near_pairs(
    df: DataFrame,
    max_hamming: int = 5,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perceptual near-duplicate media pairs: aHash fingerprints paired by
    the generic banded-pigeonhole engine (8 bands of 4 bits — lossless for
    Hamming distance < 8). The media-dedup tie-in for the multimodal
    family: fingerprints are 8 bytes/row however large the blobs, so the
    pairing never touches media bytes again."""
    from wallaroo_spark.operators.dedup import hamming_pairs

    fp = image_ahash(df, media_col, id_col)
    return hamming_pairs(
        fp, "ahash", max_hamming, bits=AHASH_BITS, bands=AHASH_BANDS, id_col=id_col
    )
