"""Multimodal column plumbing: opaque binary media + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas`` kernels.

The Spark-side machinery here is real and tested — schema, partitioning,
Arrow batch shapes, multi-row-per-input frame explosion. The *decoders*
are deliberately stubbed: this container ships no image/audio libraries,
so ``decode_image``/``decode_audio`` raise ``NotImplementedError`` behind
an import-try, and the pipeline runs a **deterministic fake decode**
(md5-derived dimensions) whose outputs the DuckDB oracle reproduces —
making even the stubbed path correctness-gated end-to-end.

Media table shape (derived deterministically from ``documents`` so the
driver corpus feeds it):

    (media_id long, modality string in {image,audio,video},
     media binary, n_bytes long)

Scale notes (100 TB): media rows are large and opaque — the plan keeps
them unshuffled (all feature extraction is mapInPandas over the scan
partitions; no groupBy touches the binary column). Frame explosion
multiplies rows *after* the binary column is dropped. At real scale the
binary column lives in its own parquet column chunk, so feature queries
that skip ``media`` never read those bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODALITIES = ["image", "audio", "video"]

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_hash", StringType(), False),
    ]
)


def decode_image(data: bytes):  # pragma: no cover - stub by design
    """Real image decode — unavailable in this container (no PIL/opencv).

    The pipeline's fake decode below is the tested stand-in; swap this in
    when an imaging library is present.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "the pipeline uses the deterministic fake decoder instead"
        ) from e
    raise NotImplementedError("real decode path not wired in this build")


def decode_audio(data: bytes):  # pragma: no cover - stub by design
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa, not installed; "
            "the pipeline uses the deterministic fake decoder instead"
        ) from e
    raise NotImplementedError("real decode path not wired in this build")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive the opaque-media table from documents: media = utf-8 bytes
    of text, modality = doc_id % 3 round-robin."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.length(F.col("text")).cast("long").alias("n_bytes"),
    )


def _fake_decode_row(modality: str, digest: str, n_bytes: int) -> dict:
    """Deterministic fake decode: md5-derived media dimensions.

    Mirrored exactly by the oracle SQL (same hex-slice arithmetic).
    """
    h1 = int(digest[:8], 16)
    h2 = int(digest[8:16], 16)
    out = {"width": None, "height": None, "sample_rate": None,
           "duration_ms": None, "n_frames": None}
    if modality == "image":
        out["width"] = 1 + h1 % 64
        out["height"] = 1 + h2 % 64
    elif modality == "audio":
        out["sample_rate"] = 8000 + (h1 % 8) * 1000
        out["duration_ms"] = n_bytes * 10
    else:  # video
        out["n_frames"] = 1 + h1 % 7
    return out


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    One output row per media row; the binary column is consumed inside
    the kernel (digest) and dropped from the output.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            digests = [
                hashlib.md5(bytes(b)).hexdigest() for b in pdf["media"]
            ]
            rows = []
            for mid, mod, nb, dg in zip(
                pdf["media_id"], pdf["modality"], pdf["n_bytes"], digests
            ):
                d = _fake_decode_row(mod, dg, int(nb))
                rows.append(
                    {
                        "media_id": int(mid),
                        "modality": mod,
                        "n_bytes": int(nb),
                        "digest": dg,
                        **d,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling for video media: n_frames rows per video, each with
    a deterministic frame digest — the multi-row-per-input mapInPandas
    shape (decode -> per-frame emit)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_hash": []}
            for mid, mod, nb, blob in zip(
                pdf["media_id"], pdf["modality"], pdf["n_bytes"], pdf["media"]
            ):
                if mod != "video":
                    continue
                dg = hashlib.md5(bytes(blob)).hexdigest()
                n_frames = 1 + int(dg[:8], 16) % 7
                for i in range(n_frames):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["frame_hash"].append(
                        hashlib.md5(f"{dg}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


# --- DuckDB oracle SQL ----------------------------------------------------
# digest = md5(text) == md5 of the utf-8 media bytes by construction.

_SQL_MEDIA = """
media AS (
    SELECT doc_id::BIGINT AS media_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INTEGER] AS modality,
           md5(text) AS digest,
           length(text)::BIGINT AS n_bytes
    FROM documents
),
decoded AS (
    SELECT media_id, modality, n_bytes, digest,
           ('0x' || substr(digest, 1, 8))::BIGINT AS h1,
           ('0x' || substr(digest, 9, 8))::BIGINT AS h2
    FROM media
)"""

SQL_MULTIMODAL_FEATURES = rf"""
WITH {_SQL_MEDIA}
SELECT media_id, modality, n_bytes, digest,
       CASE WHEN modality = 'image' THEN (1 + h1 % 64)::INTEGER END AS width,
       CASE WHEN modality = 'image' THEN (1 + h2 % 64)::INTEGER END AS height,
       CASE WHEN modality = 'audio' THEN (8000 + (h1 % 8) * 1000)::INTEGER END
           AS sample_rate,
       CASE WHEN modality = 'audio' THEN n_bytes * 10 END AS duration_ms,
       CASE WHEN modality = 'video' THEN (1 + h1 % 7)::INTEGER END AS n_frames
FROM decoded
"""

SQL_VIDEO_FRAMES = rf"""
WITH {_SQL_MEDIA}
SELECT media_id, (i - 1)::INTEGER AS frame_idx,
       md5(digest || ':' || (i - 1)::VARCHAR) AS frame_hash
FROM decoded, unnest(range(1, 1 + (1 + h1 % 7)::INTEGER)) AS t(i)
WHERE modality = 'video'
"""
