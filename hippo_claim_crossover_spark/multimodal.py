"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas`` (§2b).

The container has no image/audio codecs, so the actual decode is stubbed
(SURVEY.md §2b mandate): ``decode_media`` raises ``NotImplementedError``
unless the deterministic fake decoder is selected. Everything Spark-side —
schema, batch iteration, partitioning — is real and tested
(tests/test_multimodal.py): swapping in a real codec changes only the
body of ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output schema of the decode stage: one row per media object with typed
# feature metadata. BinaryType payload in, scalar features out.
DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def _decode_one(payload: bytes, media_type: str, fake: bool) -> tuple[int, int, int]:
    """Decode one media payload → (width, height, n_frames).

    With ``fake=True`` (the only mode available in this container) the
    features are a deterministic function of the payload bytes, so tests
    and reruns are stable. A real deployment implements the codec here.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this container; "
            "use fake=True for the deterministic stub decoder")
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0]
    height = 16 + digest[1]
    n_frames = 1 if media_type == "image" else 1 + digest[2] % 32
    return width, height, n_frames


def read_binary_files(spark, path: str, glob: str = "*.bin") -> DataFrame:
    """Media-file ingestion via Spark's ``binaryFile`` source — the §2b
    entry point for raw image/audio/video objects: one row per file with
    (path, modificationTime, length, content) and the whole file as a
    BinaryType column.

    100 TB notes: binaryFile parallelizes at file granularity (one file
    never splits across tasks — correct for media, where a decoder needs
    the whole object), honors ``pathGlobFilter``/``recursiveFileLookup``
    for lake layouts, and packs small files into shared tasks up to
    ``spark.sql.files.maxPartitionBytes``. Millions of tiny objects are a
    *listing* problem before a read problem — point it at manifest-driven
    prefixes rather than one giant flat directory."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )


def materialize_binary_fixture(docs: DataFrame, out_dir: str,
                               max_files: int = 100) -> str:
    """Write a bounded set of ``doc_<id>.bin`` files (payload = UTF-8 doc
    text) under ``out_dir`` so the binaryFile read path can be exercised —
    the fixtures ship parquet only. Bounded driver work by construction
    (``max_files`` is a constant, never O(N)); in production the media
    objects already live in object storage and this step doesn't exist."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rows = (docs.where(F.col("doc_id") < max_files)
            .select("doc_id", "text").collect())
    # Remove files for ids not in the current fixture: the harness
    # regenerates /root/testdata between rounds, and a lingering
    # doc_<id>.bin for a vanished id would be read back by the glob and
    # break the oracle parity (which derives from the live table only).
    keep = {f"doc_{r['doc_id']}.bin" for r in rows}
    for name in os.listdir(out_dir):
        if name.endswith(".bin") and name not in keep:
            os.remove(os.path.join(out_dir, name))
    for r in rows:
        fp = os.path.join(out_dir, f"doc_{r['doc_id']}.bin")
        with open(fp, "wb") as f:
            f.write(r["text"].encode("utf-8"))
    return out_dir


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model documents as multimodal rows: an opaque binary payload column
    + metadata struct. (Fixtures have no real media, so the payload is the
    UTF-8 text — the schema/partitioning shape is what matters.)"""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video").alias("media_type"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (payload, meta) → features.

    Partition-parallel, batch-at-a-time — the shape a real 100 TB media
    decode needs (each task streams record batches; no driver involvement,
    no per-row Python overhead beyond the codec call itself).
    """

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                    pdf["doc_id"], pdf["payload"], pdf["meta"]):
                media_type = meta["media_type"]
                w, h, nf = _decode_one(bytes(payload), media_type, fake)
                rows.append((doc_id, media_type, w, h, nf, len(payload)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return media.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


def sample_frames(features: DataFrame, every_nth: int = 8,
                  max_frames: int = 4) -> DataFrame:
    """Frame sampling over decoded media: one output row per sampled frame
    index (every ``every_nth``-th frame, capped at ``max_frames``).

    Pure built-ins — ``sequence`` + ``explode`` generate the frame list
    JVM-side; the downstream per-frame decode would be another
    ``mapInPandas`` stage keyed by (doc_id, frame_idx). This is the fan-out
    step a video pipeline runs before per-frame feature extraction, and at
    100 TB it's where row counts multiply — keeping it as a generator
    (no join, no shuffle) matters.
    """
    idxs = F.slice(
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)),
        1, max_frames)
    return (
        features.where(F.col("n_frames") > 0)
        .select("doc_id", "media_type", "n_frames",
                F.explode(idxs).alias("frame_idx"))
    )


def resize_spec(features: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning: letterbox scale factor + output dims per media row
    (the arithmetic a real resize kernel applies, computed JVM-side; the
    pixel work itself belongs in the codec's mapInPandas stage)."""
    scale = F.least(F.lit(float(target)) / F.col("width"),
                    F.lit(float(target)) / F.col("height"))
    return features.withColumns({
        "scale": F.round(scale, 6),
        "out_width": F.greatest(
            F.lit(1), F.floor(F.col("width") * scale).cast("int")),
        "out_height": F.greatest(
            F.lit(1), F.floor(F.col("height") * scale).cast("int")),
    })
