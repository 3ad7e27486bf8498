"""Multimodal queries (§2b): binary payload metadata (oracle-checked) and
the stub-decoded feature extraction (rows-only — mapInPandas with a
deterministic fake codec, see ``multimodal.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hippo_claim_crossover_spark.multimodal import (
    attach_binary_payload,
    decode_media,
    materialize_binary_fixture,
    read_binary_files,
    sample_frames,
)
from hippo_claim_crossover_spark.plans.base import QuerySpec, t


def q_mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata: payload size + sha256 digest + routed media
    type — pure built-ins over a BinaryType column."""
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("media_type"),
    )


ORACLE_MM_META = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       sha256(text) AS digest,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type
FROM documents
"""


N_BINFILES = 100


def q_mm_binfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-media ingestion through ``spark.read.format("binaryFile")``:
    materialize a bounded ``doc_<id>.bin`` fixture set (payload = doc
    text; the parquet fixtures ship no real media), read the files back
    through the binaryFile source with a path glob, parse the id out of
    the file path, and emit (doc_id, n_bytes, digest) — byte length from
    the source's own ``length`` column and sha-256 over the BinaryType
    ``content``. Oracle: DuckDB computes the identical triple straight
    from the documents table, so a mismatch anywhere in write → list →
    read → hash fails the gate."""
    import os

    d = t(spark, sf_dir, "documents")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.pardir, "_scratch", "binfiles", sf_tag)
    materialize_binary_fixture(d, out_dir, max_files=N_BINFILES)
    files = read_binary_files(spark, out_dir, glob="*.bin")
    return files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("digest"),
    )


ORACLE_MM_BINFILE = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS digest
FROM documents WHERE doc_id < {N_BINFILES}
"""


def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub decode pipeline: binary payload → mapInPandas fake codec →
    typed features, aggregated per media type.

    Fully oracle-checked: the fake codec's features are sha256-byte
    arithmetic over the payload (multimodal._decode_one — width/height
    from digest bytes 0/1, frame count from byte 2), which DuckDB
    reproduces exactly from hex-substring parsing of ``sha256(text)``.
    The driver's hash therefore exercises the whole Arrow decode path —
    schema, batch iteration, payload bytes — end to end, not rows-only."""
    media = attach_binary_payload(t(spark, sf_dir, "documents"))
    feats = decode_media(media, fake=True)
    return (
        feats.groupBy("media_type")
        .agg(F.count(F.lit(1)).alias("n_media"),
             F.sum("n_bytes").alias("total_bytes"),
             F.max("width").alias("max_width"),
             F.max("n_frames").alias("max_frames"))
    )


ORACLE_MM_DECODE = """
WITH f AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         sha256(text) AS dg,
         octet_length(encode(text)) AS n_bytes
  FROM documents
), feat AS (
  SELECT media_type, n_bytes,
         16 + CAST(('0x' || substr(dg, 1, 2)) AS INTEGER) AS width,
         CASE WHEN media_type = 'image' THEN 1
              ELSE 1 + CAST(('0x' || substr(dg, 5, 2)) AS INTEGER) % 32
         END AS n_frames
  FROM f
)
SELECT media_type, count(*) AS n_media,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       max(width) AS max_width, max(n_frames) AS max_frames
FROM feat GROUP BY media_type
"""


_FRAME_NTH, _FRAME_MAX = 8, 4


def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the decoded media stream: every 8th frame,
    capped at 4 per object (``multimodal.sample_frames`` —
    ``sequence`` + ``slice`` + ``explode``, the JVM-side fan-out a video
    pipeline runs before per-frame feature extraction), rolled up per
    media type.

    Exactly oracle-checked end to end: the frame counts derive from the
    stub codec's sha256-byte ``n_frames`` (multimodal._decode_one), and
    for a 0-based every-Nth sample the per-object sampled count is
    ``least(cap, (n_frames−1) div N + 1)`` with max index
    ``N·(k−1)`` — pure integer arithmetic DuckDB reproduces, so the
    driver hash covers the Arrow decode stage AND the generator fan-out
    (the explode multiplies rows; keeping it joins/shuffle-free is the
    100 TB point — the only shuffle here is the final 3-key rollup).
    """
    media = attach_binary_payload(t(spark, sf_dir, "documents"))
    feats = decode_media(media, fake=True)
    frames = sample_frames(feats, every_nth=_FRAME_NTH,
                           max_frames=_FRAME_MAX)
    return (
        frames.groupBy("media_type")
        .agg(F.count(F.lit(1)).alias("frames_sampled"),
             F.countDistinct("doc_id").alias("n_media"),
             F.max("frame_idx").alias("max_frame_idx"))
    )


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over the decoded media stream: letterbox
    scale + output dims per object (``multimodal.resize_spec``, target
    224), rolled up per media type — the arithmetic stage a real resize
    kernel applies, with the pixel work itself belonging to the codec's
    mapInPandas stage.

    Exactly oracle-checked: dims come from the stub codec's sha256
    bytes, the letterbox scale is one IEEE double division both engines
    compute bit-identically, and the emitted aggregates are INTEGER
    out-dims only (min/max/sum — no double accumulation, so no
    ordering sensitivity). Map-only until the 3-key rollup."""
    media = attach_binary_payload(t(spark, sf_dir, "documents"))
    feats = decode_media(media, fake=True)
    from hippo_claim_crossover_spark.multimodal import resize_spec
    rs = resize_spec(feats, target=224)
    return (
        rs.groupBy("media_type")
        .agg(F.count(F.lit(1)).alias("n_media"),
             F.min("out_width").alias("min_out_w"),
             F.max("out_width").alias("max_out_w"),
             F.sum("out_width").alias("sum_out_w"),
             F.max("out_height").alias("max_out_h"))
    )


ORACLE_MM_RESIZE = """
WITH f AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         sha256(text) AS dg
  FROM documents
), feat AS (
  SELECT media_type,
         16 + CAST(('0x' || substr(dg, 1, 2)) AS INTEGER) AS width,
         16 + CAST(('0x' || substr(dg, 3, 2)) AS INTEGER) AS height
  FROM f
), rs AS (
  SELECT media_type,
         greatest(1, CAST(floor(width * least(224.0 / width,
                                              224.0 / height))
                          AS INTEGER)) AS out_width,
         greatest(1, CAST(floor(height * least(224.0 / width,
                                               224.0 / height))
                          AS INTEGER)) AS out_height
  FROM feat
)
SELECT media_type, count(*) AS n_media,
       min(out_width) AS min_out_w,
       max(out_width) AS max_out_w,
       CAST(sum(out_width) AS BIGINT) AS sum_out_w,
       max(out_height) AS max_out_h
FROM rs GROUP BY media_type
"""


ORACLE_MM_FRAMES = f"""
WITH f AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         sha256(text) AS dg
  FROM documents
), feat AS (
  SELECT media_type,
         CASE WHEN media_type = 'image' THEN 1
              ELSE 1 + CAST(('0x' || substr(dg, 5, 2)) AS INTEGER) % 32
         END AS n_frames
  FROM f
), k AS (
  SELECT media_type, n_frames,
         least({_FRAME_MAX}, (n_frames - 1) // {_FRAME_NTH} + 1) AS n_samp
  FROM feat WHERE n_frames > 0
)
SELECT media_type,
       CAST(sum(n_samp) AS BIGINT) AS frames_sampled,
       count(*) AS n_media,
       CAST(max({_FRAME_NTH} * (n_samp - 1)) AS INTEGER) AS max_frame_idx
FROM k GROUP BY media_type
"""


SHARD_BYTES = 4096


def q_mm_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webdataset-style shard assignment: pack binary payloads into
    ~fixed-byte output shards per media type — the layout step before a
    training job reads media sequentially. Same shape as sequence
    packing, applied to bytes: a per-media-type running byte sum (one
    shuffle, each type packs independently — the shard key is what keeps
    a 100 TB pack parallel), then exact BIGINT div for the shard id and
    a per-shard summary. A row bigger than the shard budget still gets a
    shard (its own), which is the degenerate case the division handles
    for free."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    media = (F.when(F.col("doc_id") % 3 == 0, "image")
             .when(F.col("doc_id") % 3 == 1, "audio")
             .otherwise("video"))
    w = Window.partitionBy("media_type").orderBy("doc_id")
    staged = (
        d.select("doc_id", media.alias("media_type"),
                 F.octet_length(payload).cast("long").alias("n_bytes"))
        .withColumn("start_byte",
                    F.sum("n_bytes").over(w) - F.col("n_bytes"))
        .withColumn("shard_id", F.expr(f"start_byte div {SHARD_BYTES}"))
    )
    return (
        staged.groupBy("media_type", "shard_id")
        .agg(F.count(F.lit(1)).alias("n_items"),
             F.sum("n_bytes").alias("shard_bytes"),
             F.min("doc_id").alias("first_doc"),
             F.max("doc_id").alias("last_doc"))
    )


ORACLE_MM_SHARD = f"""
WITH staged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
), c AS (
  SELECT *,
         CAST(sum(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_bytes AS BIGINT) AS start_byte
  FROM staged
)
SELECT media_type, start_byte // {SHARD_BYTES} AS shard_id,
       count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY media_type, start_byte // {SHARD_BYTES}
"""


SPECS: dict[str, QuerySpec] = {
    "q_mm_meta": QuerySpec(q_mm_meta, ORACLE_MM_META,
                           "binary payload metadata"),
    "q_mm_binfile": QuerySpec(q_mm_binfile, ORACLE_MM_BINFILE,
                              "binaryFile source ingestion"),
    "q_mm_decode": QuerySpec(
        q_mm_decode, ORACLE_MM_DECODE,
        "mapInPandas stub decode pipeline (exact oracle: sha256-byte "
        "feature arithmetic reproduced in SQL)"),
    "q_mm_shard": QuerySpec(q_mm_shard, ORACLE_MM_SHARD,
                            "webdataset-style byte-budget shard packing"),
    "q_mm_frames": QuerySpec(
        q_mm_frames, ORACLE_MM_FRAMES,
        "every-Nth capped frame sampling over decoded media (exact "
        "integer-arithmetic oracle)"),
    "q_mm_resize": QuerySpec(
        q_mm_resize, ORACLE_MM_RESIZE,
        "letterbox resize planning over decoded media (integer-exact "
        "out-dims rollup)"),
}
