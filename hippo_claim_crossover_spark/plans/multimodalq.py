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
    typed features, aggregated per media type. Rows-only check (the fake
    decoder is deterministic but not SQL-expressible)."""
    media = attach_binary_payload(t(spark, sf_dir, "documents"))
    feats = decode_media(media, fake=True)
    return (
        feats.groupBy("media_type")
        .agg(F.count(F.lit(1)).alias("n_media"),
             F.sum("n_bytes").alias("total_bytes"),
             F.max("width").alias("max_width"),
             F.max("n_frames").alias("max_frames"))
    )


SPECS: dict[str, QuerySpec] = {
    "q_mm_meta": QuerySpec(q_mm_meta, ORACLE_MM_META,
                           "binary payload metadata"),
    "q_mm_binfile": QuerySpec(q_mm_binfile, ORACLE_MM_BINFILE,
                              "binaryFile source ingestion"),
    "q_mm_decode": QuerySpec(q_mm_decode, None,
                             "mapInPandas stub decode pipeline"),
}
