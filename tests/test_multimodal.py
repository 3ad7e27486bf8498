"""Multimodal plumbing tests: binary payload schema, deterministic stub
decode via mapInPandas, and the explicit NotImplementedError gate for real
codecs (SURVEY.md §2b multimodal mandate)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hippo_claim_crossover_spark.io import load_table
from hippo_claim_crossover_spark.multimodal import (
    attach_binary_payload,
    decode_media,
    _decode_one,
)


def test_payload_schema(spark, sf_dir):
    media = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    schema = {f.name: f.dataType for f in media.schema.fields}
    assert isinstance(schema["payload"], T.BinaryType)
    assert isinstance(schema["meta"], T.StructType)


def test_decode_is_deterministic(spark, sf_dir):
    media = attach_binary_payload(
        load_table(spark, sf_dir, "documents").limit(30))
    a = sorted(decode_media(media, fake=True).collect())
    b = sorted(decode_media(media, fake=True).collect())
    assert a == b
    for row in a:
        assert row["width"] >= 16 and row["height"] >= 16
        assert row["n_bytes"] > 0
        if row["media_type"] == "image":
            assert row["n_frames"] == 1
        else:
            assert row["n_frames"] >= 1


def test_real_codec_is_gated():
    with pytest.raises(NotImplementedError):
        _decode_one(b"payload", "image", fake=False)
