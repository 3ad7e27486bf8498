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


def test_sample_frames_fanout(spark, sf_dir):
    from hippo_claim_crossover_spark.io import load_table
    from hippo_claim_crossover_spark.multimodal import (
        attach_binary_payload,
        decode_media,
        sample_frames,
    )

    feats = decode_media(
        attach_binary_payload(load_table(spark, sf_dir, "documents")),
        fake=True)
    frames = sample_frames(feats, every_nth=8, max_frames=4)
    rows = frames.collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc, idxs in by_doc.items():
        assert idxs[0] == 0                       # always frame 0
        assert len(idxs) <= 4                     # cap respected
        assert all(i % 8 == 0 for i in idxs)      # stride respected
    # images decode to a single frame -> exactly one sampled frame
    img = [r for r in rows if r["media_type"] == "image"]
    assert img and all(r["frame_idx"] == 0 for r in img)


def test_resize_spec_letterbox(spark, sf_dir):
    from hippo_claim_crossover_spark.io import load_table
    from hippo_claim_crossover_spark.multimodal import (
        attach_binary_payload,
        decode_media,
        resize_spec,
    )

    feats = decode_media(
        attach_binary_payload(load_table(spark, sf_dir, "documents")),
        fake=True)
    import math

    out = resize_spec(feats, target=224).collect()
    for r in out:
        assert max(r["out_width"], r["out_height"]) <= 224
        # letterbox arithmetic: one true scale applied to both dims
        s = min(224 / r["width"], 224 / r["height"])
        assert r["out_width"] == max(1, math.floor(r["width"] * s))
        assert r["out_height"] == max(1, math.floor(r["height"] * s))


def test_binaryfile_roundtrip(spark, tmp_path):
    """binaryFile source: files written on disk come back one row per
    file with the exact bytes in `content` and size in `length`, honoring
    the path glob (non-.bin files excluded) and recursive lookup."""
    from hippo_claim_crossover_spark.multimodal import read_binary_files

    sub = tmp_path / "nested"
    sub.mkdir()
    (tmp_path / "doc_1.bin").write_bytes(b"alpha")
    (sub / "doc_2.bin").write_bytes(b"beta-longer")
    (tmp_path / "ignore.txt").write_bytes(b"nope")

    rows = {r["path"].rsplit("/", 1)[-1]: r
            for r in read_binary_files(spark, str(tmp_path)).collect()}
    assert set(rows) == {"doc_1.bin", "doc_2.bin"}
    assert bytes(rows["doc_1.bin"]["content"]) == b"alpha"
    assert rows["doc_2.bin"]["length"] == len(b"beta-longer")


def test_binary_fixture_bounded_and_idempotent(spark, sf_dir, tmp_path):
    from hippo_claim_crossover_spark.io import load_table
    from hippo_claim_crossover_spark.multimodal import (
        materialize_binary_fixture,
        read_binary_files,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "bin")
    materialize_binary_fixture(docs, out, max_files=7)
    materialize_binary_fixture(docs, out, max_files=7)  # overwrite, no dup
    got = read_binary_files(spark, out).count()
    want = docs.where("doc_id < 7").count()
    assert got == want
