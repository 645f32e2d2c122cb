from __future__ import annotations

import hashlib

import pytest

from spark_ifs_spark.operators import multimodal


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(0, "hello world"), (1, "spark engine"), (2, "x")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    return multimodal.attach_fake_payloads(docs, "doc_id", "text"), rows


def test_payload_schema(payloads):
    df, _ = payloads
    types = dict(df.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct")


def test_extract_features_with_fake_decoder(payloads):
    df, rows = payloads
    out = {
        r["id"]: r
        for r in multimodal.extract_image_features(
            df, "doc_id", "payload", decode_fn=multimodal.fake_image_decoder
        ).collect()
    }
    for doc_id, text in rows:
        r = out[str(doc_id)]
        data = text.encode()
        assert r["width"] == 1 + data[0] % 64
        assert r["height"] == 1 + data[-1] % 64
        assert r["channels"] == 3
        assert r["feature_hash"] == hashlib.md5(data).hexdigest()


def test_default_decoder_is_stub(payloads):
    df, _ = payloads
    with pytest.raises(Exception) as ei:
        multimodal.extract_image_features(df, "doc_id", "payload").collect()
    assert "NotImplementedError" in str(ei.value) or "image" in str(ei.value)


def test_repartition_for_payloads(payloads):
    df, _ = payloads
    out = multimodal.repartition_for_payloads(df, approx_total_mb=1024, target_partition_mb=128)
    assert out.rdd.getNumPartitions() == 8


def test_resize_images_plumbing(spark, sf_dir):
    from spark_ifs_spark.operators.multimodal import (
        attach_fake_payloads,
        fake_resizer,
        resize_images,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    payloads = attach_fake_payloads(docs, "doc_id", "text")
    out = resize_images(payloads, "doc_id", "payload", 8, 4, resize_fn=fake_resizer)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["payload"]) == 32 for r in rows)
    assert all(r["width"] == 8 and r["height"] == 4 for r in rows)


def test_resize_default_raises(spark, sf_dir):
    import pytest as _pytest

    from spark_ifs_spark.operators.multimodal import attach_fake_payloads, resize_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    payloads = attach_fake_payloads(docs, "doc_id", "text")
    with _pytest.raises(Exception, match="NotImplementedError|image library"):
        resize_images(payloads, "doc_id", "payload", 8, 8).collect()


def test_sample_frames_plumbing(spark, sf_dir):
    from spark_ifs_spark.operators.multimodal import (
        attach_fake_payloads,
        fake_frame_splitter,
        sample_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    payloads = attach_fake_payloads(docs, "doc_id", "text")
    out = sample_frames(payloads, "doc_id", "payload", num_frames=4, split_fn=fake_frame_splitter)
    rows = out.collect()
    assert len(rows) == 80  # 1 -> N expansion inside mapInPandas
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_id.values())


def test_audio_features_plumbing(spark, sf_dir):
    from spark_ifs_spark.operators.multimodal import (
        attach_fake_payloads,
        extract_audio_features,
        fake_audio_decoder,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    payloads = attach_fake_payloads(docs, "doc_id", "text")
    rows = extract_audio_features(
        payloads, "doc_id", "payload", decode_fn=fake_audio_decoder
    ).collect()
    assert len(rows) == 30
    assert all(r["sample_rate"] == 16000 for r in rows)
    assert all(r["duration_ms"] == int(r["n_samples"] * 1000 / 16000) for r in rows)
