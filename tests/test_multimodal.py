"""Multimodal-column operators: oracle parity for metadata-only ops,
pure-numpy reference check for the mapInPandas decode stage, and the
codec STUB gate."""

from __future__ import annotations

import numpy as np
import pytest

from bitcoin_olap_spark.operators import multimodal as MM

from .oracle import compare

SF_DIR = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def media(spark):
    from bitcoin_olap_spark.catalog import table

    return MM.attach_blob(table(spark, SF_DIR, "documents"), "doc_id", "text")


def test_attach_blob_schema(media):
    schema = dict((f.name, f.dataType.simpleString()) for f in media.schema)
    assert schema["blob"] == "binary"
    assert (
        schema["media_meta"]
        == "struct<format:string,n_bytes:bigint,n_frames:bigint>"
    )


@pytest.mark.parametrize("qid", ["mm_blob_meta", "mm_frame_sample"])
def test_oracle_parity(spark, duck, qid):
    from bitcoin_olap_spark.registry import all_oracles, all_queries

    sdf = all_queries()[qid](spark, SF_ORACLE)
    ddf = duck.execute(all_oracles()[qid]).df()
    compare(sdf, ddf, qid)


def test_decode_features_matches_numpy_reference(spark, media):
    out = MM.decode_features(media, "doc_id").toPandas().set_index("doc_id")
    src = media.select("doc_id", "blob").toPandas().set_index("doc_id")
    assert len(out) == len(src) > 0
    for doc_id in list(src.index[:25]):
        buf = np.frombuffer(src.loc[doc_id, "blob"], dtype=np.uint8)
        ref = np.bincount(buf >> 4, minlength=MM.N_FEATURE_BINS).astype(
            float
        )
        ref = ref / ref.sum() if ref.sum() else ref
        got = np.array(out.loc[doc_id, "features"])
        assert got.shape == (MM.N_FEATURE_BINS,)
        assert np.array_equal(got, ref)
        assert out.loc[doc_id, "n_bytes"] == len(buf)


def test_real_decoder_is_gated_stub(spark, media):
    with pytest.raises(Exception) as exc_info:
        MM.decode_features(media.limit(1), "doc_id", fake=None).collect()
    assert "STUB" in str(exc_info.value)


def test_frame_sample_bounds(media):
    from pyspark.sql import functions as F

    bad = (
        MM.frame_sample(media, "doc_id", every=10)
        .join(media, "doc_id")
        .filter(
            (F.col("frame_idx") < 0)
            | (F.col("frame_idx") >= F.col("media_meta.n_frames"))
            | (F.col("frame_idx") % 10 != 0)
        )
    )
    assert bad.count() == 0


def test_resize_payload_matches_python_reference(spark, media):
    out = (
        MM.resize_payload(media, "doc_id", target_bytes=64)
        .toPandas()
        .set_index("doc_id")
    )
    src = media.select("doc_id", "blob").toPandas().set_index("doc_id")
    assert len(out) == len(src)
    for doc_id in list(src.index[:25]):
        want = bytes(src.loc[doc_id, "blob"])[:64]
        got = bytes(out.loc[doc_id, "blob"])
        assert got == want
        meta = out.loc[doc_id, "media_meta"]
        assert meta["n_bytes"] == len(want)
        assert meta["n_frames"] == (len(want) % MM.MAX_FRAMES) + 1


def test_pipeline_mm_e2e_invariants(spark):
    """The multimodal curation DAG: audio dropped, payload budget
    respected, dedup arithmetic consistent with the raw partition."""
    from pyspark.sql import functions as F

    from bitcoin_olap_spark.catalog import table
    from bitcoin_olap_spark.registry import all_queries

    from .conftest import SF_ORACLE

    rows = {
        r["format"]: r
        for r in all_queries()["pipeline_mm_e2e"](spark, SF_ORACLE).collect()
    }
    assert set(rows) == {"image/png", "video/mp4"}
    raw = {
        r["format"]: r["n"]
        for r in table(spark, SF_ORACLE, "documents")
        .groupBy(
            F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("format")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for f, r in rows.items():
        assert r["n_docs"] + r["n_dupes_removed"] == raw[f]
        assert r["total_bytes"] <= 256 * r["n_docs"]
        assert 0 < r["sum_feat_l2"] <= r["n_docs"]
