"""Round 6 (VERDICT r5 task 6): the multimodal decode codec is a
feature flag — ``spark.cosmoz.multimodal.codec`` — whose DEFAULT is
the deterministic stub the DuckDB oracle checks; ``pil`` selects a
real Pillow decode when the library exists and refuses loudly when it
does not (no silent fake-frames fallback for a deployment that asked
for real decoding)."""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _run(spark, sf_dir):
    from cosmoz_data_pipeline_spark.plans import REGISTRY

    return REGISTRY["x_multimodal_decode_frames"]


def test_stub_is_default_and_oracle_checked(spark):
    from tools.compare import compare, duckdb_connection

    assert spark.conf.get("spark.cosmoz.multimodal.codec", "stub") == "stub"
    q = _run(spark, SF)
    con = duckdb_connection(SF)
    ok, msg = compare(q.run(spark, SF), q.oracle, con)
    assert ok, msg


def test_pil_codec_requires_pillow(spark):
    spark.conf.set("spark.cosmoz.multimodal.codec", "pil")
    try:
        if importlib.util.find_spec("PIL") is None:
            with pytest.raises(ImportError, match="stub"):
                _run(spark, SF).run(spark, SF)
        else:  # container gained Pillow: the real path must at least plan
            _run(spark, SF).run(spark, SF).schema
    finally:
        spark.conf.unset("spark.cosmoz.multimodal.codec")


def test_unknown_codec_rejected(spark):
    spark.conf.set("spark.cosmoz.multimodal.codec", "ffmpeg")
    try:
        with pytest.raises(ValueError, match="unknown multimodal codec"):
            _run(spark, SF).run(spark, SF)
    finally:
        spark.conf.unset("spark.cosmoz.multimodal.codec")


def test_ppm_codec_is_a_real_decode_matching_oracle(spark):
    """Round 7 (VERDICT r6 task 4): with codec=ppm the media column is
    a VALID binary P6 image and the mapInPandas stage genuinely parses
    it; the oracle predicts dimensions/bytes arithmetically, so this
    strict compare fails if the parser mis-tokenizes the header or
    mis-offsets the pixel payload."""
    from cosmoz_data_pipeline_spark.plans import REGISTRY
    from tools.compare import compare, duckdb_connection

    q = REGISTRY["x_multimodal_decode_ppm"]
    ok, msg = compare(q.run(spark, SF), q.oracle, duckdb_connection(SF))
    assert ok, msg


def test_ppm_flag_on_main_query_takes_real_path(spark):
    """codec=ppm through the feature flag returns the same rows as the
    dedicated tail query (one decode implementation, two entries)."""
    from cosmoz_data_pipeline_spark.plans import REGISTRY

    spark.conf.set("spark.cosmoz.multimodal.codec", "ppm")
    try:
        via_flag = REGISTRY["x_multimodal_decode_frames"].run(spark, SF)
        direct = REGISTRY["x_multimodal_decode_ppm"].run(spark, SF)
        assert via_flag.exceptAll(direct).count() == 0
        assert direct.exceptAll(via_flag).count() == 0
    finally:
        spark.conf.unset("spark.cosmoz.multimodal.codec")


def test_parse_p6_unit():
    from cosmoz_data_pipeline_spark.plans.catalog_ext import parse_p6

    pix = bytes(range(24))
    w, h, got = parse_p6(b"P6\n4 2\n255\n" + pix)
    assert (w, h, got) == (4, 2, pix)
    # whitespace/comment-tolerant header, per the PPM spec
    w, h, got = parse_p6(b"P6 # cmt\n# another\n 4\t2 \n255\n" + pix)
    assert (w, h) == (4, 2) and got == pix
    with pytest.raises(ValueError, match="magic"):
        parse_p6(b"P5\n4 2\n255\n" + pix)
    with pytest.raises(ValueError, match="maxval"):
        parse_p6(b"P6\n4 2\n65535\n" + pix * 2)
    with pytest.raises(ValueError, match="truncated"):
        parse_p6(b"P6\n4 2\n255\n" + pix[:-1])
    # the stub codec's 16 random md5 bytes must be REJECTED, not
    # silently decoded (the r6 ADVICE failure mode)
    import hashlib

    with pytest.raises(ValueError):
        parse_p6(hashlib.md5(b"doc text").digest())
