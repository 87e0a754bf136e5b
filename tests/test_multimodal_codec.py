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
