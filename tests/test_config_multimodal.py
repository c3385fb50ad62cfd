"""Config/secret handling (S5/E3) and multimodal operator plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.operators import multimodal
from utn_dataengineering_stockmarketpipeline_spark.sources.config import (
    REDACTED,
    load_settings,
    redact,
)
from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import load_table

from conftest import SF_SMOKE


def test_settings_ini_and_env_override(tmp_path, monkeypatch):
    ini = tmp_path / "config.ini"
    ini.write_text(
        "[API]\nTOKEN = file-token\n[DB]\nhost = db.example\nuser = u\n"
    )
    s = load_settings(str(ini))
    assert s.api_token == "file-token"
    assert s.db["host"] == "db.example"

    monkeypatch.setenv("STOCKPIPE_API_TOKEN", "env-token")
    monkeypatch.setenv("STOCKPIPE_DB_HOST", "other.example")
    s = load_settings(str(ini))
    assert s.api_token == "env-token"  # env beats file
    assert s.db["host"] == "other.example"

    s = load_settings(None)  # no file at all still works
    assert s.api_base_url.startswith("https://")


def test_redaction_masks_secrets_only():
    out = redact({"api_token": "s3cret", "fmt": "json", "from": "2024-01-01"})
    assert out == {"api_token": REDACTED, "fmt": "json", "from": "2024-01-01"}
    assert redact({"api_token": ""}) == {"api_token": ""}  # empty stays


def test_resize_plan_geometry(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    assets = multimodal.synthetic_assets(docs)
    plan = multimodal.resize_plan(assets, max_width=100, max_height=100)
    rows = plan.collect()
    assert rows, "no image assets generated"
    for r in rows:
        w, h = r["meta"]["width"], r["meta"]["height"]
        tw, th = r["target_width"], r["target_height"]
        assert tw <= 100 and th <= 100
        if r["needs_resize"]:
            # aspect ratio preserved within rounding
            assert abs(tw / max(w, 1) - th / max(h, 1)) < 0.05 or min(w, h) < 20
        else:
            assert (tw, th) == (w, h)


def test_extract_features_deterministic_and_complete(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    assets = multimodal.synthetic_assets(docs)
    f1 = multimodal.extract_features(assets).collect()
    f2 = multimodal.extract_features(assets).collect()
    assert sorted(map(str, f1)) == sorted(map(str, f2))
    assert len(f1) == 50
    for r in f1:
        for i in range(multimodal.N_FEATURES):
            assert 0.0 <= r[f"feat_{i}"] < 1.0
        assert r["n_bytes"] > 0
