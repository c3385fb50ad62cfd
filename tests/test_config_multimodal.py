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


def test_phash_identical_payloads_hamming_zero(spark):
    from pyspark.sql import functions as F

    assets = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again"),
            (3, "completely different content about spark partitions ok"),
        ],
        "asset_id long, t string",
    ).select("asset_id", F.encode("t", "UTF-8").alias("payload"))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.phash_near_pairs(assets).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_banding_is_exact_at_radius_one(spark):
    """Half-band candidate generation must find EVERY hamming<=1 pair
    the brute-force hash comparison finds (pigeonhole exactness)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    assets = multimodal.synthetic_assets(docs).filter(
        F.col("modality") == "image"
    )
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.phash_near_pairs(assets).collect()
    }
    hs = multimodal.image_phash(assets).collect()
    brute = {}
    for a in hs:
        for b in hs:
            if a["asset_id"] < b["asset_id"]:
                d = bin(a["phash"] ^ b["phash"]).count("1")
                if d <= 1:
                    brute[(a["asset_id"], b["asset_id"])] = d
    assert banded == brute


def test_phash_small_edit_small_distance(spark):
    """Perceptual property: a small local edit moves few pixels, so the
    hash distance stays far below a random pair's (~8 expected bits)."""
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    edited = base.replace("delta", "delXa", 1)
    assets = spark.createDataFrame(
        [(1, base), (2, edited)], "asset_id long, t string"
    ).select("asset_id", F.encode("t", "UTF-8").alias("payload"))
    hs = {r["asset_id"]: r["phash"]
          for r in multimodal.image_phash(assets).collect()}
    assert bin(hs[1] ^ hs[2]).count("1") <= 3
