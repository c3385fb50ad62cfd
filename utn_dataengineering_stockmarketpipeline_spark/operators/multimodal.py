"""Multimodal column operators (SURVEY.md §7 phase 5).

Images/audio/video ride as opaque ``binary`` columns with a typed
``meta`` struct (schemas.MULTIMODAL). The Spark-side plumbing — schema,
partition-friendly batch shape, Arrow-batched ``mapInPandas`` UDF
signatures — is real and tested; the actual codec step is STUBBED
(this container has no image/audio libraries): ``decode_features``
computes deterministic fake features from the bytes themselves, and
``decode_image`` raises ``NotImplementedError`` where PIL/ffmpeg would
plug in.

Scale notes: payloads dominate row size, so operators that don't need
bytes must prune the column (Parquet columnar layout makes that free —
never ``select('*')`` before a metadata-only stage). ``mapInPandas``
processes Arrow record batches; ``spark.sql.execution.arrow
.maxRecordsPerBatch`` bounds peak memory when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# feat_* are scalar columns (not array<double>): downstream consumers —
# including the driver's pandas canonicalizer — can sort/hash scalars,
# and Parquet stores them as plain double columns with min/max stats.
N_FEATURES = 4
FEATURE_SCHEMA = (
    "asset_id long, modality string, n_bytes long, sha_prefix string, "
    + ", ".join(f"feat_{i} double" for i in range(N_FEATURES))
)


def decode_image(payload: bytes) -> object:
    """Real codec hook — requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; wire it in here in production"
    )


def _fake_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in for an encoder: n doubles from the MD5."""
    h = hashlib.md5(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)]


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The production version swaps ``_fake_features`` for a real
    decode+encode; everything else (column pruning, batch iteration,
    output schema) is the deployable shape.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = payloads.map(_fake_features)
            out = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": payloads.map(len),
                "sha_prefix": payloads.map(
                    lambda b: hashlib.sha256(b).hexdigest()[:12]
                ),
            }
            for i in range(N_FEATURES):
                out[f"feat_{i}"] = feats.map(lambda f, i=i: f[i])
            yield pd.DataFrame(out)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_plan(
    assets: DataFrame, max_width: int = 224, max_height: int = 224
) -> DataFrame:
    """Image resize, split the scale-correct way: the TARGET geometry is
    pure metadata math (JVM-side, zero decode), and only rows that
    actually shrink proceed to the decode stage (``extract_features``
    with a real codec wired in). Aspect ratio preserved; payload column
    untouched so Parquet never materializes bytes for skipped rows.
    """
    scale = F.least(
        F.lit(float(max_width)) / F.col("meta.width"),
        F.lit(float(max_height)) / F.col("meta.height"),
        F.lit(1.0),
    )
    return assets.filter(F.col("modality") == "image").select(
        "asset_id",
        "meta",
        "payload",
        F.round(F.col("meta.width") * scale).cast("int").alias("target_width"),
        F.round(F.col("meta.height") * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode.

    Expands (asset, duration) into frame timestamps JVM-side with
    ``sequence`` — the expensive decode stays in ``extract_features``
    over the per-frame rows; this stage is pure metadata and shuffles
    nothing.
    """
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_assets(documents: DataFrame) -> DataFrame:
    """Build a MULTIMODAL-shaped table from documents (the container has
    no real media): text bytes become the payload, metadata derives
    deterministically. Gives the multimodal operators a real
    distributed input with the right schema."""
    mod = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        mod.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-"), mod).alias("mime"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).alias("duration_ms"),
        ).alias("meta"),
    )
