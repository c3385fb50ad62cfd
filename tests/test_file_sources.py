"""CSV / JSON-lines source round-trips: values survive both formats
byte-identically, malformed rows fail fast, and the bronze conversion
restores columnar scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from utn_dataengineering_stockmarketpipeline_spark.sources.files import (
    read_csv,
    read_jsonl,
    to_parquet_bronze,
)
from utn_dataengineering_stockmarketpipeline_spark.sources.parquet import load_table

from conftest import SF_SMOKE

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_csv_round_trip(spark, tmp_path):
    src = _docs(spark)
    path = str(tmp_path / "csv")
    src.write.option("header", "true").csv(path)
    back = read_csv(spark, path, DOC_SCHEMA)
    assert _same(src, back)


def test_jsonl_round_trip(spark, tmp_path):
    src = _docs(spark)
    path = str(tmp_path / "jsonl")
    src.write.json(path)
    back = read_jsonl(spark, path, DOC_SCHEMA)
    assert _same(src, back)


def test_csv_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("doc_id,lang,n_chars\n1,en,10\nnope,xx\n")
    with pytest.raises(Exception):
        read_csv(spark, str(p), DOC_SCHEMA).collect()


def test_bronze_conversion_round_trip(spark, tmp_path):
    src = _docs(spark)
    csv_path = str(tmp_path / "drop")
    src.write.option("header", "true").csv(csv_path)
    bronze = str(tmp_path / "bronze")
    to_parquet_bronze(read_csv(spark, csv_path, DOC_SCHEMA), bronze)
    back = spark.read.parquet(bronze)
    assert _same(src, back)
    # columnar payoff: a one-column projection reads one column
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.select("lang").explain("formatted")
    plan = buf.getvalue()
    start = plan.index("ReadSchema")
    line = plan[start : plan.index("\n", start)]
    assert "lang" in line and "n_chars" not in line


# --- training-shard export (sources/lake.write_training_shards) -------------

def test_training_shards_layout_and_determinism(spark, tmp_path):
    """One file per shard dir, content-hash shard assignment stable
    across re-exports and input partitioning, in-file sort order."""
    from pathlib import Path

    from utn_dataengineering_stockmarketpipeline_spark.sources.lake import (
        write_training_shards,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, n_shards=8)

    dirs = sorted(p.name for p in Path(out).iterdir() if p.name.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(8)]
    for d in dirs:
        files = [p for p in (Path(out) / d).glob("*.parquet")]
        assert len(files) == 1, d

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # membership matches the content hash for every row
    bad = back.filter(
        F.col("shard")
        != F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8)).cast("int")
    ).count()
    assert bad == 0
    # manifest totals match the written reality
    got = {r["shard"]: r["n_docs"] for r in manifest.collect()}
    real = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == real

    # in-file order: doc_id ascending within each shard file
    for d in dirs:
        pdf = spark.read.parquet(str(Path(out) / d)).select("doc_id").toPandas()
        assert list(pdf["doc_id"]) == sorted(pdf["doc_id"])

    # re-export from a differently-partitioned input: same membership
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs.repartition(13), out2, n_shards=8)
    a = {(r["doc_id"], r["shard"]) for r in spark.read.parquet(out).select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"]) for r in spark.read.parquet(out2).select("doc_id", "shard").collect()}
    assert a == b


def test_training_shards_max_records_splits_but_preserves_content(
    spark, tmp_path
):
    from pathlib import Path

    from utn_dataengineering_stockmarketpipeline_spark.sources.lake import (
        write_training_shards,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "capped")
    write_training_shards(docs, out, n_shards=4, max_records_per_file=5)
    shard0 = Path(out) / "shard=0"
    files = list(shard0.glob("*.parquet"))
    assert len(files) > 1  # the cap split the shard
    import pyarrow.parquet as pq

    assert all(pq.read_metadata(f).num_rows <= 5 for f in files)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()


def test_training_shards_seeded_shuffle_matches_shard_assignment(
    spark, tmp_path
):
    """shuffle_seed export: in-file order IS text.shard_assignment's
    (key, id) order, reruns are byte-identical, a new seed permutes."""
    from pathlib import Path

    from utn_dataengineering_stockmarketpipeline_spark.operators import text
    from utn_dataengineering_stockmarketpipeline_spark.sources.lake import (
        write_training_shards,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "shuffled")
    write_training_shards(docs, out, n_shards=4, shuffle_seed="epoch-0")

    expect: dict[int, list[int]] = {}
    for r in sorted(
        text.shard_assignment(docs, n_shards=4, seed="epoch-0").collect(),
        key=lambda r: (r.shard, r.position),
    ):
        expect.setdefault(r.shard, []).append(r.doc_id)
    for s, ids in expect.items():
        pdf = (
            spark.read.parquet(str(Path(out) / f"shard={s}"))
            .select("doc_id")
            .toPandas()
        )
        assert list(pdf["doc_id"]) == ids  # file order = assignment order
    # the key column itself must not leak into the files
    assert "__k" not in spark.read.parquet(out).columns

    out_rerun = str(tmp_path / "shuffled_rerun")
    write_training_shards(
        docs.repartition(7), out_rerun, n_shards=4, shuffle_seed="epoch-0"
    )
    for s in expect:
        a = spark.read.parquet(str(Path(out) / f"shard={s}")).select("doc_id").toPandas()
        b = spark.read.parquet(str(Path(out_rerun) / f"shard={s}")).select("doc_id").toPandas()
        assert list(a["doc_id"]) == list(b["doc_id"])

    out_e1 = str(tmp_path / "epoch1")
    write_training_shards(docs, out_e1, n_shards=4, shuffle_seed="epoch-1")
    flat0 = [i for s in sorted(expect) for i in expect[s]]
    flat1 = [
        r.doc_id
        for s in sorted(expect)
        for r in spark.read.parquet(str(Path(out_e1) / f"shard={s}"))
        .select("doc_id").collect()
    ]
    assert sorted(flat0) == sorted(flat1)  # same corpus
    assert flat0 != flat1  # different epoch permutation


def test_training_shards_rejects_sort_col_with_shuffle_seed(spark, tmp_path):
    import pytest

    from utn_dataengineering_stockmarketpipeline_spark.sources.lake import (
        write_training_shards,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError, match="conflict"):
        write_training_shards(
            docs, str(tmp_path / "x"), n_shards=2,
            sort_col="n_chars", shuffle_seed="epoch-0",
        )


def test_backfill_partitions_touches_only_incoming(spark, tmp_path):
    """Dynamic-partition backfill: rewriting one month replaces exactly
    that partition's rows and leaves every other partition byte-stable;
    a replay of the same backfill is idempotent."""
    from utn_dataengineering_stockmarketpipeline_spark.sources.lake import (
        backfill_partitions,
    )

    path = str(tmp_path / "lake")

    def month(y, m, vals):
        return spark.createDataFrame(
            [(f"T{i}", f"{y}-{m:02d}-0{1 + i % 5}", float(v), y, m)
             for i, v in enumerate(vals)],
            ["stock_ticker", "stock_date", "close", "stock_year",
             "stock_month"],
        )

    # seed: Jan + Feb
    month(2024, 1, [1, 2, 3]).write.mode("append").partitionBy(
        "stock_year", "stock_month"
    ).parquet(path)
    month(2024, 2, [10, 20]).write.mode("append").partitionBy(
        "stock_year", "stock_month"
    ).parquet(path)

    # backfill Feb with corrected values — Jan must survive untouched
    backfill_partitions(month(2024, 2, [77, 88, 99]), path)
    out = spark.read.parquet(path)
    jan = sorted(
        r["close"] for r in out.filter(F.col("stock_month") == 1).collect()
    )
    feb = sorted(
        r["close"] for r in out.filter(F.col("stock_month") == 2).collect()
    )
    assert jan == [1.0, 2.0, 3.0]
    assert feb == [77.0, 88.0, 99.0]

    # replay: same input -> same state (no duplicates, no loss)
    backfill_partitions(month(2024, 2, [77, 88, 99]), path)
    out2 = spark.read.parquet(path)
    assert out2.count() == 6
    assert sorted(
        r["close"] for r in out2.filter(F.col("stock_month") == 2).collect()
    ) == [77.0, 88.0, 99.0]


def test_write_observed_reports_inline_metrics(spark, tmp_path):
    """The Observation-API write audit: metrics computed BY the write
    job match an independent recount, including caller-supplied
    aggregates and null-partition-key counting."""
    from utn_dataengineering_stockmarketpipeline_spark.sources.lake import (
        write_observed,
    )

    path = str(tmp_path / "obs_lake")
    df = spark.createDataFrame(
        [("A", 2024, 1, 5.0), ("B", 2024, 1, 7.0), ("C", 2024, 2, 9.0),
         ("D", None, 2, 11.0)],
        ["stock_ticker", "stock_year", "stock_month", "close"],
    )
    got = write_observed(
        df, path, ["stock_year", "stock_month"],
        metrics={"total_close": F.sum(F.col("close").cast("decimal(18,2)"))},
    )
    assert got["n_rows"] == 4
    assert got["null_stock_year"] == 1
    assert got["null_stock_month"] == 0
    assert got["min_stock_year"] == 2024 and got["max_stock_year"] == 2024
    assert float(got["total_close"]) == 32.0
    # and the write really landed (null partition key -> HIVE default)
    assert spark.read.parquet(path).count() == 4
