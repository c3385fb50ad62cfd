"""Property-based tests (SURVEY.md §5.5, hypothesis).

Each property pits a Spark operator against an independent pure-Python
recompute on randomized inputs — windows vs brute force, the MinHash
pipeline vs hashlib, as-of vs linear scan, SCD-0 invariants. Examples
are few (Spark round-trips cost ~1s each) but adversarially shrunk.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from utn_dataengineering_stockmarketpipeline_spark.functions.hashing import (
    M31,
    SHINGLE_B,
    perm_seeds,
)
from utn_dataengineering_stockmarketpipeline_spark.operators.asof import asof_join
from utn_dataengineering_stockmarketpipeline_spark.operators import dedup
from utn_dataengineering_stockmarketpipeline_spark.operators.scd import merge_append
from utn_dataengineering_stockmarketpipeline_spark.operators.transforms import (
    add_rolling_mean,
    normalize_stock_payload,
)
from utn_dataengineering_stockmarketpipeline_spark.schemas import STOCK_RAW
from utn_dataengineering_stockmarketpipeline_spark.sources.rest import (
    json_rows_to_df,
)

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_D0 = dt.date(2024, 1, 1)

# (ticker, day-offsets, closes): unique days per ticker by construction
bars_strategy = st.lists(
    st.tuples(
        st.sampled_from(["AAA", "BBB"]),
        st.lists(
            st.integers(min_value=0, max_value=90),
            min_size=1,
            max_size=40,
            unique=True,
        ),
        st.floats(min_value=0.01, max_value=1e5, allow_nan=False),
    ),
    min_size=1,
    max_size=2,
    unique_by=lambda t: t[0],
)


@SLOW
@given(bars_strategy)
def test_rolling_mean_matches_bruteforce(spark, groups):
    rows = []
    for ticker, offsets, base in groups:
        for i, off in enumerate(sorted(offsets)):
            rows.append(
                (_D0 + dt.timedelta(days=off), base + i * 0.5, ticker)
            )
    df = spark.createDataFrame(
        rows, "stock_date date, stock_close double, stock_ticker string"
    )
    got = {
        (r["stock_ticker"], r["stock_date"]): (
            r["stock_30daymean"],
            r["stock_dif_mean"],
        )
        for r in add_rolling_mean(df).collect()
    }
    by_ticker: dict[str, list] = {}
    for d, c, t in sorted(rows):
        by_ticker.setdefault(t, []).append((d, c))
    for t, series in by_ticker.items():
        for i, (d, c) in enumerate(series):
            window = [c2 for _, c2 in series[max(0, i - 29) : i + 1]]
            mean = sum(window) / len(window)
            gm, gd = got[(t, d)]
            assert gm == pytest.approx(mean, rel=1e-9)
            assert gd == pytest.approx(c - mean, rel=1e-9, abs=1e-9)


@SLOW
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab xyzq"), min_size=1, max_size=60
        ).filter(lambda s: s.strip()),
        min_size=1,
        max_size=6,
    )
)
def test_minhash_signature_matches_hashlib(spark, texts):
    """The full shingle→hash→perm→min pipeline vs a pure-Python oracle."""
    k, num_perms = 3, 4
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(num_perms)]
        for r in dedup.minhash_signatures(df, num_perms=num_perms).collect()
    }
    seeds = perm_seeds(num_perms)

    def fold(window: list[int]) -> int:
        acc = 0
        first = True
        for h in window:
            acc = h if first else (acc * SHINGLE_B + h) % M31
            first = False
        return acc

    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        th = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % M31
            for t in toks
        ]
        if len(th) <= k:
            hs = [fold(th)]
        else:
            hs = [fold(th[i : i + k]) for i in range(len(th) - k + 1)]
        want = [min((a * h + b) % M31 for h in hs) for a, b in seeds]
        assert got[doc_id] == want, f"doc {doc_id!r} ({text!r})"


@SLOW
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=15, unique=True),
    st.lists(st.integers(0, 60), min_size=1, max_size=15, unique=True),
)
def test_asof_join_matches_linear_scan(spark, left_days, right_days):
    left = spark.createDataFrame(
        [("K", _D0 + dt.timedelta(days=d), d) for d in left_days],
        "k string, t date, row_id int",
    )
    right = spark.createDataFrame(
        [("K", _D0 + dt.timedelta(days=d), float(d)) for d in right_days],
        "k string, rt date, v double",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", value_cols=["v"]
    )
    got = {r["row_id"]: r["v"] for r in out.collect()}
    for d in left_days:
        prior = [rd for rd in right_days if rd <= d]
        want = float(max(prior)) if prior else None
        assert got[d] == want


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.floats(1, 100, allow_nan=False)),
        min_size=1,
        max_size=30,
    )
)
def test_scd0_load_invariants(spark, tmp_path_factory, batch):
    """After any sequence split of any batch (with intra-batch dup days),
    the target holds exactly one row per distinct key and a second pass
    adds nothing."""
    target = str(tmp_path_factory.mktemp("scd") / "fact")
    rows = [
        {
            "date": (_D0 + dt.timedelta(days=d)).isoformat(),
            "open": p, "high": p, "low": p, "close": p,
            "adjusted_close": p, "volume": 1,
        }
        for d, p in batch
    ]
    mid = len(rows) // 2
    for part in (rows[:mid], rows[mid:]):
        norm = normalize_stock_payload(
            json_rows_to_df(spark, part, STOCK_RAW), "AAA"
        )
        merge_append(norm, target, "stock_key")

    out = spark.read.parquet(target)
    distinct_days = len({d for d, _ in batch})
    assert out.count() == distinct_days
    assert out.select("stock_key").distinct().count() == distinct_days
    # partition-column consistency: year(date) == stock_year etc.
    bad = out.filter(
        (F.year("stock_date") != F.col("stock_year"))
        | (F.month("stock_date") != F.col("stock_month"))
        | (F.dayofmonth("stock_date") != F.col("stock_day"))
    )
    assert bad.count() == 0
    # idempotent: full reload adds zero rows
    norm_all = normalize_stock_payload(
        json_rows_to_df(spark, rows, STOCK_RAW), "AAA"
    )
    assert merge_append(norm_all, target, "stock_key") == 0


def test_pii_scrub_counts_match_injections(spark):
    """Property: injecting k emails and m URLs into clean text yields
    exactly n_emails=k, n_urls=m, and scrubbing is idempotent."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        pii_scrub,
    )

    rows = []
    for i in range(30):
        k, m = i % 4, (i // 4) % 3
        base = f"doc {i} with plain words only"
        parts = [base]
        parts += [f"user{i}_{j}@example.com" for j in range(k)]
        parts += [f"https://site{i}.example/p/{j}" for j in range(m)]
        rows.append((i, k, m, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, k int, m int, text string")
    out = pii_scrub(df).collect()
    for r in out:
        assert r["n_emails"] == r["k"], r
        assert r["n_urls"] == r["m"], r
        assert "@" not in r["scrubbed"]
        assert "https://" not in r["scrubbed"]
    # idempotent: scrubbing scrubbed text finds nothing
    scrubbed = pii_scrub(df).select("doc_id", F.col("scrubbed").alias("text"))
    again = pii_scrub(scrubbed).collect()
    assert all(r["n_emails"] == 0 and r["n_urls"] == 0 for r in again)


def test_chunk_documents_covers_text_exactly(spark):
    """Chunks at stride intervals cover every char; starts are exact
    stride multiples; tail chunk is the remainder; empty/null emit
    nothing."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, None), (4, "abc"), (5, "abcd")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, size=4, stride=3).orderBy(
        "doc_id", "chunk_ix"
    ).collect()
    got = [(r["doc_id"], r["chunk_ix"], r["chunk_start"], r["chunk_text"])
           for r in rows]
    assert got == [
        (1, 0, 0, "abcd"), (1, 1, 3, "defg"), (1, 2, 6, "ghij"),
        (1, 3, 9, "j"),
        (4, 0, 0, "abc"),
        (5, 0, 0, "abcd"), (5, 1, 3, "d"),
    ]
    # reassembly: stride-prefix of every non-tail chunk concatenates
    # back to the original text
    texts = {1: "abcdefghij", 4: "abc", 5: "abcd"}
    for doc, text in texts.items():
        chunks = [c for d, _, _, c in got if d == doc]
        rebuilt = "".join(c[:3] for c in chunks[:-1]) + chunks[-1]
        assert rebuilt == text

    import pytest

    with pytest.raises(ValueError, match="positive"):
        chunk_documents(df, size=0, stride=3)


@SLOW
@given(
    st.lists(st.tuples(st.integers(-40, 40), st.integers(0, 15)),
             min_size=1, max_size=12),
    st.lists(st.tuples(st.integers(-40, 40), st.integers(0, 15)),
             min_size=1, max_size=12),
    st.integers(1, 20),
)
def test_interval_overlap_matches_bruteforce(spark, lspans, rspans, width):
    """For arbitrary (possibly negative, touching, nested) closed
    intervals and any bucket width, the bucketed plan emits exactly the
    brute-force overlap set, each pair once."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.asof import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(i, lo, lo + n) for i, (lo, n) in enumerate(lspans)],
        "lid int, llo int, lhi int",
    )
    right = spark.createDataFrame(
        [(i, lo, lo + n) for i, (lo, n) in enumerate(rspans)],
        "rid int, rlo int, rhi int",
    )
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", bucket_width=width
    )
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    want = sorted(
        (i, j)
        for i, (llo, ln) in enumerate(lspans)
        for j, (rlo, rn) in enumerate(rspans)
        if llo <= rlo + rn and rlo <= llo + ln
    )
    assert got == want


@given(
    vals=st.lists(st.integers(min_value=0, max_value=6),
                  min_size=1, max_size=60),
    n_buckets=st.integers(min_value=1, max_value=12),
)
@SLOW
def test_exact_ntile_and_rank_match_bruteforce(spark, vals, n_buckets):
    """The offset-rank machinery vs a pure-Python recompute: exact_ntile
    equals the NTILE closed form over the sorted order, exact_row_number
    equals the sorted position — ascending and descending, under heavy
    ties."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.windows import (
        exact_ntile,
        exact_row_number,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, v int")

    order = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(order)
    q, r = divmod(n, n_buckets)
    want_bucket = {}
    for rank0, (i, _) in enumerate(order):
        if q == 0:
            want_bucket[i] = rank0 + 1
        elif rank0 < r * (q + 1):
            want_bucket[i] = rank0 // (q + 1) + 1
        else:
            want_bucket[i] = r + (rank0 - r * (q + 1)) // q + 1
    got = {
        row["id"]: row["bucket"]
        for row in exact_ntile(df, "v", "id", n_buckets).collect()
    }
    assert got == want_bucket

    desc = sorted(rows, key=lambda t: (-t[1], t[0]))
    want_rn = {i: k + 1 for k, (i, _) in enumerate(desc)}
    got_rn = {
        row["id"]: row["rn"]
        for row in exact_row_number(
            df, "v", "id", descending=True
        ).collect()
    }
    assert got_rn == want_rn


# --- round-9 curation policies vs pure-Python recompute ---------------------

@SLOW
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta x1 y2 word token".split()),
            min_size=1, max_size=12,
        ),
        min_size=1, max_size=14,
    ),
    den=st.sampled_from([1, 2, 4]),
)
def test_token_budget_selection_matches_python_greedy(spark, docs, den):
    """The decomposed (per-score totals + boundary window) selection
    must equal the single-ordered-scan greedy on random corpora."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        token_budget_selection,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]
        for r in token_budget_selection(df, 1, den).collect()
    }

    def score(toks):
        alpha = sum(1 for t in toks if t.isalpha())
        return 2 * alpha - len(toks)

    total = sum(len(t) for t in docs)
    budget = total // den
    want, cum = set(), 0
    for i, toks in sorted(
        enumerate(docs), key=lambda it: (-score(it[1]), it[0])
    ):
        if cum + len(toks) <= budget:
            want.add(i)
            cum += len(toks)
        else:
            break  # greedy prefix: stop at the first non-fitting doc
    assert got == want


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=0, max_size=16,
    ),
    quality=st.lists(st.integers(0, 5), min_size=12, max_size=12),
)
def test_keep_best_is_argmax_per_component(spark, edges, quality):
    """keep_best must select exactly the (max quality, min id) member of
    every connected component of a random pair graph."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.dedup import (
        duplicate_clusters,
        keep_best_per_cluster,
    )

    n = 12
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "id_a long, id_b long",
    ).filter("id_a != id_b").distinct()
    clusters = duplicate_clusters(pairs, ids)
    qdf = spark.createDataFrame(
        list(enumerate(quality)), "doc_id long, quality long"
    )
    out = keep_best_per_cluster(clusters, qdf)
    kept = {r["doc_id"] for r in out.collect() if r["is_kept"]}

    # pure-python components
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)
    want = {
        min(members, key=lambda i: (-quality[i], i))
        for members in comps.values()
    }
    assert kept == want

@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=24),
        min_size=2, max_size=5,
    ),
)
def test_substring_scrub_matches_python_rewrite(spark, docs):
    """substring_scrub (hash k-grams → diagonal runs → in-row interval
    merge → positional token filter) must equal a literal string-level
    rewrite on random small-vocab corpora — every stage (62-bit gram
    identity, run detection, overlap merge, rebuild) in one property."""
    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_tokens_removed"])
        for r in dedup.substring_scrub(df, k=k, max_gram_freq=None).collect()
    }

    # literal k-grams → aligned diagonal runs → per-doc intervals
    grams: dict[tuple, list[tuple]] = {}
    for did, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            grams.setdefault(tuple(toks[i:i + k]), []).append((did, i))
    diag_hits: dict[tuple, set] = {}
    for occ in grams.values():
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    diag_hits.setdefault((da, db, pa - pb), set()).add(pa)
    intervals: dict[int, list[tuple]] = {}
    for (da, db, diag), poss in diag_hits.items():
        run = sorted(poss)
        start = prev = run[0]
        spans = []
        for p in run[1:]:
            if p == prev + 1:
                prev = p
                continue
            spans.append((start, prev))
            start = prev = p
        spans.append((start, prev))
        for s_a, e_a in spans:
            s_b = s_a - diag
            intervals.setdefault(db, []).append(
                (s_b, s_b + (e_a - s_a + 1) + k - 1)
            )

    want = {}
    for did, toks in enumerate(docs):
        merged: list[list[int]] = []
        for s, e in sorted(intervals.get(did, [])):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        kept = [
            t for i, t in enumerate(toks)
            if not any(s <= i < e for s, e in merged)
        ]
        want[did] = (
            " ".join(kept) if merged else " ".join(toks),
            len(merged),
            sum(e - s for s, e in merged),
        )
    assert got == want

@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),  # label
            st.lists(
                st.floats(-1, 1, allow_nan=False, width=64),
                min_size=4, max_size=4,
            ),
        ),
        min_size=1, max_size=12,
    ),
)
def test_embedding_outliers_match_integer_bruteforce(spark, rows):
    """embedding_outliers' pure-int64 pipeline (micro-unit quantize →
    per-dim group sums → floor-div centroid → squared-distance BIGINT
    rank) must equal the same arithmetic done one row at a time in
    Python — no float ever decides an order, so the match is exact."""
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators.similarity import (
        embedding_outliers,
    )

    data = [(i, vec, lab) for i, (lab, vec) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>, label int"
    )
    got = {
        (r["label"], r["outlier_rank"]): r["vec_id"]
        for r in embedding_outliers(df).collect()
    }

    q = {i: [math.floor(x * 1e6 + 0.5) for x in vec] for i, vec, _ in data}
    groups: dict[int, list[int]] = {}
    for i, _, lab in data:
        groups.setdefault(lab, []).append(i)
    want = {}
    for lab, ids in groups.items():
        n = len(ids)
        cent = [
            (2 * sum(q[i][d] for i in ids) + n) // (2 * n)
            for d in range(4)
        ]
        dist = {
            i: sum((q[i][d] - cent[d]) ** 2 for d in range(4))
            for i in ids
        }
        ranked = sorted(ids, key=lambda i: (-dist[i], i))[:5]
        for rank, i in enumerate(ranked, start=1):
            want[(lab, rank)] = i
    assert got == want


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=1,
        max_size=25,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
@SLOW
def test_skyline_matches_dominance_bruteforce(spark, pts, parts):
    """skyline_2d == the O(n²) dominance definition, for any point
    multiset (heavy coordinate ties by construction: values in [0,8])
    and any partitioning."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skyline import (
        skyline_2d,
    )

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "id long, x double, y double"
    ).repartition(parts)
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    brute = sorted(
        i
        for i, x, y in rows
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for _, bx, by in rows
        )
    )
    assert got == brute


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=2,
        max_size=30,
    ).filter(lambda rs: len({g for g, _ in rs}) >= 2),
)
@SLOW
def test_ks_drift_matches_two_sample_definition(spark, rows):
    """ks_drift == the textbook sup-norm two-sample statistic for every
    group-vs-rest split of any value multiset."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        ks_drift,
    )

    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: r for r in ks_drift(df, "n_chars", "source").collect()}
    vals = sorted({v for _, v in rows})
    for g in {s for s, _ in rows}:
        gv = [v for s, v in rows if s == g]
        rv = [v for s, v in rows if s != g]
        if not rv:
            continue  # single-group split: n_rest = 0, ks undefined
        num = max(
            abs(
                sum(1 for x in gv if x <= t) * len(rv)
                - sum(1 for x in rv if x <= t) * len(gv)
            )
            for t in vals
        )
        assert int(got[g].ks_num) == num
        assert int(got[g].ks_ppm) == num * 1_000_000 // (len(gv) * len(rv))


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=1, max_size=40, unique=True),
    n_shards=st.integers(min_value=1, max_value=6),
)
@SLOW
def test_shard_assignment_matches_hashlib(spark, ids, n_shards):
    """shard/position == an independent hashlib recompute of the
    md5(seed:id) order statistic, for any id set and shard count."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.text import (
        shard_assignment,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.shard, r.position)
        for r in shard_assignment(df, n_shards=n_shards).collect()
    }

    def key(i):
        return int(hashlib.md5(f"shard-42:{i}".encode()).hexdigest()[:15], 16)

    want = {}
    by_shard: dict[int, list] = {}
    for i in ids:
        by_shard.setdefault(key(i) % n_shards, []).append(i)
    for shard, members in by_shard.items():
        members.sort(key=lambda i: (key(i), i))
        for pos, i in enumerate(members, start=1):
            want[i] = (shard, pos)
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    series=st.lists(
        st.tuples(
            st.sampled_from(["T1", "T2"]),
            st.lists(
                st.floats(min_value=1.0, max_value=500.0,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=25,
            ),
        ),
        min_size=1, max_size=2, unique_by=lambda t: t[0],
    )
)
def test_risk_metrics_match_bruteforce(spark, series):
    """risk.var_cvar / sharpe / longest_positive_streak == plain-Python
    brute force on arbitrary per-ticker price series (same ppm
    quantization on both sides)."""
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    rows = []
    for ticker, prices in series:
        for i, px in enumerate(prices):
            rows.append((ticker, dt.date(2024, 1, 1) + dt.timedelta(days=i), px))
    prices_df = spark.createDataFrame(
        rows, ["stock_ticker", "stock_date", "stock_close"]
    )
    rets_df = risk.returns_ppm(prices_df)

    # brute force, mirroring the ppm quantization
    brute = {}
    for ticker, prices in series:
        rets = [
            int(round((prices[i] / prices[i - 1] - 1) * 1e6))
            for i in range(1, len(prices))
        ]
        brute[ticker] = rets

    # VaR / CVaR
    got = {r["stock_ticker"]: r for r in risk.var_cvar(rets_df).collect()}
    for ticker, rets in brute.items():
        n = len(rets)
        k = max(1, math.ceil(n * 0.05))
        tail = sorted(rets)[:k]
        r = got[ticker]
        assert r["n_days"] == n
        assert r["var95_ppm"] == sorted(rets)[k - 1]
        assert abs(r["cvar95_ppm"] - sum(tail) / k) < 1e-9

    # Sharpe
    got_s = {r["stock_ticker"]: r for r in risk.sharpe(rets_df).collect()}
    for ticker, rets in brute.items():
        n = len(rets)
        s, q = float(sum(rets)), float(sum(x * x for x in rets))
        if n < 2:
            assert ticker not in got_s
            continue
        var = (q - (s * s) / n) / (n - 1)
        if var <= 0:
            assert ticker not in got_s
            continue
        r = got_s[ticker]
        # compare to the UNROUNDED brute value within the 6dp rounding
        # quantum: python round() is banker's, the engines' ROUND is
        # half-up, and hypothesis finds exact .5 boundaries where they
        # legitimately differ (engine-vs-engine parity is the oracle
        # test's job; this test checks the math)
        # quantum (5e-7) plus a few ulps: at 1e8+ ppm magnitudes the
        # 6dp-rounded decimal is not representable, so the stored
        # double deviates from the ideal rounding by up to ~ulp/2
        def tol(x):
            return 5.001e-7 + abs(x) * 3e-16

        mean, vol = s / n, math.sqrt(var)
        assert abs(r["mean_ppm"] - mean) <= tol(mean)
        assert abs(r["vol_ppm"] - vol) <= tol(vol)
        sharpe_b = mean / vol * math.sqrt(252.0)
        assert abs(r["sharpe_ann"] - sharpe_b) <= tol(sharpe_b)

    # longest positive streak (len + earliest start)
    got_k = {
        r["stock_ticker"]: r
        for r in risk.longest_positive_streak(rets_df).collect()
    }
    for ticker, rets in brute.items():
        best_len, best_start, cur, cur_start = 0, None, 0, None
        for i, v in enumerate(rets):
            if v > 0:
                if cur == 0:
                    cur_start = i
                cur += 1
                if cur > best_len:
                    best_len, best_start = cur, cur_start
            else:
                cur = 0
        if best_len == 0:
            assert ticker not in got_k
            continue
        r = got_k[ticker]
        assert r["streak_len"] == best_len
        # returns row i corresponds to price day i+1
        assert r["start_date"] == dt.date(2024, 1, 1) + dt.timedelta(
            days=best_start + 1
        )


def test_var_backtest_hand_series(spark):
    """var_backtest == plain-Python Kupiec exceedance counting on a
    deterministic series: VaR fitted on the pre-split half, violations
    counted strictly after, boundary return keeps its lag base across
    the split."""
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    # 41 closes -> 40 returns; split after day 20 (21st close), so the
    # day-21 return (base = day-20 close) belongs to the TEST side.
    closes = [100.0]
    for i in range(40):
        closes.append(closes[-1] * (1 + ((i * 37) % 21 - 10) / 1000.0))
    rows = [
        ("T", dt.date(2024, 1, 1) + dt.timedelta(days=i), c)
        for i, c in enumerate(closes)
    ]
    prices = spark.createDataFrame(
        rows, ["stock_ticker", "stock_date", "stock_close"]
    )
    split = dt.date(2024, 1, 1) + dt.timedelta(days=20)
    got = risk.var_backtest(prices, str(split), p=0.05).collect()
    assert len(got) == 1
    r = got[0]

    rets = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i),
         int(round((closes[i] / closes[i - 1] - 1) * 1e6)))
        for i in range(1, len(closes))
    ]
    est = [v for d, v in rets if d <= split]
    test = [v for d, v in rets if d > split]
    k = max(1, math.ceil(len(est) * 0.05))
    var = sorted(est)[k - 1]
    n_viol = sum(1 for v in test if v < var)
    assert r["n_est"] == len(est) == 20
    assert r["var_ppm"] == var
    assert r["n_test"] == len(test) == 20
    assert r["n_viol"] == n_viol
    assert r["viol_ppm"] == n_viol * 1_000_000 // len(test)
    assert r["expected_ppm"] == 50_000


def test_autocorr_and_underwater_match_bruteforce(spark):
    """autocorr_lag1 == textbook Pearson on (ret_t, ret_{t+1}) pairs;
    underwater_duration == brute-force longest below-peak run."""
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    closes = [100.0]
    for i in range(30):
        closes.append(closes[-1] * (1 + ((i * 29) % 17 - 8) / 1000.0))
    rows = [
        ("T", dt.date(2024, 1, 1) + dt.timedelta(days=i), c)
        for i, c in enumerate(closes)
    ]
    prices = spark.createDataFrame(
        rows, ["stock_ticker", "stock_date", "stock_close"]
    )

    rets = [
        int(round((closes[i] / closes[i - 1] - 1) * 1e6))
        for i in range(1, len(closes))
    ]
    xs, ys = rets[:-1], rets[1:]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx)
    ) / math.sqrt(n * syy - sy * sy)
    got = risk.autocorr_lag1(risk.returns_ppm(prices)).collect()
    assert len(got) == 1
    assert got[0]["n_pairs"] == n
    assert got[0]["autocorr"] == pytest.approx(want, rel=1e-12)

    # underwater: brute-force longest run of close < running peak
    peak, run, best, best_start, start = closes[0], 0, 0, None, None
    best_end = None
    for i, c in enumerate(closes):
        if c < peak:
            run += 1
            if start is None:
                start = i
            if run > best:
                best, best_start, best_end = run, start, i
        else:
            run, start = 0, None
        peak = max(peak, c)
    r = risk.underwater_duration(prices).collect()
    assert len(r) == 1
    assert r[0]["underwater_days"] == best
    assert r[0]["start_date"] == dt.date(2024, 1, 1) + dt.timedelta(
        days=best_start
    )
    assert r[0]["end_date"] == dt.date(2024, 1, 1) + dt.timedelta(
        days=best_end
    )


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7),
                  st.integers(1, 9)),
        min_size=1, max_size=14,
    ),
    st.sets(st.integers(0, 7), min_size=1, max_size=3),
)
def test_shortest_path_matches_bounded_bellman_ford(spark, edges, seeds):
    """shortest_path_weighted == textbook bounded Bellman-Ford on
    arbitrary small weighted graphs (parallel edges, self-loops,
    unreachable nodes, multi-seed)."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        shortest_path_weighted,
    )

    rounds = 3
    e_df = spark.createDataFrame(
        [(f"n{a}", f"n{b}", w) for a, b, w in edges], ["src", "dst", "w"]
    )
    s_df = spark.createDataFrame([(f"n{s}",) for s in seeds], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in shortest_path_weighted(e_df, s_df,
                                        max_rounds=rounds).collect()
    }

    # brute: undirected min-weight adjacency, k rounds of relaxation
    adj: dict = {}
    for a, b, w in edges:
        for x, y in ((a, b), (b, a)):
            adj[(x, y)] = min(adj.get((x, y), w), w)
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for (x, y), w in adj.items():
            if x in dist:
                nxt[y] = min(nxt.get(y, dist[x] + w), dist[x] + w)
        dist = nxt
    want = {f"n{k}": v for k, v in dist.items()}
    assert got == want


@SLOW
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=20,
    )
)
def test_triangle_stats_matches_bruteforce(spark, raw_edges):
    """triangle_stats == brute-force census on arbitrary small graphs
    (self-loops dropped, duplicates canonicalized)."""
    from itertools import combinations

    from utn_dataengineering_stockmarketpipeline_spark.operators.graph import (
        triangle_stats,
    )

    df = spark.createDataFrame(list(raw_edges), ["id_a", "id_b"])
    r = triangle_stats(df).collect()[0]

    es = {tuple(sorted(e)) for e in raw_edges if e[0] != e[1]}
    nodes = {v for e in es for v in e}
    deg = {v: sum(1 for e in es if v in e) for v in nodes}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1 for trio in combinations(sorted(nodes), 3)
        if {(trio[0], trio[1]), (trio[0], trio[2]),
            (trio[1], trio[2])} <= es
    )
    assert r["n_nodes"] == len(nodes)
    assert r["n_edges"] == len(es)
    assert r["n_wedges"] == wedges
    assert r["n_triangles"] == tris
    if wedges:
        assert r["clustering_ppm"] == 3 * tris * 1_000_000 // wedges
    else:
        assert r["clustering_ppm"] is None


@SLOW
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=-10_000, max_value=10_000),
        ),
        min_size=1, max_size=40,
    )
)
def test_winsorized_stats_matches_bruteforce(spark, rows):
    """winsorized_stats == plain-Python clipping at the discrete
    max(1, ceil(p*n)) order statistics for any group sizes and tie
    patterns (values are integral doubles, so DECIMAL sums are exact
    and the means compare exactly)."""
    import math

    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        winsorized_stats,
    )

    df = spark.createDataFrame(
        [(g, float(v), i) for i, (g, v) in enumerate(rows)],
        ["grp", "v", "tb"],
    )
    got = {
        r["grp"]: r
        for r in winsorized_stats(df, "v", "grp", tiebreak="tb").collect()
    }
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(float(v))
    for g, vals in by_g.items():
        n = len(vals)
        srt = sorted(vals)
        k_lo = max(1, math.ceil(n * 0.05))
        k_hi = max(1, math.ceil(n * 0.95))
        lo, hi = srt[k_lo - 1], srt[k_hi - 1]
        clipped = [min(max(v, lo), hi) for v in vals]
        r = got[g]
        assert r["n_rows"] == n
        assert r["p_lo_val"] == lo and r["p_hi_val"] == hi
        assert r["win_mean"] == pytest.approx(sum(clipped) / n, rel=1e-12)
        assert r["raw_mean"] == pytest.approx(sum(vals) / n, rel=1e-12)


@SLOW
@given(
    st.lists(st.integers(min_value=-30, max_value=40),
             min_size=1, max_size=60),
)
def test_cusum_matches_sequential_recurrence(spark, steps):
    """The window identity S_t = P_t - min(0, running-min P) == the
    textbook sequential recurrence S_t = max(0, S_{t-1} + x_t - k) for
    arbitrary return sequences, including the alarm and argmax dates."""
    from utn_dataengineering_stockmarketpipeline_spark.operators import risk

    k, h = 3, 25  # small units so hypothesis explores alarm crossings
    rows = [
        ("T", dt.date(2024, 1, 1) + dt.timedelta(days=i), int(x))
        for i, x in enumerate(steps)
    ]
    rets = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, ret_ppm long"
    )
    r = risk.cusum_alarms(rets, k_ppm=k, h_ppm=h).collect()[0]

    s, smax, max_i, alarm_i = 0, 0, 0, None
    svals = []
    for i, x in enumerate(steps):
        s = max(0, s + x - k)
        svals.append(s)
        if s > smax:
            smax, max_i = s, i
        if alarm_i is None and s > h:
            alarm_i = i
    # earliest date achieving the max (ties break earliest)
    max_i = svals.index(smax)
    assert r["n_days"] == len(steps)
    assert r["max_cusum_ppm"] == smax
    assert r["max_date"] == dt.date(2024, 1, 1) + dt.timedelta(days=max_i)
    want_alarm = (
        dt.date(2024, 1, 1) + dt.timedelta(days=alarm_i)
        if alarm_i is not None else None
    )
    assert r["first_alarm_date"] == want_alarm


# (source, values): 1-3 groups over a tiny tied-heavy value domain —
# ties and empty-rest cases are the adversarial surface of the
# counts-grid monitors
grid_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(
            st.integers(min_value=0, max_value=12),
            min_size=1,
            max_size=25,
        ),
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda t: t[0],
)


@SLOW
@given(grid_strategy)
def test_cusum_and_mann_whitney_match_bruteforce(spark, groups):
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        cusum_drift,
        mann_whitney_drift,
    )

    from test_r14_ops import _brute_cusum, _brute_mann_whitney

    rows = [(g, v) for g, vals in groups for v in vals]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got_c = {
        r.source: (r.n_docs, r.cusum_num, r.cusum_ppm, r.alarm_value)
        for r in cusum_drift(df, "n_chars", "source").collect()
    }
    assert got_c == _brute_cusum(rows)
    got_m = {
        r.source: (r.n_docs, r.u2, r.rank_biserial_ppm)
        for r in mann_whitney_drift(df, "n_chars", "source").collect()
    }
    assert got_m == _brute_mann_whitney(rows)
    # invariants: 0 <= cusum_num <= 2*n_g*n_rest; |rank-biserial| <= 1e6
    n = len(rows)
    for g, (n_g, num, ppm, _alarm) in got_c.items():
        assert 0 <= num <= 2 * n_g * (n - n_g)
    for g, (_n_g, _u2, rb) in got_m.items():
        assert -1_000_000 <= rb <= 1_000_000


@SLOW
@given(bars_strategy)
def test_mann_kendall_matches_bruteforce_property(spark, groups):
    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        mann_kendall,
    )

    rows = []
    want = {}
    for ticker, offsets, base in groups:
        vals = [
            round((base + (i * 7919 % 13) * 0.37) * 100)
            for i in range(len(offsets))
        ]
        for off, vc in zip(sorted(offsets), vals):
            rows.append((ticker, _D0 + dt.timedelta(days=off), vc / 100))
        if len(vals) >= 2:
            s = sum(
                (1 if vals[j] > vals[i] else (-1 if vals[j] < vals[i] else 0))
                for i in range(len(vals))
                for j in range(i + 1, len(vals))
            )
            npairs = len(vals) * (len(vals) - 1) // 2
            num = s * 1_000_000
            tau = num // npairs if num >= 0 else -((-num) // npairs)
            want[ticker] = (len(vals), s, tau)
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    got = {
        r.stock_ticker: (r.n_obs, r.s_stat, r.tau_a_ppm)
        for r in mann_kendall(df).collect()
    }
    assert got == want
    for _n, s, tau in got.values():
        assert -1_000_000 <= tau <= 1_000_000


@SLOW
@given(grid_strategy)
def test_jonckheere_matches_bruteforce_property(spark, groups):
    from utn_dataengineering_stockmarketpipeline_spark.operators.skew import (
        jonckheere_trend,
    )

    rows = [(g, v) for g, vals in groups for v in vals]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = [
        (r.n_groups, r.n_obs, r.j2, r.ej2, r.trend_ppm)
        for r in jonckheere_trend(df, "n_chars", "source").collect()
    ]
    gs = sorted({g for g, _ in rows})
    j2 = ej2 = 0
    for i, a in enumerate(gs):
        for b in gs[i + 1:]:
            xs = [v for g, v in rows if g == a]
            ys = [v for g, v in rows if g == b]
            ej2 += len(xs) * len(ys)
            j2 += sum(
                2 if y > x else (1 if y == x else 0)
                for x in xs
                for y in ys
            )
    if ej2 == 0:
        assert got == []
    else:
        num = (j2 - ej2) * 1_000_000
        ppm = num // ej2 if num >= 0 else -((-num) // ej2)
        assert got == [(len(gs), len(rows), j2, ej2, ppm)]
        # bounded effect: j2 in [0, 2*ej2] -> trend_ppm in [-1e6, 1e6]
        assert -1_000_000 <= got[0][4] <= 1_000_000


@SLOW
@given(
    seqs=st.lists(
        st.lists(st.integers(min_value=1, max_value=6), min_size=2,
                 max_size=40),
        min_size=1, max_size=4,
    )
)
def test_runs_test_matches_bruteforce_property(spark, seqs):
    """Wald-Wolfowitz on random small-alphabet sequences (heavy ties
    exercise the tie-drop rule) vs a pure-Python replay."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        runs_test,
    )

    rows = [
        (f"T{i}", _D0 + dt.timedelta(days=j), float(v))
        for i, seq in enumerate(seqs)
        for j, v in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    got = {
        r["stock_ticker"]: (r["n_up"], r["n_down"], r["n_runs"],
                            r["runs_excess_ppm"])
        for r in runs_test(df).collect()
    }
    expected = {}
    for i, seq in enumerate(seqs):
        cents = [round(v * 100) for v in seq]
        signs = [
            1 if b > a else -1
            for a, b in zip(cents, cents[1:]) if b != a
        ]
        u = sum(1 for s in signs if s > 0)
        d = len(signs) - u
        if u == 0 or d == 0:
            continue
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        n = u + d
        num = (runs * n - n - 2 * u * d) * 1_000_000
        den = n + 2 * u * d
        ppm = abs(num) // den * (1 if num >= 0 else -1)
        expected[f"T{i}"] = (u, d, runs, ppm)
    assert got == expected


@SLOW
@given(
    seqs=st.lists(
        st.lists(st.integers(min_value=1, max_value=6), min_size=1,
                 max_size=40),
        min_size=1, max_size=4,
    )
)
def test_turning_points_matches_bruteforce_property(spark, seqs):
    """Strict local extrema on random tied sequences vs pure Python."""
    from utn_dataengineering_stockmarketpipeline_spark.operators.risk import (
        turning_points,
    )

    rows = [
        (f"T{i}", _D0 + dt.timedelta(days=j), float(v))
        for i, seq in enumerate(seqs)
        for j, v in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "stock_ticker string, stock_date date, stock_close double"
    )
    got = {
        r["stock_ticker"]: (r["n_obs"], r["n_turning"],
                            r["turning_excess_ppm"])
        for r in turning_points(df).collect()
    }
    expected = {}
    for i, seq in enumerate(seqs):
        n = len(seq)
        if n < 3:
            continue
        cents = [round(v * 100) for v in seq]
        tp = sum(
            1
            for k in range(1, n - 1)
            if (cents[k - 1] < cents[k] > cents[k + 1])
            or (cents[k - 1] > cents[k] < cents[k + 1])
        )
        num = (3 * tp - 2 * (n - 2)) * 1_000_000
        den = 2 * (n - 2)
        ppm = abs(num) // den * (1 if num >= 0 else -1)
        expected[f"T{i}"] = (n, tp, ppm)
    assert got == expected
