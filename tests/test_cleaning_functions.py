"""Unit + property tests for the cleaner parsers (SURVEY §2.8 F4-F8, §5.2) —
the reference's highest-risk string logic (data-cleaner/cleaner.py:42-106)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from job_datapipeline_spark.functions import cleaning as C


def _one(spark, expr, value: str | None):
    row = spark.createDataFrame([(value,)], "v string").select(expr(F.col("v")).alias("out")).first()
    return row["out"]


def _pair(spark, expr, value: str | None):
    lo, hi = expr(F.col("v"))
    row = spark.createDataFrame([(value,)], "v string").select(lo.alias("lo"), hi.alias("hi")).first()
    return row["lo"], row["hi"]


def test_company_size_range(spark):
    assert _pair(spark, C.parse_company_size, "1001 to 5000 Employees") == (1001, 5000)


def test_company_size_plus(spark):
    # '10000+ Employees' -> (10000, 10000), cleaner.py:98
    assert _pair(spark, C.parse_company_size, "10000+ Employees") == (10000, 10000)


def test_company_size_garbage_is_null(spark):
    assert _pair(spark, C.parse_company_size, "Unknown") == (None, None)


def test_salary_range_gbp(spark):
    lo, hi = _pair(spark, lambda c: C.parse_salary_bounds(c), "£25,000 - £35,000 (Employer Est.)")
    assert (lo, hi) == (25000, 35000)


def test_salary_single_value_min_eq_max(spark):
    # single value => min == max (cleaner.py:53,72 [0] vs [-1])
    lo, hi = _pair(spark, lambda c: C.parse_salary_bounds(c), "$55,000 (Employer Est.)")
    assert (lo, hi) == (55000, 55000)


def test_salary_per_hour_annualized(spark):
    # 8 h/day * 261 workdays (cleaner.py:56-58): $20/h -> 41760
    lo, hi = _pair(spark, lambda c: C.parse_salary_bounds(c), "$20 Per Hour (Employer Est.)")
    assert (lo, hi) == (20 * 8 * 261, 20 * 8 * 261)


def test_salary_k_suffix(spark):
    lo, hi = _pair(spark, lambda c: C.parse_salary_bounds(c), "$25K - $35K (Employer Est.)")
    assert (lo, hi) == (25000, 35000)


def test_salary_currency_symbols(spark):
    assert _one(spark, C.salary_currency, "£25,000") == "GBP"
    assert _one(spark, C.salary_currency, "€30,000 - €40,000") == "EUR"
    assert _one(spark, C.salary_currency, "$55,000") == "USD"
    assert _one(spark, C.salary_currency, "55,000") == "USD"  # no symbol -> USD


def test_rating_split(spark):
    name, rating = C.split_rating_from_name(F.col("v"))
    row = (
        spark.createDataFrame([("Acme 4.5★",), ("NoRating Inc",)], "v string")
        .select(name.alias("n"), rating.alias("r"))
        .collect()
    )
    assert (row[0]["n"], row[0]["r"]) == ("Acme ", 4.5)
    assert (row[1]["n"], row[1]["r"]) == ("NoRating Inc", None)


def test_na_sentinels(spark):
    vals = ["N/A", "", "Unknown", "unknown", "real value"]
    out = (
        spark.createDataFrame([(v,) for v in vals], "v string")
        .select(C.na_to_null(F.col("v")).alias("out"))
        .collect()
    )
    assert [r["out"] for r in out] == [None, None, None, None, "real value"]


def test_normalize_url(spark):
    assert _one(spark, C.normalize_url, "example.com/x") == "https://example.com/x"
    assert _one(spark, C.normalize_url, "http://example.com") == "http://example.com"
    assert _one(spark, C.normalize_url, "https://example.com") == "https://example.com"


def test_strip_digits(spark):
    assert _one(spark, C.strip_digits, "7,764 Jobs") == "7764"


def test_job_position_from_filename(spark):
    got = _one(spark, C.job_position_from_filename, "s3://b/17-08-2021data-scientist-remote.csv")
    assert got == "data scientist"


def test_deterministic_job_id_stable(spark):
    a = _one(spark, C.deterministic_job_id, "data scientist")
    b = _one(spark, C.deterministic_job_id, "data scientist")
    c = _one(spark, C.deterministic_job_id, "data engineer")
    assert a == b and a != c and len(a) == 32


@settings(max_examples=20, deadline=None)
@given(
    lo=st.integers(min_value=1, max_value=400_000),
    hi=st.integers(min_value=1, max_value=400_000),
    sym=st.sampled_from(["£", "$", "€", ""]),
)
def test_salary_range_property(spark, lo, hi, sym):
    """Any '<sym>L - <sym>H' range parses to (L, H)."""
    raw = f"{sym}{lo:,} - {sym}{hi:,}"
    got_lo, got_hi = _pair(spark, lambda c: C.parse_salary_bounds(c), raw)
    assert (got_lo, got_hi) == (lo, hi)


def test_uuid5_job_id_byte_compat(spark):
    """The uuid5 UDF must reproduce uuid5(NAMESPACE_DNS, name) byte-for-byte
    (the reference's DynamoDB key, populator.py:53)."""
    import uuid

    from pyspark.sql import functions as F

    names = ["data scientist", "data engineer", "machine-learning engineer"]
    df = spark.createDataFrame([(n,) for n in names], "job string")
    got = {
        r["job"]: r["jid"]
        for r in df.select("job", C.uuid5_job_id(F.col("job")).alias("jid")).collect()
    }
    for n in names:
        assert got[n] == str(uuid.uuid5(uuid.NAMESPACE_DNS, n))
    # null-safe
    df2 = spark.createDataFrame([(None,)], "job string")
    assert df2.select(C.uuid5_job_id(F.col("job")).alias("jid")).first()["jid"] is None


# ---------------------------------------------------------------------------
# Empty/whitespace-text contract: the text_stats / text_quality oracles guard
# trim(text)='' and zero-length denominators; the Spark expressions must
# return the SAME guarded values so the cross-engine contract holds even
# though no testdata document is empty (ADVICE r1, medium).
# ---------------------------------------------------------------------------

def test_text_edge_contract_matches_oracle_guards(spark):
    import duckdb

    from job_datapipeline_spark.functions import text as T

    edge = ["", "   ", "\t\n", "!!!", "a b", None]
    sdf = spark.createDataFrame([(v,) for v in edge], "text string").select(
        T.token_count(F.col("text")).alias("n_tokens"),
        F.round(T.punct_ratio(F.col("text")), 4).alias("punct_ratio"),
        F.round(T.stopword_ratio(T.tokenize(F.col("text"))), 4).alias("stop_ratio"),
    )
    got = [tuple(r) for r in sdf.collect()]

    stop_in = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)
    want = duckdb.sql(f"""
        WITH d(text) AS (SELECT unnest([e'{edge[1]}', e'', e'\\t\\n', e'!!!', e'a b', NULL])),
        t AS (SELECT text, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM d)
        SELECT CAST(CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS BIGINT),
               coalesce(round(CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                     / nullif(length(text), 0), 4), 0.0),
               coalesce(round(CAST(len(list_filter(toks, x -> x IN ({stop_in}))) AS DOUBLE)
                     / nullif(len(toks), 0), 4), 0.0)
        FROM t
    """).fetchall()
    # same multiset of (n_tokens, punct, stop) rows; NULL text row compares too
    def key(row):
        return tuple("∅" if v is None else str(v) for v in row)
    assert sorted(map(key, got)) == sorted(map(key, want))


def test_repetition_ratio_templated_vs_varied(spark):
    from job_datapipeline_spark.functions import text as T

    rows = [
        ("rep", "buy now " * 10),          # one 3-gram pattern repeated
        ("varied", "a b c d e f g h i j"),  # all 3-grams unique
        ("short", "one two"),               # < n tokens -> 0.0
        ("empty", ""),
    ]
    out = {
        r["k"]: r["rr"]
        for r in spark.createDataFrame(rows, "k string, text string")
        .select("k", F.round(T.repetition_ratio(F.col("text")), 4).alias("rr"))
        .collect()
    }
    assert out["varied"] == 0.0 and out["short"] == 0.0 and out["empty"] == 0.0
    assert out["rep"] > 0.8


def test_redact_pii_masks_each_class(spark):
    from job_datapipeline_spark.functions import text as T

    rows = [
        ("mail me at jane.doe+x@corp.example.org please",),
        ("call +44 20 7946 0958 or 555 867 5309 now",),
        ("gateway 192.168.1.254 timed out",),
        ("clean text stays untouched",),
    ]
    got = [
        r["red"]
        for r in spark.createDataFrame(rows, "text string")
        .select(T.redact_pii(F.col("text")).alias("red"))
        .collect()
    ]
    assert got[0] == "mail me at <EMAIL> please"
    assert got[1] == "call <PHONE> or <PHONE> now"
    assert got[2] == "gateway <IP> timed out"
    assert got[3] == "clean text stays untouched"
