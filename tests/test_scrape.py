"""Scrape-stage sources: template compilation, pagination closed form,
retry loop, and the injectable-transport fetch stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_datapipeline_spark.sources import scrape as SC


def test_template_expr_any_slot_order(spark):
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    expr = SC._template_expr("pre/{two}/mid/{one}.htm", {"one": F.col("a"), "two": F.col("b")})
    assert df.select(expr.alias("u")).first()["u"] == "pre/y/mid/x.htm"


def test_template_expr_unknown_slot_raises():
    with pytest.raises(KeyError, match="nope"):
        SC._template_expr("{nope}", {})


def test_worklist_matches_reference_format(spark):
    config = {
        "base_url": "https://example.com/Job/{country}-{search_term}-jobs-SRCH_IL.0,{country_code},{str_length}.htm",
        "search_terms": ["data-scientist"],
        "locations": {"remote": "6_IS11048_KO7"},
    }
    row = SC.base_url_worklist(spark, config).first()
    want = config["base_url"].format(
        country="remote", search_term="data-scientist",
        country_code="6_IS11048_KO7", str_length=len("remote") + len("data-scientist") + 1,
    )
    assert row["base_url"] == want


def test_paginate_closed_form_matches_iterative(spark):
    base = "https://example.com/jobs-SRCH_IL.0,9,24.htm"
    df = spark.createDataFrame([(base,)], "base_url string")
    got = {r["page"]: r["url"] for r in SC.paginate(df, 3).collect()}

    # the reference's iterative rewrite (main.py:49-58)
    def update_url(prev_url, page_index):
        if page_index == 1:
            return prev_url.replace(".htm", "_IP1.htm")
        return prev_url.replace(f"_IP{page_index - 1}.htm", f"_IP{page_index}.htm")

    url = base
    for p in range(1, 4):
        url = update_url(url, p)
        assert got[p] == url


def test_fetch_with_retry_recovers_and_reports():
    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("boom")
        return f"<html>{url}</html>"

    waits = []
    html, err = SC.fetch_with_retry("u", flaky, max_retries=10, retry_wait=5.0, sleep=waits.append)
    assert html == "<html>u</html>" and err is None
    assert waits == [5.0, 5.0]  # slept between failed attempts only

    def always_down(url):
        raise TimeoutError("dead")

    html, err = SC.fetch_with_retry("u", always_down, max_retries=3, retry_wait=0.0, sleep=lambda _: None)
    assert html is None and "TimeoutError" in err


def test_fetch_pages_with_injected_transport(spark):
    urls = spark.createDataFrame([("a.htm",), ("b.htm",), ("bad.htm",)], "url string")

    def fetcher():
        def transport(url):
            if url == "bad.htm":
                raise ValueError("404")
            return f"<html>{url}</html>"

        return transport

    rows = {r["url"]: r for r in SC.fetch_pages(urls, fetcher=fetcher, max_retries=2, retry_wait=0.0).collect()}
    assert rows["a.htm"]["html"] == "<html>a.htm</html>" and rows["a.htm"]["error"] is None
    assert rows["bad.htm"]["html"] is None and "ValueError" in rows["bad.htm"]["error"]
