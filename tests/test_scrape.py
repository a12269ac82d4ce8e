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


# --- loopback HTTP: the REAL urllib transport + retry loop over a socket ---

@pytest.fixture()
def loopback_server():
    """A real http.server on 127.0.0.1:<ephemeral> with a flaky endpoint:
    /flaky fails with 500 twice, then succeeds — the reference's
    retry-until-up scenario (common.py:16-42) over an actual socket."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    flaky_hits = {"n": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/page/"):
                body = f"<html><title>p{self.path.rsplit('/', 1)[-1]}</title></html>"
                self.send_response(200)
            elif self.path == "/flaky":
                flaky_hits["n"] += 1
                if flaky_hits["n"] <= 2:
                    self.send_response(500)
                    self.end_headers()
                    return
                body = "<html>finally up</html>"
                self.send_response(200)
            else:
                self.send_response(404)
                self.end_headers()
                return
            payload = body.encode()
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", flaky_hits
    finally:
        server.shutdown()
        server.server_close()


def test_default_transport_over_loopback(loopback_server):
    base, _ = loopback_server
    html = SC.default_transport(f"{base}/page/7")
    assert "<title>p7</title>" in html
    with pytest.raises(Exception):
        SC.default_transport(f"{base}/nope")  # 404 raises -> retry path


def test_fetch_pages_default_transport_and_retry_over_loopback(spark, loopback_server):
    """fetch_pages with NO injected transport: Python workers GET a real
    socket through default_transport; /flaky needs the retry loop (two 500s
    before success) and /nope stays an error-as-data row."""
    base, flaky_hits = loopback_server
    urls = spark.createDataFrame(
        [(f"{base}/page/1",), (f"{base}/flaky",), (f"{base}/nope",)],
        "url string",
    )
    rows = {
        r["url"].rsplit("/", 1)[-1]: r
        for r in SC.fetch_pages(
            urls.coalesce(1), max_retries=4, retry_wait=0.05
        ).collect()
    }
    assert "<title>p1</title>" in rows["1"]["html"] and rows["1"]["error"] is None
    assert rows["flaky"]["html"] == "<html>finally up</html>"
    assert rows["flaky"]["error"] is None
    assert flaky_hits["n"] == 3  # two 500s + the success — retries really hit the wire
    assert rows["nope"]["html"] is None and rows["nope"]["error"] is not None
