"""HTML extraction (H1-H6): golden-value recovery through the Spark
mapInPandas stage, null paths, malformed payloads, harvest dedup."""

from __future__ import annotations

from job_datapipeline_spark.sources import html as H
from job_datapipeline_spark.sources import html_fixtures as FX


def test_extract_listings_df_recovers_goldens(spark):
    payload = spark.createDataFrame(FX.listing_fixture_rows(), "url string, html string")
    got = {r["companyName"]: r.asDict() for r in H.extract_listings_df(payload).collect()}
    for want in FX.expected_listing_rows():
        row = got[want["companyName"]]
        for k, v in want.items():
            assert row[k] == v, f"{want['companyName']}.{k}: {row[k]!r} != {v!r}"


def test_extract_all_null_on_empty_or_garbage(spark):
    payload = spark.createDataFrame(
        [("u1", None), ("u2", ""), ("u3", "<div class='nope'>plain text, no structure</div>"),
         ("u4", "<html><body><p>unclosed")],
        "url string, html string",
    )
    rows = {r["requested_url"]: r for r in H.extract_listings_df(payload).collect()}
    assert len(rows) == 4
    for u in ("u1", "u2", "u3", "u4"):
        assert rows[u]["companyName"] is None
        assert rows[u]["listing_jobDesc"] is None
        assert rows[u]["company_starRating"] is None


def test_description_short_fallback():
    # joined <li> text <= 10 chars -> whole-container text (listing.py:87-88)
    html = (
        '<div id="JobDescriptionContainer">Intro text here'
        "<ul><li>tiny</li></ul></div>"
    )
    rec = H.extract_listing_record(f"<html><body>{html}</body></html>", "u")
    # full-text fallback concatenates descendants with no separator (BS4
    # getText semantics, listing.py:88)
    assert rec["listing_jobDesc"] == "Intro text heretiny"


def test_highlight_na_and_unknown_sentinels():
    html = (
        '<html><body><div class="css-1x772q6 e18tf5om0">'
        '<div><span class="css-1vg6q84 e18tf5om6">Culture &amp; Values</span></div><div>N/A</div>'
        '<span class="css-1vg6q84 e18tf5om6">Size</span><span>Unknown</span>'
        '<span class="css-1vg6q84 e18tf5om6">Job Type</span><span>Contract</span>'
        "</div></body></html>"
    )
    rec = H.extract_listing_record(html, "u")
    assert rec["culture_and_values"] is None
    assert rec["company_size"] is None
    assert rec["job_type"] == "Contract"


def test_harvest_links_df_dedup_and_salary(spark):
    payload = spark.createDataFrame(
        [(FX.RESULT_PAGE_URL, FX.render_result_page_html())], "url string, html string"
    )
    rows = H.harvest_links_df(payload).collect()
    got = {(r["listing_url"], r["salary"]) for r in rows}
    assert got == set(FX.GOLDEN_LINKS)
    # the duplicate anchor did not produce a duplicate row; the non-listing
    # link did not appear
    assert len(rows) == len(FX.GOLDEN_LINKS)
    assert all("/partner/jobListing.htm?" in r["listing_url"] for r in rows)


def test_rating_suffix_stripped_from_name():
    html = (
        '<html><body><div class="css-ur1szg e11nt52q0">'
        '<span class="css-1pmc6te e11nt52q4">3.9★</span>'
        '<div class="css-16nw49e e11nt52q1">Acme Corp 3.9★</div>'
        '<div class="css-17x2pwl e11nt52q6">Engineer</div>'
        '<div class="css-1v5elnn e11nt52q2">Berlin</div>'
        "</div></body></html>"
    )
    rec = H.extract_listing_record(html, "u")
    assert rec["companyName"] == "Acme Corp"
    assert rec["company_starRating"] == 3.9
