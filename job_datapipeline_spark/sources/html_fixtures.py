"""Deterministic HTML fixtures for the H1-H6 extraction surface.

Golden values are REAL rows from the reference's checked-in sample output
(glassdoor-scraper/src/output/output_17-08-2021.csv, rows for Metrica
Recruitment / Randstad Technologies / DT Resourcing Ltd). The fixture
renderer emits pages shaped like the pages the reference scraped (same CSS
class selectors, same label/sibling structure), so extraction must recover
exactly those golden values — the oracle encodes them as a VALUES table.

The three rows were picked to cover the semantics branches: full banner
with rating suffix vs. ratingless banner; highlight ratings present vs.
"N/A"; categorical labels present vs. entirely absent (company_size /
industry null paths); multi-<li> descriptions of different lengths.
"""

from __future__ import annotations

from html import escape

# ---------------------------------------------------------------------------
# Golden listing records (output_17-08-2021.csv). ``desc_items`` is the
# <li>-split of the recorded description; the reference's H2 join with " "
# reconstructs the exact recorded string.
# ---------------------------------------------------------------------------

GOLDEN_LISTINGS: list[dict] = [
    {
        "requested_url": "https://www.glassdoor.com/partner/jobListing.htm?jobListingId=4133857906",
        "companyName": "Metrica Recruitment",
        "company_starRating": None,
        "company_offeredRole": "Data Scientist",
        "company_roleLocation": "London, England",
        "desc_items": [
            "Proven commercial data science experience and has taken models into production",
            "Must have cloud experience, preferably AWS",
            "Marketing domain experience preferable, but not essential",
        ],
        "compensation_and_benefits": None,  # rendered as N/A values
        "culture_and_values": None,
        "career_opportunities": None,
        "work_life_balance": None,
        "job_type": "Full-time",
        "industry": "Business Services",
        "job_function": "data scientist",
        "company_size": "1 to 50 Employees",
    },
    {
        "requested_url": "https://www.glassdoor.com/partner/jobListing.htm?jobListingId=4153984591",
        "companyName": "Randstad Technologies",
        "company_starRating": 4.4,
        "company_offeredRole": "Data Scientist",
        "company_roleLocation": "London, England",
        "desc_items": [
            "Strong programming experience in Python, R, or Matlab (and associated data science/machine learning libraries)",
            "Understanding of statistics and machine learning modelling",
            "A keen desire for continuous learning",
            "An excellent communicator to technical and non-technical stakeholders",
        ],
        "compensation_and_benefits": 3.5,
        "culture_and_values": 3.9,
        "career_opportunities": 3.7,
        "work_life_balance": 3.8,
        "job_type": "Full-time",
        "industry": "Business Services",
        "job_function": "data scientist",
        "company_size": "10000+ Employees",
    },
    {
        "requested_url": "https://www.glassdoor.com/partner/jobListing.htm?jobListingId=4163245628",
        "companyName": "DT Resourcing Ltd",
        "company_starRating": None,
        "company_offeredRole": "Data Scientist",
        "company_roleLocation": "Malvern, England",
        "desc_items": ["Master's (preferred)", "No"],
        "render_rating_labels": False,  # rating labels entirely absent on page
        "compensation_and_benefits": None,
        "culture_and_values": None,
        "career_opportunities": None,
        "work_life_balance": None,
        "job_type": "Full-time",
        "industry": None,  # label absent
        "job_function": "data scientist",
        "company_size": None,  # label absent
    },
]

_RATING_LABELS = {
    "compensation_and_benefits": "Compensation & Benefits",
    "culture_and_values": "Culture & Values",
    "career_opportunities": "Career Opportunities",
    "work_life_balance": "Work/Life Balance",
}
_SIBLING_LABELS = {
    "job_type": "Job Type",
    "industry": "Industry",
    "job_function": "Job Function",
    "company_size": "Size",
}


def render_listing_html(rec: dict) -> str:
    """One listing page shaped like the pages the reference scraped:
    banner group (rating as a '4.4★' span, echoed as a name suffix),
    #JobDescriptionContainer with <li> items, and the highlights block
    (rating labels -> parent-sibling values; categorical labels -> direct
    sibling values)."""
    rating_raw = (
        f"{rec['company_starRating']}★" if rec["company_starRating"] is not None else None
    )
    banner = ['<div class="css-ur1szg e11nt52q0">']
    if rating_raw:
        banner.append(f'<span class="css-1pmc6te e11nt52q4">{escape(rating_raw)}</span>')
        banner.append(
            f'<div class="css-16nw49e e11nt52q1">{escape(rec["companyName"])} {escape(rating_raw)}</div>'
        )
    else:
        banner.append(f'<div class="css-16nw49e e11nt52q1">{escape(rec["companyName"])}</div>')
    banner.append(f'<div class="css-17x2pwl e11nt52q6">{escape(rec["company_offeredRole"])}</div>')
    banner.append(f'<div class="css-1v5elnn e11nt52q2">{escape(rec["company_roleLocation"])}</div>')
    banner.append("</div>")

    desc = ['<div id="JobDescriptionContainer"><ul>']
    desc.extend(f"<li>{escape(item)}</li>" for item in rec["desc_items"])
    desc.append("</ul></div>")

    hl = ['<div class="css-1x772q6 e18tf5om0">']
    if rec.get("render_rating_labels", True):
        for field, label in _RATING_LABELS.items():
            value = rec[field]
            shown = "N/A" if value is None else str(value)
            hl.append(
                f'<div><span class="css-1vg6q84 e18tf5om6">{escape(label)}</span></div>'
                f"<div>{escape(shown)}</div>"
            )
    for field, label in _SIBLING_LABELS.items():
        value = rec[field]
        if value is None:
            continue  # absent label -> null path
        hl.append(
            f'<span class="css-1vg6q84 e18tf5om6">{escape(label)}</span>'
            f"<span>{escape(str(value))}</span>"
        )
    hl.append("</div>")

    return (
        "<html><body>"
        + "".join(banner)
        + "".join(desc)
        + "".join(hl)
        + "</body></html>"
    )


def listing_fixture_rows() -> list[tuple[str, str]]:
    """(url, html) payload rows for the extraction stage."""
    return [(rec["requested_url"], render_listing_html(rec)) for rec in GOLDEN_LISTINGS]


def expected_listing_rows() -> list[dict]:
    """The golden 14-field records extraction must reproduce."""
    out = []
    for rec in GOLDEN_LISTINGS:
        row = {k: v for k, v in rec.items() if k not in ("desc_items", "render_rating_labels")}
        row["listing_jobDesc"] = " ".join(rec["desc_items"])
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# H6 result-page fixture: listing links with/without salary spans, one
# duplicate link, one non-listing link to be ignored.
# ---------------------------------------------------------------------------

RESULT_PAGE_URL = "https://www.glassdoor.com/Job/london-data-scientist-jobs-SRCH_IP1.htm"

GOLDEN_LINKS: list[tuple[str, str | None]] = [
    ("www.glassdoor.com/partner/jobListing.htm?jobListingId=4133857906", "£40K - £61K (Glassdoor est.)"),
    ("www.glassdoor.com/partner/jobListing.htm?jobListingId=4153984591", None),
    ("www.glassdoor.com/partner/jobListing.htm?jobListingId=4163245628", "£33K - £46K (Glassdoor est.)"),
]


def render_result_page_html() -> str:
    items = []
    for url, salary in GOLDEN_LINKS:
        href = url.removeprefix("www.glassdoor.com")
        sal_span = (
            f'<span data-test="detailSalary">{escape(salary)}</span>' if salary else ""
        )
        items.append(f'<li><a href="{escape(href)}">Job</a>{sal_span}</li>')
    # duplicate of the first link (dedup path) and an unrelated link (filter path)
    first_href = GOLDEN_LINKS[0][0].removeprefix("www.glassdoor.com")
    items.append(f'<li><a href="{escape(first_href)}">Job again</a></li>')
    items.append('<li><a href="/Overview/Working-at-Acme.htm">Not a listing</a></li>')
    return "<html><body><ul>" + "".join(items) + "</ul></body></html>"
