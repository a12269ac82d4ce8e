"""HTML extraction surface (SURVEY.md §2.9, H1-H6) — the reference's custom
per-listing scalar functions, re-expressed as Arrow-batched ``mapInPandas``
over a stored-payload column.

Reference semantics being matched (glassdoor-scraper/src/packages/):
- H1 banner (listing.py:14-60): company name / star rating / offered role /
  role location from CSS-classed divs; the rating renders as a "4.4★"
  suffix that must be split off the name and float-cast.
- H2 description (listing.py:64-90): #JobDescriptionContainer -> join the
  <li> item texts with " "; if the joined text is <= 10 chars fall back to
  the container's full text.
- H3/H4 highlights (listing.py:92-186): label spans; the four ratings read
  the label's PARENT's next sibling, the four categorical fields read the
  label's next sibling; "N/A" -> null, company size "Unknown" -> null,
  missing label -> null.
- H5 assembler (listing.py:188-205): one record of 14 fields per listing,
  all-null record when the page is unusable.
- H6 result-page harvest (page.py:35-60): every <a href*="/partner/
  jobListing.htm?"> -> listing url (prefixed "www.glassdoor.com"),
  de-duplicated, with the sibling detailSalary span when present.

Design: parsing runs in Python (HTML is genuinely beyond Column
expressions) but BATCHED through Arrow — one ``mapInPandas`` stage,
parser state per partition, zero driver involvement. At 100 TB the
payload column arrives from a fetch stage or warc-style archive scan and
this stage is embarrassingly parallel.

The parser is a minimal DOM on the stdlib ``html.parser`` (BeautifulSoup
is deliberately NOT a dependency): elements know their tag, attributes,
children, parent, and sibling order — exactly what the extraction
semantics above need and nothing more.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..deploy import ensure_shipped

# ---------------------------------------------------------------------------
# Minimal DOM
# ---------------------------------------------------------------------------

_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input", "link", "meta", "source", "track", "wbr"}
)


class _Elem:
    """One element node: tag, attrs, ordered children (elements and text)."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "_Elem | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Elem | str] = []
        self.parent = parent

    # -- queries ------------------------------------------------------------
    def iter_elements(self) -> Iterator["_Elem"]:
        for child in self.children:
            if isinstance(child, _Elem):
                yield child
                yield from child.iter_elements()

    def _matches(self, tag: str | None, class_: str | None, id_: str | None) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if id_ is not None and self.attrs.get("id") != id_:
            return False
        if class_ is not None:
            have = (self.attrs.get("class") or "").split()
            if not set(class_.split()) <= set(have):
                return False
        return True

    def find(self, tag: str | None = None, class_: str | None = None, id_: str | None = None) -> "_Elem | None":
        for el in self.iter_elements():
            if el._matches(tag, class_, id_):
                return el
        return None

    def find_all(self, tag: str | None = None, class_: str | None = None) -> list["_Elem"]:
        return [el for el in self.iter_elements() if el._matches(tag, class_, None)]

    def text(self) -> str:
        """Concatenated descendant text (BS4 getText semantics: no separator)."""
        parts: list[str] = []
        stack: list[_Elem | str] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                parts.append(node)
            else:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def next_sibling_element(self) -> "_Elem | None":
        """The next ELEMENT sibling (skipping whitespace-only text nodes —
        the reference's ''-text skip at listing.py:114-115)."""
        if self.parent is None:
            return None
        sibs = self.parent.children
        idx = next(i for i, c in enumerate(sibs) if c is self)
        for node in sibs[idx + 1 :]:
            if isinstance(node, _Elem):
                return node
            if node.strip():
                return None
        return None


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Elem("[document]", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = _Elem(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._stack[-1].children.append(_Elem(tag, dict(attrs), self._stack[-1]))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray close tag: ignore (lenient, like real-world parsers)

    def handle_data(self, data: str) -> None:
        self._stack[-1].children.append(data)


def parse_html(html: str) -> _Elem:
    builder = _TreeBuilder()
    builder.feed(html or "")
    return builder.root


# ---------------------------------------------------------------------------
# Extraction semantics (pure Python, runs inside the Pandas UDF)
# ---------------------------------------------------------------------------

# CSS class selectors the reference pages used (listing.py:18,29,36,48,53,
# 121,134) — semantic constants of the emulated source, kept verbatim so
# fixtures/pages shaped like the originals extract identically.
_BANNER_GROUP = "css-ur1szg e11nt52q0"
_BANNER_RATING = "css-1pmc6te e11nt52q4"
_BANNER_NAME = "css-16nw49e e11nt52q1"
_BANNER_ROLE = "css-17x2pwl e11nt52q6"
_BANNER_LOCATION = "css-1v5elnn e11nt52q2"
_HIGHLIGHT_LABEL = "css-1vg6q84 e18tf5om6"

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

_LISTING_LINK_MARKER = "/partner/jobListing.htm?"
_LINK_PREFIX = "www.glassdoor.com"


def _float_or_none(raw: str | None) -> float | None:
    if raw is None:
        return None
    try:
        return float(raw)
    except ValueError:
        return None


def _extract_banner(root: _Elem) -> dict:
    """H1 (listing.py:14-60): name / rating / role / location. The rating
    span text is e.g. '4.4★'; the name div repeats it as a suffix which is
    stripped (the reference's replace + [:-1] dance, minus its type bugs)."""
    out = {"companyName": None, "company_starRating": None,
           "company_offeredRole": None, "company_roleLocation": None}
    group = root.find("div", class_=_BANNER_GROUP)
    if group is None:
        return out
    rating_el = group.find("span", class_=_BANNER_RATING)
    rating_raw = rating_el.text() if rating_el is not None else None
    if rating_raw is not None:
        out["company_starRating"] = _float_or_none(rating_raw.rstrip("★"))
    name_el = group.find("div", class_=_BANNER_NAME)
    if name_el is not None:
        name = name_el.text()
        if rating_raw:
            name = name.replace(rating_raw, "")
        out["companyName"] = name.strip() or None
    role_el = group.find("div", class_=_BANNER_ROLE)
    out["company_offeredRole"] = role_el.text() if role_el is not None else None
    loc_el = group.find("div", class_=_BANNER_LOCATION)
    out["company_roleLocation"] = loc_el.text() if loc_el is not None else None
    return out


def _extract_description(root: _Elem) -> str | None:
    """H2 (listing.py:64-90): join <li> texts with ' '; fall back to the
    container's full text when the joined form is suspiciously short."""
    container = root.find("div", id_="JobDescriptionContainer")
    if container is None:
        return None
    items = [li.text() for li in container.find_all("li")]
    joined = " ".join(items)
    if len(joined) <= 10:
        return container.text()
    return joined


def _find_label(labels: list[_Elem], attribute: str) -> _Elem | None:
    for el in labels:
        if attribute in el.text():
            return el
    return None


def _extract_highlights(root: _Elem) -> dict:
    """H3+H4 (listing.py:92-186): four float ratings via the label's
    PARENT's next sibling; four categorical fields via the label's own next
    sibling. 'N/A' -> null; company size 'Unknown' -> null; absent label ->
    null (the reference reaches the same nulls via raised exceptions)."""
    out: dict = {k: None for k in (*_RATING_LABELS, *_SIBLING_LABELS)}
    labels = root.find_all("span", class_=_HIGHLIGHT_LABEL)
    if not labels:
        return out
    for field, label_text in _RATING_LABELS.items():
        label = _find_label(labels, label_text)
        if label is None or label.parent is None:
            continue
        holder = label.parent.next_sibling_element()
        if holder is None:
            continue
        value = holder.text()
        if value != "N/A":
            out[field] = _float_or_none(value)
    for field, label_text in _SIBLING_LABELS.items():
        label = _find_label(labels, label_text)
        if label is None:
            continue
        holder = label.next_sibling_element()
        if holder is None:
            continue
        value = holder.text()
        if value == "N/A" or value == "":
            value = None
        if field == "company_size" and value is not None and value.lower() == "unknown":
            value = None
        out[field] = value
    return out


def extract_listing_record(html: str | None, url: str | None) -> dict:
    """H5 (listing.py:188-205): full 14-field listing record; all-null
    fields (url preserved) when the payload is empty/unusable."""
    if not html:
        return {
            "requested_url": url, "companyName": None, "company_starRating": None,
            "company_offeredRole": None, "company_roleLocation": None,
            "listing_jobDesc": None,
            **{k: None for k in (*_RATING_LABELS, *_SIBLING_LABELS)},
        }
    root = parse_html(html)
    rec = {"requested_url": url}
    rec.update(_extract_banner(root))
    rec["listing_jobDesc"] = _extract_description(root)
    rec.update(_extract_highlights(root))
    return rec


def harvest_links(html: str | None) -> list[tuple[str, str | None]]:
    """H6 (page.py:35-60): distinct listing urls on a result page, each with
    the salary shown next to it (parent's detailSalary span) when present."""
    if not html:
        return []
    root = parse_html(html)
    seen: dict[str, str | None] = {}
    for a in root.find_all("a"):
        href = a.attrs.get("href")
        if not href or _LISTING_LINK_MARKER not in href:
            continue
        url = _LINK_PREFIX + href
        salary = None
        if a.parent is not None:
            for span in a.parent.find_all("span"):
                if span.attrs.get("data-test") == "detailSalary":
                    salary = span.text()
                    break
        # first sighting wins; a later duplicate link never downgrades a salary
        if url not in seen or (seen[url] is None and salary is not None):
            seen[url] = salary
    return sorted(seen.items())


# ---------------------------------------------------------------------------
# Spark surface: Arrow-batched mapInPandas stages
# ---------------------------------------------------------------------------

LISTING_SCHEMA = StructType(
    [
        StructField("requested_url", StringType()),
        StructField("companyName", StringType()),
        StructField("company_starRating", DoubleType()),
        StructField("company_offeredRole", StringType()),
        StructField("company_roleLocation", StringType()),
        StructField("listing_jobDesc", StringType()),
        StructField("compensation_and_benefits", DoubleType()),
        StructField("culture_and_values", DoubleType()),
        StructField("career_opportunities", DoubleType()),
        StructField("work_life_balance", DoubleType()),
        StructField("job_type", StringType()),
        StructField("industry", StringType()),
        StructField("job_function", StringType()),
        StructField("company_size", StringType()),
    ]
)

HARVEST_SCHEMA = StructType(
    [
        StructField("page_url", StringType()),
        StructField("listing_url", StringType()),
        StructField("salary", StringType()),
    ]
)

_LISTING_COLS = [f.name for f in LISTING_SCHEMA.fields]


def extract_listings_df(df: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """The H1-H5 extraction stage: (url, html) payload rows -> 14-field
    listing records. One Arrow-batched Python stage; everything before and
    after stays JVM-side."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records = [
                extract_listing_record(h, u)
                for h, u in zip(pdf[html_col], pdf[url_col])
            ]
            yield pd.DataFrame(records, columns=_LISTING_COLS)

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, LISTING_SCHEMA)


def harvest_links_df(df: DataFrame, html_col: str = "html", url_col: str = "url") -> DataFrame:
    """The H6 harvest stage: result-page payloads -> (page_url, listing_url,
    salary) rows, listing urls de-duplicated per page (U2, page.py:51)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for h, u in zip(pdf[html_col], pdf[url_col]):
                rows.extend(
                    {"page_url": u, "listing_url": link, "salary": sal}
                    for link, sal in harvest_links(h)
                )
            yield pd.DataFrame(rows, columns=["page_url", "listing_url", "salary"])

    ensure_shipped(df.sparkSession)
    return df.mapInPandas(gen, HARVEST_SCHEMA)
