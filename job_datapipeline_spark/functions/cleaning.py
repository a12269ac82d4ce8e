"""Cleaning/normalization expressions — the data-cleaner stage, Spark-native.

Re-expresses every transform in the reference's cleaner
(data-cleaner/cleaner.py:42-106) and listing extractor sentinels
(glassdoor-scraper/src/packages/listing.py:100-115) as pure Column
expressions: no Python UDFs, fully vectorized in whole-stage codegen,
so at 100 TB the clean stage is a single scan->project->broadcast-join job.

Reference semantics notes (bug-vs-intent, documented per SURVEY.md §2.8 F3):
- cleaner.py:91-94 maps ``lambda x: x.title if x == np.nan else x`` — the
  ``x == np.nan`` comparison is always False, so those four lines are no-ops
  in the reference. We implement the evident INTENT (initcap / lower with a
  null guard) and keep the raw column available for byte-compat tests.
- salary conversion (cleaner.py:42-79) has near-duplicate convert_min /
  convert_max; here one expression pair shares the parsed array.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Currency-symbol -> ISO map, literal in the reference (cleaner.py:46,65).
CURRENCY_ISO = {
    "£": "GBP",
    "CA$": "CAD",
    "COP": "COP",
    "$": "USD",
    "€": "EUR",
    "SGD": "SGD",
    "CHF": "CHF",
    "NOK": "NOK",
    "IRR": "IRR",
}

# "Per Hour" annualization used at cleaner.py:56-58: 8 h/day * 261 workdays.
HOURS_PER_DAY = 8
WORKDAYS_PER_YEAR = 261

NA_SENTINELS = ("N/A", "", "Unknown", "unknown")


def na_to_null(col: Column) -> Column:
    """P5: map the reference's N/A sentinels (listing.py:100-115) to null."""
    return F.when(col.isin(*NA_SENTINELS), F.lit(None)).otherwise(col)


def split_rating_from_name(name: Column) -> tuple[Column, Column]:
    """F4 (cleaner.py:88-89): 'Acme\\n4.5★' -> (name='Acme', rating=4.5).

    The reference takes name[-4:-1] as the rating and name[:-4] as the clean
    name whenever a star glyph is present.
    """
    has_star = name.contains("★")
    rating = F.when(has_star, F.substring(name, -4, 3).cast("double"))
    clean = F.when(has_star, F.substring(name, F.lit(1), F.length(name) - 4)).otherwise(name)
    return clean, rating


def clean_company_name(name: Column) -> Column:
    """F1 intent (cleaner.py:90-91): title-case the company name, null-safe."""
    return F.when(name.isNotNull(), F.initcap(name))


def parse_company_size(size: Column) -> tuple[Column, Column]:
    """F5 (cleaner.py:97-100): '1001 to 5000 Employees' -> (1001, 5000);
    '10000+ Employees' -> (10000, 10000); anything unparseable -> (null, null).
    """
    normalized = F.regexp_replace(
        F.regexp_replace(size, r"\+ Employees", " to 10000 Employees"),
        r" Employees",
        "",
    )
    ok = normalized.rlike(r"^\d+ to \d+$")
    parts = F.split(normalized, " to ")
    lo = F.when(ok, F.element_at(parts, 1).cast("int"))
    hi = F.when(ok, F.element_at(parts, 2).cast("int"))
    return lo, hi


def _salary_parts(salary: Column) -> Column:
    """Shared parse for F6 (cleaner.py:42-79): strip '(Employer Est.)',
    NBSP and commas, drop the currency prefix, split the range on '-'.
    Yields array<double> of 1..2 values (annual or hourly)."""
    s = F.regexp_replace(salary, r"\(Employer Est\.\)", "")
    s = F.regexp_replace(s, " ", "")
    s = F.regexp_replace(s, ",", "")
    # currency symbol = everything before the first digit (cleaner.py:45)
    nums = F.regexp_replace(s, r"[^0-9.Kk\-]", "")
    # Glassdoor ranges look like '25K-35K' or plain integers '25000-35000'.
    nums = F.regexp_replace(nums, r"[Kk]", "000")
    arr = F.filter(F.split(nums, "-"), lambda x: x != F.lit(""))
    return F.transform(arr, lambda x: x.cast("double"))


def salary_currency(salary: Column) -> Column:
    """Currency prefix (chars before the first digit), trimmed — then mapped
    to ISO through CURRENCY_ISO (J2 broadcast lookup, cleaner.py:46,65)."""
    sym = F.trim(F.regexp_replace(F.regexp_extract(salary, r"^([^0-9]*)\d", 1), " ", ""))
    mapping = F.create_map(*[F.lit(x) for kv in CURRENCY_ISO.items() for x in kv])
    return F.coalesce(mapping[sym], F.lit("USD"))


def parse_salary_bounds(
    salary: Column, rate: Column | None = None
) -> tuple[Column, Column]:
    """F6: min/max estimated salary in USD-equivalent integers.

    - per-hour quotes annualized by 8 h * 261 d (cleaner.py:56-58)
    - divided by the exchange rate (1.0 when absent), rounded (cleaner.py:60)
    - single-value quotes give min == max ([0] vs [-1], cleaner.py:53,72)
    """
    arr = _salary_parts(salary)
    hourly = salary.contains("Per Hour")
    factor = F.when(hourly, F.lit(float(HOURS_PER_DAY * WORKDAYS_PER_YEAR))).otherwise(F.lit(1.0))
    rate = F.lit(1.0) if rate is None else F.coalesce(rate, F.lit(1.0))
    lo = F.round(F.element_at(arr, 1) * factor / rate).cast("int")
    hi = F.round(F.element_at(arr, -1) * factor / rate).cast("int")
    ok = salary.isNotNull() & (F.size(arr) > 0)
    return F.when(ok, lo), F.when(ok, hi)


def job_position_from_filename(path: Column, prefix_pattern: str = r".*/") -> Column:
    """S6 (cleaner.py:10-14,27): derive job_position from the object key —
    strip the path prefix and date stamp, drop the trailing location token,
    and rejoin hyphenated words with spaces.

    Filenames follow main_pd.py:40,112: '<dd-mm-yyyy><term-with-dashes>-<loc>.csv'.
    """
    base = F.regexp_replace(path, prefix_pattern, "")
    base = F.regexp_replace(base, r"^\d{2}-\d{2}-\d{4}", "")
    base = F.regexp_replace(base, r"\.(csv|parquet)$", "")
    # drop the final '-<location>' token, keep the search term
    term = F.regexp_replace(base, r"-[^-]*$", "")
    return F.regexp_replace(term, "-", " ")


def normalize_url(url: Column) -> Column:
    """S2 (packages/common.py:10-13): prepend https:// when scheme missing."""
    return F.when(url.rlike(r"^https?://"), url).otherwise(F.concat(F.lit("https://"), url))


def strip_digits(col: Column) -> Column:
    """F8 (page.py:28): re.sub(r'\\D','') — '7,764 Jobs' -> '7764'."""
    return F.regexp_replace(col, r"\D", "")


def deterministic_job_id(job: Column) -> Column:
    """F13 (populator.py:53): deterministic surrogate key for a job name.

    The reference uses uuid5(NAMESPACE_DNS, job); we use sha2-256 truncated to
    32 hex chars — equally deterministic and collision-safe, computed JVM-side
    (no Python UDF). When byte-level compatibility with the reference's keys
    matters, use :func:`uuid5_job_id` instead.
    """
    return F.substring(F.sha2(job, 256), 1, 32)


def uuid5_job_id(job: Column) -> Column:
    """F13 byte-compat form: ``uuid5(NAMESPACE_DNS, job)`` exactly as the
    reference computes its DynamoDB key (populator.py:53).

    This is a row-at-a-time Python UDF — deliberately NOT the hot path
    (``deterministic_job_id`` is the JVM-side scale form). It exists for
    migrations that must reproduce the reference's existing keys byte-for-byte;
    it is deterministic, so Catalyst may still push/prune around it.
    """
    import uuid

    @F.udf("string")
    def _uuid5(name):
        return None if name is None else str(uuid.uuid5(uuid.NAMESPACE_DNS, name))

    return _uuid5(job)
