"""Round-5 LLM-pipeline widening: domain caps, BPE merge counting,
DSIR importance weighting, and token-budget mixture allocation.

Four more named recipes a 100 TB pretraining pipeline runs between raw
crawl and tokenizer, extending the sampling/curation surface
(operators/sampling.py, plans/llm_extras.py):

- Domain cap (CCNet / RefinedWeb-style): bound any single domain's
  contribution by keeping only its top-k documents by a quality key —
  the guard against one crawl-heavy host dominating the mixture.
- BPE pair counting: the aggregate at the heart of byte-pair-encoding
  tokenizer training — corpus-wide adjacent-symbol-pair frequencies
  (here: character pairs within whitespace words, the first merge
  step's exact input). Sennrich et al. 2016's algorithm iterates this
  count; the distributed step is this one aggregate.
- DSIR (Xie et al. 2023): data selection by importance resampling —
  score every raw document with a hashed-n-gram log-likelihood ratio
  between a target distribution (here: the English slice) and the raw
  corpus, then keep high-scoring docs. The standard cheap proxy for
  "looks like the target domain" at corpus scale.
- Token-budget mixture allocation: given per-language target weights
  and a global token budget, derive per-language sampling rates
  (capped at 1) and realize them with the repo's deterministic
  md5-draw — the planning step that turns "50% English" into an
  executable per-row filter.

Reference parity: the 1.4k-LoC reference pipeline has no
corpus-curation stage (it cleans ~2k scraped listings per run,
glassdoor-scraper/src/main.py); this module belongs to the extended
100 TB training-data surface the build brief makes first-class.

Cross-engine float discipline (see plans/queries.py header): every
data-dependent threshold here is integer arithmetic (per-mille weights,
micro-unit rates, cross-multiplied 16-bit md5 draws); the single
transcendental (DSIR's ln) is taken once per hash bucket on a ratio of
exact integers and immediately rounded to integer micro-units, so doc
scores are exact bigint sums on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.topk import top_k_per_group
from .queries import register

# ---------------------------------------------------------------------------
# Domain cap
# ---------------------------------------------------------------------------

_DOMCAP_K = 5


@register(
    "corpus_domain_cap",
    oracle=f"""
    SELECT source, doc_id, n_chars, rank FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents) x
    WHERE rank <= {_DOMCAP_K}
    """,
    doc=f"Per-domain contribution cap: keep the top {_DOMCAP_K} documents "
        "per source by quality key (n_chars desc, doc_id tiebreak) — the "
        "CCNet/RefinedWeb guard against crawl-heavy hosts dominating the "
        "corpus. Reuses operators/topk.top_k_per_group (reference W1, "
        "frontend/skills_interface.py top-k semantics) so the plan is the "
        "proven rank-filter window: one shuffle on source, rank computed "
        "and filtered before any downstream join. At 100 TB the skew "
        "hazard is a mega-domain's partition; the mitigation documented "
        "in operators/skew.py (pre-aggregate per (domain, salt) keeping "
        "k, then re-rank the k*salt survivors) composes with this exact "
        "call because top-k-per-group is decomposable.",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return top_k_per_group(
        docs, ["source"], "n_chars", _DOMCAP_K, tiebreak_cols=["doc_id"]
    ).select("source", "doc_id", "n_chars", "rank")


# ---------------------------------------------------------------------------
# BPE pair counting
# ---------------------------------------------------------------------------

_BPE_TOPK = 50


@register(
    "tokenizer_bpe_pairs",
    oracle=f"""
    WITH words AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents WHERE lang = 'en'
    ),
    pairs AS (
        SELECT unnest([substring(w, i, 2) FOR i IN range(1, length(w))]) AS pair
        FROM words WHERE length(w) >= 2
    )
    SELECT pair, count(*) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT {_BPE_TOPK}
    """,
    doc=f"BPE tokenizer-training pair count: frequency of every adjacent "
        "character pair within whitespace words of the English slice, "
        f"top {_BPE_TOPK} (count desc, pair asc tiebreak — the argmax of "
        "this table IS the first BPE merge; training loops this aggregate "
        "per merge). Plan: map-side explode of substr(w, i, 2) over "
        "sequence(1, len-1) — zero pre-shuffle work — into ONE partial-"
        "aggregated groupBy and a TakeOrderedAndProject; at 100 TB the "
        "map-side combine collapses each task to its local pair "
        "vocabulary (bounded by charset^2), so shuffle volume is "
        "O(tasks x distinct pairs), independent of corpus size.",
)
def tokenizer_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    words = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substr("w", i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(_BPE_TOPK)
    )


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 1024


@register(
    "corpus_dsir_importance",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents
    ),
    bt AS (
        SELECT doc_id, lang,
               ('0x' || substring(md5(tok), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS bucket
        FROM toks
    ),
    bstats AS (
        SELECT bucket,
               count(*) AS c_r,
               count(*) FILTER (WHERE lang = 'en') AS c_t
        FROM bt GROUP BY bucket
    ),
    dim AS (
        SELECT bucket,
               CAST(round(ln(
                   CAST((c_t + 1) * (sum(c_r) OVER () + {_DSIR_BUCKETS}) AS DOUBLE)
                   / CAST((c_r + 1) * (sum(c_t) OVER () + {_DSIR_BUCKETS}) AS DOUBLE)
               ) * 1000000) AS BIGINT) AS term_micro
        FROM bstats
    )
    SELECT bt.doc_id,
           count(*) AS n_toks,
           CAST(sum(term_micro) AS BIGINT) AS score_micro,
           (sum(term_micro) > 0) AS selected
    FROM bt JOIN dim ON dim.bucket = bt.bucket
    GROUP BY bt.doc_id
    """,
    doc="DSIR data selection (Xie et al. 2023, hashed-unigram variant): "
        "per-document importance score = sum over tokens of the add-one-"
        "smoothed log-likelihood ratio between the target distribution "
        "(the English slice) and the raw corpus, hashed into "
        f"{_DSIR_BUCKETS} md5 buckets. Plan: ONE tokenize pass "
        "(checkpointed — it feeds the bucket histogram and the scoring "
        "join), a bucket histogram with map-side combine, a "
        f"{_DSIR_BUCKETS}-row ratio dim (broadcast by AQE), and a final "
        "per-doc sum — at 100 TB the corpus is read once and every "
        "exchange after it is O(buckets) or O(docs). Determinism: the ln "
        "is evaluated once per BUCKET on a ratio of exact bigints and "
        "rounded to integer micro-units before the per-doc sum, so "
        "scores are exact integer arithmetic on both engines (the "
        "accepted ln-then-round precedent, cf. text_bm25_search).",
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    bt = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
            % _DSIR_BUCKETS
        ).alias("bucket"),
    ).localCheckpoint()  # feeds the histogram AND the scoring join
    bstats = bt.groupBy("bucket").agg(
        F.count("*").alias("c_r"),
        F.count_if(F.col("lang") == "en").alias("c_t"),
    )
    w_all = Window.partitionBy()
    dim = bstats.select(
        "bucket",
        F.round(
            F.log(
                (
                    (F.col("c_t") + 1)
                    * (F.sum("c_r").over(w_all) + F.lit(_DSIR_BUCKETS))
                ).cast("double")
                / (
                    (F.col("c_r") + 1)
                    * (F.sum("c_t").over(w_all) + F.lit(_DSIR_BUCKETS))
                ).cast("double")
            )
            * 1000000
        )
        .cast("bigint")
        .alias("term_micro"),
    )
    return (
        bt.join(dim, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("term_micro").alias("score_micro"),
        )
        .select(
            "doc_id",
            "n_toks",
            "score_micro",
            (F.col("score_micro") > 0).alias("selected"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget mixture allocation
# ---------------------------------------------------------------------------

# Target mixture in per-mille (integer so every rate below is exact).
_MIX_WEIGHTS_PM = {"en": 500, "zh": 150, "fr": 150, "de": 100, "es": 100}
_MIX_BUDGET_SHARE_PCT = 50  # global budget = 50% of corpus tokens
_MIX_SALT = "mixbudget-v1"

_MIX_WEIGHTS_SQL = ", ".join(
    f"('{lang}', {pm})" for lang, pm in _MIX_WEIGHTS_PM.items()
)


@register(
    "corpus_mix_budget",
    oracle=f"""
    WITH w(lang, weight_pm) AS (VALUES {_MIX_WEIGHTS_SQL}),
    dt AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(lower(text)), '\\s+')) AS ntok
        FROM documents
    ),
    avail AS (
        SELECT lang, CAST(sum(ntok) AS BIGINT) AS avail_tokens,
               CAST(count(*) AS BIGINT) AS avail_docs
        FROM dt GROUP BY lang
    ),
    rates AS (
        SELECT a.lang, a.avail_tokens, a.avail_docs, w.weight_pm,
               least(1000000,
                     (sum(a.avail_tokens) OVER () * {_MIX_BUDGET_SHARE_PCT}
                      * w.weight_pm) // (100 * a.avail_tokens)) AS rate_micro
        FROM avail a JOIN w ON w.lang = a.lang
    ),
    sampled AS (
        SELECT dt.lang, dt.ntok
        FROM dt JOIN rates r ON r.lang = dt.lang
        WHERE ('0x' || substring(md5('{_MIX_SALT}:' || CAST(dt.doc_id AS VARCHAR)), 1, 4))::BIGINT
              * 1000000 < r.rate_micro * 65536
    )
    SELECT r.lang, r.avail_docs, r.avail_tokens, r.weight_pm, r.rate_micro,
           CAST(coalesce(count(s.lang), 0) AS BIGINT) AS sampled_docs,
           CAST(coalesce(sum(s.ntok), 0) AS BIGINT) AS sampled_tokens
    FROM rates r LEFT JOIN sampled s ON s.lang = r.lang
    GROUP BY r.lang, r.avail_docs, r.avail_tokens, r.weight_pm, r.rate_micro
    """,
    doc="Token-budget mixture allocation: given integer per-mille language "
        f"weights and a global budget of {_MIX_BUDGET_SHARE_PCT}% of corpus "
        "tokens, derive each language's sampling rate (min(1, budget_share "
        "/ available_tokens), computed in integer micro-units) and realize "
        "it with the repo's deterministic md5 draw — the draw-vs-rate "
        "compare is cross-multiplied 16-bit-draw x micro-rate integer "
        "arithmetic, so the sampled SET is bit-identical on any engine "
        "(operators/sampling.py's data-INdependent thresholds can be "
        "precomputed hex literals; a data-DEPENDENT rate needs this "
        "integer form). Plan: one tokenize-count pass over documents "
        "(checkpointed — feeds the per-language aggregate and the sampling "
        "join), a |langs|-row rate dim joined back broadcast, map-side "
        "filter. Per-language report row: available vs sampled docs/"
        "tokens. At 100 TB this is the planning stage run before "
        "corpus_temperature_sample-style realization; over-budget "
        "languages get rate 1e6 (keep all), the budget concentrates on "
        "the rest.",
)
def corpus_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    dt = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("ntok"),
    ).localCheckpoint()  # feeds the availability agg AND the sampling join
    weights = F.create_map(
        *[x for lang, pm in _MIX_WEIGHTS_PM.items() for x in (F.lit(lang), F.lit(pm))]
    )
    avail = dt.groupBy("lang").agg(
        F.sum("ntok").cast("bigint").alias("avail_tokens"),
        F.count("*").alias("avail_docs"),
    )
    w_all = Window.partitionBy()
    # `div` (not `/`): Spark's `/` on bigints is DOUBLE division, and a
    # float quotient truncated to bigint can disagree with the oracle's
    # exact integer floor-div (`//`) one ulp below an integer boundary.
    rates = (
        avail.select(
            "lang",
            "avail_tokens",
            "avail_docs",
            weights[F.col("lang")].alias("weight_pm"),
        )
        .withColumn("_total_tokens", F.sum("avail_tokens").over(w_all))
        .withColumn(
            "rate_micro",
            F.expr(
                f"least(CAST(1000000 AS BIGINT), (_total_tokens * "
                f"{_MIX_BUDGET_SHARE_PCT} * weight_pm) div "
                f"(100 * avail_tokens))"
            ),
        )
        .drop("_total_tokens")
    )
    draw16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_MIX_SALT + ":"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    sampled = (
        dt.join(rates.select("lang", "rate_micro"), "lang")
        .filter(draw16 * 1000000 < F.col("rate_micro") * 65536)
        .groupBy("lang")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.sum("ntok").cast("bigint").alias("sampled_tokens"),
        )
    )
    return (
        rates.join(sampled, "lang", "left")
        .select(
            "lang",
            "avail_docs",
            "avail_tokens",
            "weight_pm",
            "rate_micro",
            F.coalesce("sampled_docs", F.lit(0)).cast("bigint").alias("sampled_docs"),
            F.coalesce("sampled_tokens", F.lit(0)).cast("bigint").alias("sampled_tokens"),
        )
    )
