"""Round-8 semantic pins: BPE encode must actually apply the learned
merge table (not just re-tokenize), conserve character mass, and keep
its top-k ordering deterministic."""

from __future__ import annotations

from job_datapipeline_spark.plans.queries import REGISTRY

from conftest import SF_SMOKE


def test_bpe_encode_applies_learned_merges(spark):
    learned = (
        REGISTRY["tokenizer_bpe_learn"].fn(spark, SF_SMOKE).toPandas()
    )
    enc = REGISTRY["tokenizer_bpe_encode"].fn(spark, SF_SMOKE).toPandas()

    # mass conservation verdict is computed IN PLAN over the full token
    # table (not just the top-k) — it must hold everywhere
    assert enc["mass_ok"].all()

    # every word encodes to >= 1 token, so fertility >= 1000 per-mille;
    # merges strictly reduce token count from the char baseline
    fert = enc["fertility_milli"].iloc[0]
    assert (enc["fertility_milli"] == fert).all()
    assert fert >= 1000

    # ordering pin: freq desc, token asc
    occ = list(enc["occ"])
    assert occ == sorted(occ, reverse=True)

    # the FINAL learned merge's product is never consumed by a later
    # merge, so it must surface as an encoded token of >= 2 chars
    # (sf0.001's alphabet is small enough that the top-k is the full
    # token table)
    last_pair = learned.sort_values("round")["pair"].iloc[-1]
    product = last_pair.replace(" ", "")
    assert len(product) >= 2
    assert product in set(enc["token"]), (
        f"learned merge product {product!r} missing from encoded tokens"
    )

    # merged tokens exist at all (n_chars > 1 somewhere)
    assert (enc["n_chars"] >= 2).any()


def test_threshold_curve_monotone(spark):
    df = (
        REGISTRY["corpus_dedup_threshold_curve"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("threshold_permille")
    )
    # tightening the threshold can only shed pairs and dropped docs
    assert list(df["n_pairs"]) == sorted(df["n_pairs"], reverse=True)
    assert list(df["n_docs_dropped"]) == sorted(
        df["n_docs_dropped"], reverse=True
    )


def test_lsh_tuning_curve_tradeoff(spark):
    df = (
        REGISTRY["dedup_lsh_tuning_curve"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("bands")
    )
    # more bands -> candidates and recall both non-decreasing (the S-curve)
    assert list(df["n_cand"]) == sorted(df["n_cand"])
    assert list(df["recall_permille"]) == sorted(df["recall_permille"])
    # candidate generation is lossy only toward false positives:
    # tp never exceeds either side
    assert (df["tp"] <= df["n_cand"]).all()
    assert (df["tp"] <= df["n_true"]).all()
    # single-row bands (b = H) candidate on ANY matching hash: recall must
    # be total on the planted corpus (exact dups match every hash)
    assert df.iloc[-1]["recall_permille"] == 1000


def test_lpa_labels_shrink(spark):
    df = (
        REGISTRY["graph_label_propagation"]
        .fn(spark, SF_SMOKE)
        .toPandas()
        .sort_values("round")
    )
    # every round-r label was some neighbor's round-(r-1) label, so the
    # label SET can only shrink: distinct count non-increasing.  (The
    # largest community is NOT monotone in general — synchronous LPA can
    # oscillate on bipartite graphs — so only the provable invariant is
    # pinned here; exact values are the oracle test's job.)
    assert list(df["n_labels"]) == sorted(df["n_labels"], reverse=True)
    assert df["max_community"].iloc[-1] >= df["max_community"].iloc[0]


def test_recursive_hierarchy_conserves_parts(spark):
    from job_datapipeline_spark.catalog import table

    df = REGISTRY["sql_recursive_hierarchy"].fn(spark, SF_SMOKE).toPandas()
    n_parts = table(spark, SF_SMOKE, "part").count()
    # every part reaches exactly one root
    assert int(df["n_parts"].sum()) == n_parts


def test_qini_depths_complete(spark):
    df = REGISTRY["ml_uplift_qini"].fn(spark, SF_SMOKE).toPandas()
    assert len(df) == 10
    # cumulative columns are non-decreasing in depth
    d = df.sort_values("decile")
    assert list(d["cum_conv_t"]) == sorted(d["cum_conv_t"])
    assert list(d["cum_conv_c"]) == sorted(d["cum_conv_c"])
