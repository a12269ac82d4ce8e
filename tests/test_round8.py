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
