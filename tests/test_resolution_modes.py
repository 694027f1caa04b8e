"""Both resolution layouts (packed / bucketed) produce identical ids —
they differ only in shuffle topology."""

from __future__ import annotations


def test_modes_agree(spark, sf_dir):
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        entity_catalog,
    )
    from relation_extraction_using_llms_spark.operators.gold_normalize import (
        gold_entities,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        doc_candidates,
        linking_catalog,
        resolve_in_document,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import (
        pages_df,
        stub_responses_df,
    )

    pages = pages_df(spark, sf_dir).limit(120).cache()
    clean = clean_text_df(pages).select("url", "text")
    responses = stub_responses_df(spark, sf_dir, ["IO"], ["stub-large"]).join(
        clean.select("url"), "url", "left_semi"
    )
    triples = parsed_triples_df(responses.join(clean, "url"))
    ents = gold_entities(pages)
    cands = doc_candidates(ents, linking_catalog(ents, entity_catalog(ents)))

    def key(rows):
        return sorted(
            (r["url"], r["technique"], r["model"], r["pred_index"], r["head_id"], r["tail_id"])
            for r in rows
        )

    packed = key(resolve_in_document(triples, cands, mode="packed").collect())
    bucketed = key(resolve_in_document(triples, cands, mode="bucketed").collect())
    assert packed == bucketed
    assert len(packed) > 100
    assert any(h is not None for (_, _, _, _, h, _) in packed)


def test_pairs_mode_agrees(spark, sf_dir):
    """The distinct-pair layout resolves identically to packed/bucketed."""
    from relation_extraction_using_llms_spark.functions.extraction import clean_text_df
    from relation_extraction_using_llms_spark.functions.parsing import parsed_triples_df
    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        full_catalog,
    )
    from relation_extraction_using_llms_spark.operators.gold_normalize import (
        gold_entities,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        doc_candidates,
        resolve_in_document,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import (
        pages_df,
        stub_responses_df,
    )

    pages = pages_df(spark, sf_dir).limit(120).cache()
    clean = clean_text_df(pages).select("url", "text")
    responses = stub_responses_df(spark, sf_dir, ["IO"], ["stub-large"]).join(
        clean.select("url"), "url", "left_semi"
    )
    triples = parsed_triples_df(responses.join(clean, "url"))
    ents = gold_entities(pages)
    cat = full_catalog(ents)
    cands = doc_candidates(ents, cat)

    def key(rows):
        return sorted(
            (r["url"], r["pred_index"], r["head_id"], r["tail_id"]) for r in rows
        )

    packed = key(resolve_in_document(triples, cands, mode="packed").collect())
    pairs = key(
        resolve_in_document(
            triples,
            membership_df=ents.select("url", "entity_id"),
            catalog_df=cat,
        ).collect()
    )
    assert pairs == packed
    assert len(pairs) > 100


def test_full_catalog_equals_chain(spark, sf_dir):
    """full_catalog (one salted two-phase pass) row-for-row equals the
    linking_catalog(entity_catalog(...)) chain it replaces."""
    import pyspark.sql.functions as F

    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        entity_catalog,
        full_catalog,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        linking_catalog,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import gold_entities_df

    ents = gold_entities_df(spark, sf_dir).cache()
    chain = linking_catalog(ents, entity_catalog(ents))
    fused = full_catalog(ents)
    cols = [
        "entity_id", "entity_type", "canonical_name", "common_mentions",
        "mention_count", "document_count",
        F.array_sort("exact_forms").alias("exact_forms"),  # set: order-free
        "first20", "created_ord",
    ]

    def key(df):
        return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())

    a, b = key(chain), key(fused)
    assert len(a) == len(b) > 0
    assert a == b


def test_pairs_mode_randomized_parity_with_cascade(spark):
    """Seeded-random adversarial corpus (overlapping surface forms, shared
    prefixes, near-miss mutations, long mentions for the partial stage):
    the pair-grain Spark reduction equals the sequential Python cascade
    run per (url, mention) over the same catalog rows."""
    import random

    import pyspark.sql.functions as F

    from relation_extraction_using_llms_spark.operators.entity_catalog import (
        full_catalog,
    )
    from relation_extraction_using_llms_spark.operators.linking import (
        resolve_in_document,
        resolve_mention_py,
    )

    rng = random.Random(1234)
    base_forms = ["aa", "ab", "ba", "abc", "abd", "xyz", "xyw",
                  "shared token", "shared text", "longer mention text here"]
    pool = [f"E{k}" for k in range(12)]
    ent_forms = {
        e: rng.sample(base_forms, rng.randint(1, 4)) for e in pool
    }
    gold_rows = []
    pred_rows = []
    for d in range(250):
        url = f"https://r/{d:04d}"
        ents = rng.sample(pool, rng.randint(1, 4))
        for e in ents:
            mentions = [
                {"text": rng.choice(ent_forms[e]), "passage_index": 0,
                 "passage_offset": 0, "char_offset": 0, "length": 3}
                for _ in range(rng.randint(1, 3))
            ]
            gold_rows.append((url, e, "GeneOrGeneProduct", mentions))
        for i in range(rng.randint(1, 4)):
            base = rng.choice(base_forms)
            m = {
                0: base,
                1: base.upper(),
                2: base + "x",               # near-miss
                3: base + " factor extra",   # long -> partial stage
                4: "zz-" + str(rng.randint(0, 9)),  # garbage
            }[rng.randint(0, 4)]
            pred_rows.append((url, "IO", "m", i, m, rng.choice(base_forms),
                              "Association", 1.0, None, None))
    schema = ("url string, entity_id string, entity_type string, mentions"
              " array<struct<text:string,passage_index:int,passage_offset:int,"
              "char_offset:int,length:int>>")
    ents_df = spark.createDataFrame(gold_rows, schema)
    preds = spark.createDataFrame(
        pred_rows,
        "url string, technique string, model string, pred_index int,"
        " head_mention string, tail_mention string, relation_type string,"
        " confidence double, head_id string, tail_id string",
    )
    cat = full_catalog(ents_df)
    got = {
        (r["url"], r["pred_index"]): (r["head_id"], r["tail_id"])
        for r in resolve_in_document(
            preds,
            membership_df=ents_df.select("url", "entity_id"),
            catalog_df=cat,
        ).collect()
    }

    # expected: sequential cascade per (url, mention) over the same catalog
    cat_rows = {
        r["entity_id"]: {
            "entity_id": r["entity_id"],
            "canonical_name": r["canonical_name"],
            "common_mentions": list(r["common_mentions"] or []),
            "exact_forms": set(r["exact_forms"] or []),
            "first20": list(r["first20"] or []),
            "created_ord": r["created_ord"],
        }
        for r in cat.collect()
    }
    members: dict = {}
    for url, e, _, _ in gold_rows:
        members.setdefault(url, set()).add(e)
    n_diff = 0
    n_resolved = 0
    for url, _, _, i, hm, tm, _, _, _, _ in pred_rows:
        cands = sorted(
            (cat_rows[e] for e in members.get(url, ())),
            key=lambda c: (c["created_ord"], c["entity_id"]),
        )
        want = (resolve_mention_py(hm, cands), resolve_mention_py(tm, cands))
        n_resolved += want[0] is not None
        if got[(url, i)] != want:
            n_diff += 1
    assert n_diff == 0, n_diff
    assert n_resolved > 100  # the corpus exercises real resolution
