"""Deterministic synthetic corpus: pages + gold + stub model responses.

Everything derives from the driver-shipped ``documents`` parquet table (we
never invent external data): each documents row becomes one web page whose
html payload is a BioC-like passage JSON (the same shape the reference
extractor consumes, setup_scripts/generate_clean_text.py:16-40), with gold
entities/relations and seeded stub-model responses derived from the same
per-doc RNG.  Generation is distributed (``mapInPandas`` over the documents
scan) — nothing is built driver-side, so the corpus scales with the input.

Entity ids are keyed by vocabulary word (``W:<word>``), so the natural
Zipfian word skew of the corpus produces hot head entities — exactly the
skew the catalog/linking stages must survive (SURVEY.md §4).
"""

from __future__ import annotations

import datetime
import hashlib
import json
import random
from collections.abc import Iterator

import pandas as pd

SEED = 42

ENTITY_TYPES = [
    "GeneOrGeneProduct",
    "DiseaseOrPhenotypicFeature",
    "ChemicalEntity",
    "SequenceVariant",
    "OrganismTaxon",
    "CellLine",
]

# The 8 relation types the reference prompts define (llm_prompter/base.py:123-172).
RELATION_TYPES = [
    "Association",
    "Positive_Correlation",
    "Negative_Correlation",
    "Bind",
    "Cotreatment",
    "Comparison",
    "Drug_Interaction",
    "Conversion",
]

TECHNIQUES = ["IO", "CoT", "ReAct", "RAG"]
MODELS = ["stub-small", "stub-large"]

_BASE_TS = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _rng(*key) -> random.Random:
    digest = hashlib.md5(("|".join(str(k) for k in key)).encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def _entity_id(word: str) -> str:
    return f"W:{word}"


def _surface_forms(word: str) -> list[str]:
    forms = [word, word.upper(), word.capitalize(), f"{word} factor"]
    if len(word) > 4:
        forms.append(word[:3] + ".")
    return forms


def gen_doc(doc_id: int, text: str, lang: str) -> dict:
    """One documents row -> {url, warc_ts, html, text, lang, entities,
    relations}.  Pure function of (SEED, doc_id, text)."""
    rng = _rng(SEED, "doc", doc_id)
    words = [w for w in (text or "").split() if len(w) > 1]
    if not words:
        words = ["empty"]
    vocab = sorted(set(words))
    url = f"https://host{doc_id % 17}.example/docs/{doc_id}"

    n_ent = min(len(vocab), rng.randint(3, 10))
    ent_words = rng.sample(vocab, n_ent)
    entities = []
    for w in ent_words:
        etype = ENTITY_TYPES[int(hashlib.md5(w.encode()).hexdigest(), 16) % len(ENTITY_TYPES)]
        n_mentions = rng.randint(1, 4)
        forms = _surface_forms(w)
        mentions = [rng.choice(forms) for _ in range(n_mentions)]
        entities.append({"id": _entity_id(w), "type": etype, "mentions": mentions})

    # Build passages embedding the mention texts so the validator's
    # mention-in-text checks exercise all cascade branches.
    filler = lambda k: " ".join(rng.choice(words) for _ in range(k))  # noqa: E731
    title_ent = entities[0]["mentions"][0]
    title = f"{title_ent} study of {filler(3)}"
    passages = [{"offset": 0, "text": title, "annotations": []}]
    offset = len(title) + 1
    mention_slots = [(e, m) for e in entities for m in e["mentions"]]
    rng.shuffle(mention_slots)
    n_pass = rng.randint(1, 4)
    per_pass = max(1, len(mention_slots) // n_pass)
    ann_acc: dict[str, dict] = {}
    for p in range(n_pass):
        chunk = mention_slots[p * per_pass : (p + 1) * per_pass] if p < n_pass - 1 else mention_slots[(n_pass - 1) * per_pass :]
        sent_parts = []
        anns = []
        cursor = 0
        for ent, m in chunk:
            lead = filler(rng.randint(1, 3)) + " "
            sent_parts.append(lead)
            cursor += len(lead)
            sent_parts.append(m)
            anns.append(
                {
                    "infons": {"identifier": ent["id"], "type": ent["type"]},
                    "text": m,
                    "locations": [{"offset": offset + cursor, "length": len(m)}],
                }
            )
            cursor += len(m)
            tail = " " + filler(rng.randint(1, 3)) + "."
            sent_parts.append(tail)
            cursor += len(tail)
        ptext = "".join(sent_parts)
        # Adversarial whitespace (byte-identity invariant edge cases):
        shape = rng.random()
        if shape < 0.08:
            ptext = "   " + ptext + "  "
        elif shape < 0.12:
            ptext = ""  # empty passage — dropped by extraction
        elif shape < 0.16:
            ptext = "   "  # whitespace-only — strips to empty
        passages.append({"offset": offset, "text": ptext, "annotations": anns})
        offset += len(ptext) + 1
        for a in anns:
            ann_acc[a["infons"]["identifier"]] = a

    # Gold relations among the doc's entities; a seeded minority reference a
    # missing entity id to exercise the integrity semi-join (G3).
    relations = []
    n_rel = rng.randint(2, min(8, max(2, n_ent * (n_ent - 1) // 2)))
    for k in range(n_rel):
        h, t = rng.sample(entities, 2) if n_ent >= 2 else (entities[0], entities[0])
        head_id, tail_id = h["id"], t["id"]
        if rng.random() < 0.05:
            tail_id = "W:__missing__"
        relations.append(
            {
                "id": f"R{k}",
                "head_id": head_id,
                "tail_id": tail_id,
                "type": rng.choice(RELATION_TYPES),
                "novel": rng.choice(["Novel", "No"]),
            }
        )

    html = json.dumps(
        {
            "documents": [
                {
                    "id": url,
                    "passages": [
                        {
                            "offset": p["offset"],
                            "text": p["text"],
                            "annotations": p["annotations"],
                        }
                        for p in passages
                    ],
                    "relations": [
                        {
                            "id": r["id"],
                            "infons": {
                                "entity1": r["head_id"],
                                "entity2": r["tail_id"],
                                "type": r["type"],
                                "novel": r["novel"],
                            },
                        }
                        for r in relations
                    ],
                }
            ]
        }
    ).encode("utf-8")

    warc_ts = _BASE_TS + datetime.timedelta(
        days=rng.randint(0, 364), seconds=rng.randint(0, 86399)
    )
    page_lang = lang if rng.random() > 0.06 else rng.choice(["de", "es"])
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "lang": page_lang,
        "entities": entities,
        "relations": relations,
    }


# ---------------------------------------------------------------------------
# Stub served model: deterministic response per (url, technique, model).
# Noise rates vary by technique so techniques rank differently downstream.
# ---------------------------------------------------------------------------
_NOISE = {
    # technique: (p_omit, p_wrong_type, p_paraphrase, p_halluc, p_empty)
    "IO": (0.25, 0.10, 0.20, 0.15, 0.04),
    "CoT": (0.15, 0.08, 0.15, 0.10, 0.02),
    "ReAct": (0.10, 0.05, 0.12, 0.08, 0.02),
    "RAG": (0.20, 0.12, 0.25, 0.20, 0.03),
}
_MODEL_BOOST = {"stub-small": 1.0, "stub-large": 0.6}  # multiplier on error rates


def gen_response(doc: dict, technique: str, model: str) -> str:
    """Render the stub model's raw text for one (doc, technique, model)."""
    rng = _rng(SEED, "resp", doc["url"], technique, model)
    p_omit, p_wrong, p_para, p_halluc, p_empty = (
        p * _MODEL_BOOST.get(model, 1.0) for p in _NOISE.get(technique, _NOISE["IO"])
    )
    if rng.random() < p_empty:
        return "I could not identify any relations in this document."

    ent_by_id = {e["id"]: e for e in doc["entities"]}
    out = []
    for rel in doc["relations"]:
        if rel["tail_id"] not in ent_by_id or rel["head_id"] not in ent_by_id:
            continue
        if rng.random() < p_omit:
            continue
        head_e, tail_e = ent_by_id[rel["head_id"]], ent_by_id[rel["tail_id"]]
        head_m, tail_m = head_e["mentions"][0], tail_e["mentions"][0]
        if rng.random() < p_para:
            head_m = rng.choice(_surface_forms(head_e["id"][2:]))
        if rng.random() < p_para:
            tail_m = rng.choice(_surface_forms(tail_e["id"][2:]))
        rtype = rel["type"]
        if rng.random() < p_wrong:
            rtype = rng.choice([t for t in RELATION_TYPES if t != rel["type"]])
        out.append(
            {"head_mention": head_m, "tail_mention": tail_m, "relation_type": rtype}
        )
    n_halluc = sum(1 for _ in doc["relations"] if rng.random() < p_halluc)
    for _ in range(n_halluc):
        out.append(
            {
                "head_mention": f"ghost-{rng.randint(0, 999)}",
                "tail_mention": f"phantom-{rng.randint(0, 999)}",
                "relation_type": rng.choice(RELATION_TYPES),
            }
        )
    if out and rng.random() < 0.08:
        out.append(dict(out[0]))  # duplicate -> redundancy metric

    payload = json.dumps(out)
    style = rng.random()
    if style < 0.35:
        return payload
    if style < 0.55:
        return f"```json\n{payload}\n```"
    if style < 0.70:
        return f"Here are the extracted relations:\n{payload}\nDone."
    if style < 0.85:
        return json.dumps({"relations": out})
    # text-format fallback exercised (parser.py:297-321)
    return "\n".join(
        f"{r['head_mention']} -> {r['tail_mention']}: {r['relation_type']}" for r in out
    )


# ---------------------------------------------------------------------------
# Spark wrappers — distributed generation via mapInPandas over documents.
# ---------------------------------------------------------------------------


def _documents(spark, sf_dir: str, replicas: int = 1):
    """documents scan; ``replicas`` > 1 tiles the corpus with distinct
    doc_ids (deterministic) — used to grow benchmark workloads.

    Each replica's text is vocabulary-salted (every word suffixed with the
    replica tag), so a replicated corpus is N DISTINCT shards — distinct
    entity ids, mentions and surface forms per replica — not N byte-copies.
    Within a replica the corpus keeps its natural Zipfian word repetition;
    across replicas nothing dedups, which is what '24x more data' means."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicas > 1:
        tag = F.concat(F.lit("r"), F.col("_r").cast("string"))
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.when(w == "", w).otherwise(F.concat(w, tag)),
            ),
            " ",
        )
        df = (
            df.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
            )
            .withColumn(
                "doc_id",
                F.col("doc_id") + F.col("_r").cast("long") * F.lit(100_000_000).cast("long"),
            )
            .withColumn("text", salted)
            .drop("_r")
        )
    return df


def pages_df(spark, sf_dir: str, replicas: int = 1):
    """documents parquet -> pages table (input_hint schema)."""
    from ..schemas import PAGES

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_doc(d, t, lg) for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"])]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in rows],
                    "warc_ts": [r["warc_ts"].replace(tzinfo=None) for r in rows],
                    "html": [r["html"] for r in rows],
                    "text": [None] * len(rows),  # force extraction from html
                    "lang": [r["lang"] for r in rows],
                }
            )

    return _documents(spark, sf_dir, replicas).select("doc_id", "text", "lang").mapInPandas(gen, schema=PAGES)


def gold_entities_df(spark, sf_dir: str, replicas: int = 1):
    """Normalized gold entities with mention spans (FIXTURES.md F2)."""
    from ..schemas import GOLD_ENTITIES

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "entity_id": [], "entity_type": [], "mentions": []}
            for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                doc = gen_doc(d, t, lg)
                for e in doc["entities"]:
                    rows["url"].append(doc["url"])
                    rows["entity_id"].append(e["id"])
                    rows["entity_type"].append(e["type"])
                    rows["mentions"].append(
                        [
                            {
                                "text": m,
                                "passage_index": 0,
                                "passage_offset": 0,
                                "char_offset": 0,
                                "length": len(m),
                            }
                            for m in e["mentions"]
                        ]
                    )
            yield pd.DataFrame(rows)

    return _documents(spark, sf_dir, replicas).select("doc_id", "text", "lang").mapInPandas(gen, schema=GOLD_ENTITIES)


def gold_relations_df(spark, sf_dir: str, apply_integrity_filter: bool = True, replicas: int = 1):
    """Gold triples (FIXTURES.md F3).  The integrity semi-join (G3,
    generate_gold_relations.py:130-134) is expressed in Spark by the
    caller when ``apply_integrity_filter`` is False."""
    from ..schemas import GOLD_RELATIONS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "rel_id": [], "head_id": [], "tail_id": [], "rel_type": [], "novel": []}
            for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                doc = gen_doc(d, t, lg)
                ids = {e["id"] for e in doc["entities"]}
                for r in doc["relations"]:
                    if apply_integrity_filter and (r["head_id"] not in ids or r["tail_id"] not in ids):
                        continue
                    rows["url"].append(doc["url"])
                    rows["rel_id"].append(r["id"])
                    rows["head_id"].append(r["head_id"])
                    rows["tail_id"].append(r["tail_id"])
                    rows["rel_type"].append(r["type"])
                    rows["novel"].append(r["novel"])
            yield pd.DataFrame(rows)

    return _documents(spark, sf_dir, replicas).select("doc_id", "text", "lang").mapInPandas(gen, schema=GOLD_RELATIONS)


def stub_responses_df(spark, sf_dir: str, techniques=None, models=None, replicas: int = 1):
    """Served-model stub as a table: one response per (url, technique,
    model).  Stands in for the HTTP inference stage (S9) — the real
    deployment swaps this mapInPandas body for batched endpoint calls with
    in-UDF retry/backoff; the table contract is identical."""
    from ..schemas import LLM_RESPONSES

    techniques = techniques or TECHNIQUES
    models = models or MODELS

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ["url", "technique", "model", "prompt_template_hash", "doc_hash", "response"]}
            for d, t, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                doc = gen_doc(d, t, lg)
                doc_hash = hashlib.sha256((t or "").encode()).hexdigest()[:12]
                for tech in techniques:
                    for model in models:
                        rows["url"].append(doc["url"])
                        rows["technique"].append(tech)
                        rows["model"].append(model)
                        rows["prompt_template_hash"].append(
                            hashlib.sha256(f"{tech}|improved".encode()).hexdigest()[:12]
                        )
                        rows["doc_hash"].append(doc_hash)
                        rows["response"].append(gen_response(doc, tech, model))
            yield pd.DataFrame(rows)

    return _documents(spark, sf_dir, replicas).select("doc_id", "text", "lang").mapInPandas(gen, schema=LLM_RESPONSES)


def embeddings_df(spark, sf_dir: str, replicas: int = 1):
    """embeddings scan; ``replicas`` > 1 tiles the table with distinct
    vec_ids and deterministic replica-salted vectors (uniform [-1, 1) from
    xxhash64(vec_id, replica, dim) — pure JVM expressions), so a
    level-scaled ANN benchmark input is N distinct shards, mirroring
    ``_documents``'s vocabulary salting."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if replicas > 1:
        # dim inference needs one driver-side row (the array length is not
        # in the schema); fail with a clear message on an empty table
        # instead of head()'s TypeError-on-None
        first = df.select("embedding").head()
        if first is None or first[0] is None:
            raise ValueError(
                f"embeddings_df(replicas={replicas}): embeddings table at "
                f"{sf_dir} is empty (or its first embedding is null); "
                "cannot infer the vector dim for replica salting"
            )
        dim = len(first[0])
        salted = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda k: (
                F.pmod(F.xxhash64(F.col("vec_id"), F.col("_r"), k), F.lit(2000))
                / 1000.0
                - 1.0
            ).cast("float"),
        )
        df = (
            df.withColumn(
                "_r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
            )
            .withColumn(
                "vec_id",
                F.col("vec_id")
                + F.col("_r").cast("long") * F.lit(100_000_000).cast("long"),
            )
            .withColumn(
                "embedding",
                F.when(F.col("_r") == 0, F.col("embedding")).otherwise(salted),
            )
            .drop("_r")
        )
    return df
