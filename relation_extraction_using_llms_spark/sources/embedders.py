"""Production embedding backends — the M8/M9 deployment story.

The sbert/bertscore strategies (reference sbert_matcher.py:73-268,
bertscore_matcher.py:27-547) and the embedding store run on a pluggable
``embedder``; in this container a deterministic hash embedder stands in
because no model runtime is installed.  These factories wire REAL models
through the SAME injection points with zero operator edits:

    from relation_extraction_using_llms_spark.sources.embedders import (
        sentence_transformer_embedder, http_embedder, single_text)
    from relation_extraction_using_llms_spark.operators.matching import (
        make_embedding_kernel)

    emb = sentence_transformer_embedder("all-MiniLM-L6-v2")   # or
    emb = http_embedder("http://embedding-svc:8080/v1/embeddings",
                        model="text-embedding-3-small")

    # matching strategies (evaluate_counts_df / evaluate_details_df):
    kernels = {"sbert": make_embedding_kernel(single_text(emb))}
    counts = evaluate_counts_df(pred, bundle, kernels=kernels)

    # embedding store / ANN / RAG (embed_df, update_store,
    # rag_context_ann(embedder=...)):
    vectors = embed_df(texts, embedder=emb)

Both factories return plain picklable callables with the
``list[str] -> list[list[float]]`` batch contract ``embed_df`` expects.
The model / HTTP client is constructed lazily INSIDE the callable on
first use and cached per executor process (module-level dict keyed by
config), so the closure ships to executors without dragging model
weights through pickle — the lru_cache-wrapper pitfall documented on
``make_embedding_kernel`` does not apply here.
"""

from __future__ import annotations

import json
import urllib.request

# Per-process caches: executors import this module (the package ships via
# --py-files / PYTHONPATH), so these resolve independently per worker.
_ST_MODELS: dict = {}


def sentence_transformer_embedder(
    model_name: str = "all-MiniLM-L6-v2",
    device: str | None = None,
    batch_size: int = 64,
):
    """Batch embedder backed by ``sentence_transformers`` (the library the
    reference's sbert matcher uses).  Import-guarded: constructing the
    callable never imports the library; the first CALL does, and raises a
    clear error when the dependency is absent."""

    def embed(texts: list[str]) -> list[list[float]]:
        key = (model_name, device)
        model = _ST_MODELS.get(key)
        if model is None:
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "sentence_transformer_embedder requires the "
                    "'sentence-transformers' package on every executor "
                    "(pip install sentence-transformers). For an "
                    "HTTP-served model use http_embedder instead."
                ) from exc
            model = SentenceTransformer(model_name, device=device)
            _ST_MODELS[key] = model
        vecs = model.encode(
            [t or "" for t in texts],
            batch_size=batch_size,
            convert_to_numpy=True,
            show_progress_bar=False,
        )
        return [[float(x) for x in v] for v in vecs]

    return embed


def http_embedder(
    endpoint: str,
    model: str | None = None,
    timeout: float = 30.0,
    headers: dict | None = None,
    max_batch: int = 256,
):
    """Batch embedder for an OpenAI-style embeddings endpoint
    (``POST {input: [texts], model} -> {data: [{embedding: [...]}]}``) —
    pure stdlib, so it ships to executors with no extra dependency.
    Requests are chunked to ``max_batch`` texts (the analogue of the
    reference's batch-50 embedding API calls, embeddings.py:111-138)."""
    base_headers = {"Content-Type": "application/json"}
    base_headers.update(headers or {})

    def embed(texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        clean = [t or "" for t in texts]
        for i in range(0, len(clean), max_batch):
            chunk = clean[i : i + max_batch]
            payload: dict = {"input": chunk}
            if model is not None:
                payload["model"] = model
            req = urllib.request.Request(
                endpoint,
                data=json.dumps(payload).encode("utf-8"),
                headers=base_headers,
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                body = json.loads(resp.read().decode("utf-8"))
            rows = body["data"]
            if len(rows) != len(chunk):
                raise ValueError(
                    f"embedding endpoint returned {len(rows)} vectors "
                    f"for {len(chunk)} inputs"
                )
            out.extend([float(x) for x in r["embedding"]] for r in rows)
        return out

    return embed


def single_text(batch_embedder):
    """Adapt a batch embedder (``list[str] -> list[vec]``) to the
    single-text shape ``make_embedding_kernel`` consumes.  The kernel
    layer adds pair caching; per-text batching happens naturally through
    its cache misses."""

    def embed_one(text: str) -> list[float]:
        return batch_embedder([text])[0]

    return embed_one
