#!/usr/bin/env python
"""End-to-end served-embedder demo: an OpenAI-style HTTP embedding
endpoint drives BOTH the ANN RAG retriever and the sbert matching
strategy with zero operator edits — the M8/M9 deployment story
(reference sbert_matcher.py:73-268, vector_store.py:188-243) in one
runnable file.

In production the endpoint is your embedding service; here an in-process
HTTP server with a deterministic token-hash model stands in, and the
SAME ``http_embedder`` callable ships to executors (pure stdlib, no
extra dependency):

    python scripts/rag_http_demo.py --sf-dir /root/testdata/sf0.001

or against a real service:

    python scripts/rag_http_demo.py --sf-dir ... \
        --endpoint http://embedding-svc:8080/v1/embeddings --dim 384

Prints ONE JSON line: RAG contexts retrieved through the endpoint +
sbert match counts scored through the same endpoint.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

# plain `python scripts/rag_http_demo.py` from anywhere: resolve the
# package from the repo checkout (spark-submit --py-files also works,
# exactly like scripts/run_pipeline.py)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

DIM = 64  # the in-process stand-in model's width


def _token_hash_vec(text: str, dim: int = DIM) -> list[float]:
    """Deterministic bag-of-tokens embedding: similar texts share token
    buckets, so cosine behaves like a (crude) similarity — enough to
    exercise retrieval ranking end to end."""
    v = [0.0] * dim
    for tok in (text or "").lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big")
        v[h % dim] += 1.0
    return v


def _serve(dim: int = DIM) -> str:
    """Start the in-process stand-in endpoint serving ``dim``-wide
    vectors — the width follows --dim so the LSH projections downstream
    are always built for the vectors actually served."""

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            payload = json.loads(self.rfile.read(n))
            body = json.dumps(
                {
                    "data": [
                        {"embedding": _token_hash_vec(t, dim)}
                        for t in payload["input"]
                    ]
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep stdout to the one JSON line
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}/v1/embeddings"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--endpoint", default=None,
                    help="external embeddings endpoint (default: serve an "
                    "in-process stand-in)")
    ap.add_argument("--dim", type=int, default=DIM,
                    help="embedding width of the served model (keeps every "
                    "ANN plan fully lazy)")
    ap.add_argument("--limit", type=int, default=40)
    args = ap.parse_args()

    endpoint = args.endpoint or _serve(args.dim)

    from relation_extraction_using_llms_spark.session import get_spark

    spark = get_spark("rag-http-demo", master="local[4]", shuffle_partitions=8)

    from relation_extraction_using_llms_spark.functions.extraction import (
        clean_text_df,
    )
    from relation_extraction_using_llms_spark.operators.matching import (
        evaluate_counts_df,
        gold_bundle,
        make_embedding_kernel,
    )
    from relation_extraction_using_llms_spark.operators.similarity import (
        rag_context_ann,
    )
    from relation_extraction_using_llms_spark.plans.pipeline import (
        PipelineConfig,
        rag_snippet_index,
        run_pipeline,
    )
    from relation_extraction_using_llms_spark.sources.embedders import (
        http_embedder,
        single_text,
    )
    from relation_extraction_using_llms_spark.sources.stub_model import (
        make_stub_model,
    )
    from relation_extraction_using_llms_spark.sources.synthetic import pages_df

    emb = http_embedder(endpoint, model="demo-model")

    # 1) ANN RAG retrieval THROUGH the endpoint: embed_df(embedder=emb)
    #    runs inside executors; dim= keeps the LSH plan lazy.
    pages = pages_df(spark, args.sf_dir).limit(args.limit)
    clean = clean_text_df(pages).select("url", "text")
    snippets = rag_snippet_index(clean, 16)
    ctx = rag_context_ann(clean, snippets, k=2, embedder=emb, dim=args.dim)
    n_ctx = ctx.where(ctx.context.isNotNull()).count()

    # 2) sbert matching strategy scored THROUGH the same endpoint: the
    #    kernel ships the picklable http callable to executors; the HTTP
    #    client is built lazily per worker.
    cfg = PipelineConfig(
        techniques=["IO"], models=["stub-large"], strategies=["exact"],
        with_types_variants=(True,),
    )
    stages = run_pipeline(spark, pages, cfg, model_fn=make_stub_model(args.sf_dir))
    bundle = gold_bundle(stages["gold_relations"], stages["gold_entities"])
    counts = evaluate_counts_df(
        stages["resolved"],
        bundle,
        strategies=["sbert"],
        with_types_variants=(True,),
        combos=[("IO", "stub-large")],
        kernels={"sbert": make_embedding_kernel(single_text(emb))},
    )
    agg = counts.groupBy().sum("tp", "fp", "fn").collect()[0]

    print(
        json.dumps(
            {
                "endpoint": endpoint,
                "rag_urls_with_context": n_ctx,
                "sbert_tp": agg["sum(tp)"],
                "sbert_fp": agg["sum(fp)"],
                "sbert_fn": agg["sum(fn)"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
