"""Production embedder backends (sources/embedders.py): the M8/M9
deployment story must need zero operator edits — a served model plugs in
through ``embed_df(embedder=...)`` and ``kernels={"sbert": ...}``.

The HTTP backend is tested for real against an in-process OpenAI-style
endpoint; the sentence-transformers backend runs when the library exists
(skipped in this container) with its import-guard always tested."""

from __future__ import annotations

import importlib.util
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from relation_extraction_using_llms_spark.sources.embedders import (
    http_embedder,
    sentence_transformer_embedder,
    single_text,
)

HAVE_ST = importlib.util.find_spec("sentence_transformers") is not None


def _fake_vec(text: str) -> list[float]:
    # deterministic 4-dim embedding: identical texts collide, others don't
    h = hash(text) & 0xFFFF
    return [float((h >> s) & 0xF) for s in (0, 4, 8, 12)]


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        n = int(self.headers["Content-Length"])
        payload = json.loads(self.rfile.read(n))
        body = json.dumps(
            {"data": [{"embedding": _fake_vec(t)} for t in payload["input"]]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def endpoint():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1/embeddings"
    srv.shutdown()


def test_http_embedder_batches_and_shapes(endpoint):
    emb = http_embedder(endpoint, model="test-model", max_batch=3)
    texts = [f"t{i}" for i in range(8)] + [None]
    vecs = emb(texts)
    assert len(vecs) == 9
    assert all(len(v) == 4 for v in vecs)
    assert vecs[0] == _fake_vec("t0")
    assert vecs[8] == _fake_vec("")  # None -> ""


def test_http_embedder_through_embed_df(spark, endpoint):
    """The served model rides mapInPandas to executors: the closure must
    pickle and the per-batch call must return aligned vectors."""
    from relation_extraction_using_llms_spark.sources.embedding_store import (
        embed_df,
    )

    df = spark.createDataFrame(
        [(f"d{i}", f"text number {i}") for i in range(10)],
        "doc_key string, text string",
    )
    got = {r["doc_key"]: list(r["embedding"]) for r in
           embed_df(df, embedder=http_embedder(endpoint)).collect()}
    assert len(got) == 10
    assert got["d3"] == pytest.approx(_fake_vec("text number 3"))


def test_http_embedder_through_sbert_kernel(spark, endpoint):
    """kernels={'sbert': make_embedding_kernel(single_text(http))} changes
    sbert outcomes end-to-end — the zero-operator-edit deployment path."""
    from relation_extraction_using_llms_spark.operators.matching import (
        evaluate_counts_df,
        make_embedding_kernel,
    )

    pred_df = spark.createDataFrame(
        [("u1", "IO", "m", 0, "text number 7", "text number 7",
          "Association", "H", "T")],
        "url string, technique string, model string, pred_index int,"
        " head_mention string, tail_mention string, relation_type string,"
        " head_id string, tail_id string",
    )
    bundle = spark.createDataFrame(
        [("u1", "R1", "H2", "T2", "Association",
          ["text number 7"], ["text number 7"])],
        "url string, rel_id string, head_id string, tail_id string,"
        " rel_type string, head_mentions array<string>,"
        " tail_mentions array<string>",
    )
    kernel = make_embedding_kernel(single_text(http_embedder(endpoint)))
    row = evaluate_counts_df(
        pred_df, bundle, strategies=["sbert"], with_types_variants=(True,),
        combos=[("IO", "m")], kernels={"sbert": kernel},
    ).collect()[0]
    assert row["tp"] == 1  # identical texts embed identically -> cosine 1


def test_sentence_transformer_import_guard():
    emb = sentence_transformer_embedder("any-model")
    if HAVE_ST:
        pytest.skip("library present; guard path not reachable")
    with pytest.raises(ImportError, match="sentence-transformers"):
        emb(["hello"])


@pytest.mark.skipif(not HAVE_ST, reason="sentence-transformers not installed")
def test_sentence_transformer_embedder_real():  # pragma: no cover - env
    emb = sentence_transformer_embedder()
    vecs = emb(["hello world", "hello world", "goodbye"])
    assert len(vecs) == 3 and len(vecs[0]) > 0
    assert vecs[0] == pytest.approx(vecs[1])
