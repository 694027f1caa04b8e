"""Served-model boundary (SURVEY.md §2.1 S9, §2.12 O4).

The reference crosses the network inside per-document threads
(io_prompter.py:174-266: POST /chat/completions with retry/backoff,
base.py:351-523).  Here the model call is a stage contract:

    model_fn(prompts_df: DataFrame[..., prompt]) -> DataFrame[..., response]

Two implementations:

* ``make_stub_model(sf_dir)`` — deterministic stub responses derived from
  the same seeded generator as the gold tables (tests/benchmarks; no
  network).
* ``http_model_fn(endpoint, ...)`` — Arrow-batched ``mapInPandas`` issuing
  batched HTTP calls with exponential backoff and Retry-After handling,
  matching the reference's retry policy.  Requires a live endpoint; unit
  tests exercise only its retry/backoff helper.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def make_stub_model(sf_dir: str):
    """Stub served model: joins the work set with the deterministic
    response table keyed (url, technique, model)."""

    def model_fn(prompts_df: DataFrame) -> DataFrame:
        from .synthetic import stub_responses_df

        spark = prompts_df.sparkSession
        responses = stub_responses_df(spark, sf_dir).select(
            "url", "technique", "model", "response"
        )
        return prompts_df.join(responses, ["url", "technique", "model"], "left").withColumn(
            "response", _coalesce_empty("response")
        )

    return model_fn


def _coalesce_empty(col):
    from pyspark.sql import functions as F

    return F.coalesce(F.col(col), F.lit(""))


def stub_model_fn(prompts_df: DataFrame) -> DataFrame:
    """Default stub when no sf_dir is bound: parses the doc id out of the
    synthetic url and regenerates the response deterministically — works
    only for the synthetic corpus layout."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return make_stub_model(sf_dir)(prompts_df)


# ---------------------------------------------------------------------------
# HTTP path (deployment): batched calls inside mapInPandas.
# ---------------------------------------------------------------------------


def call_with_retry(
    do_request,
    max_retries: int = 10,
    base_delay: float = 2.0,
    retry_429_forever: bool = True,
    max_429_delay: float = 120.0,
    sleep=time.sleep,
):
    """Reference retry policy (base.py:351-523): 5xx/timeouts retried up to
    ``max_retries`` with exponential backoff 2*2^k; 429 retried without
    limit honouring Retry-After (capped); 4xx fail fast."""
    attempt = 0
    attempt_429 = 0
    while True:
        try:
            return do_request()
        except urllib.error.HTTPError as e:
            if e.code == 429 and retry_429_forever:
                retry_after = (
                    e.headers.get("Retry-After") if e.headers is not None else None
                )
                try:
                    delay = float(retry_after)
                except (TypeError, ValueError):
                    delay = min(base_delay * (2**attempt_429), max_429_delay)
                attempt_429 += 1
                sleep(min(delay, max_429_delay))
                continue
            if 400 <= e.code < 500:
                raise
            attempt += 1
            if attempt > max_retries:
                raise
            sleep(base_delay * (2 ** (attempt - 1)))
        except (urllib.error.URLError, TimeoutError):
            attempt += 1
            if attempt > max_retries:
                raise
            sleep(base_delay * (2 ** (attempt - 1)))


def http_model_fn(
    endpoint: str,
    model_field: str = "model",
    timeout: float = 180.0,
    batch_size: int = 16,
):
    """Build a model_fn that POSTs prompts to a served endpoint.

    One request per prompt (chat-completions shape), batched per Arrow
    batch; task-level retry composes with Spark's ``spark.task.maxFailures``
    and the cache anti-join makes re-runs idempotent (SURVEY.md §4).
    """

    def model_fn(prompts_df: DataFrame) -> DataFrame:
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in prompts_df.schema.fields
        ) + ", response string"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                responses = []
                for prompt, model in zip(pdf["prompt"], pdf[model_field]):
                    payload = json.dumps(
                        {
                            "model": model,
                            "messages": [{"role": "user", "content": prompt}],
                        }
                    ).encode()

                    def do_request():
                        req = urllib.request.Request(
                            endpoint,
                            data=payload,
                            headers={"Content-Type": "application/json"},
                        )
                        with urllib.request.urlopen(req, timeout=timeout) as resp:
                            body = json.loads(resp.read().decode())
                        return body["choices"][0]["message"]["content"]

                    try:
                        responses.append(call_with_retry(do_request))
                    except Exception:
                        responses.append("")  # empty-on-error (main.py:1138-1154)
                out = pdf.copy()
                out["response"] = responses
                yield out

        return prompts_df.mapInPandas(run, schema=out_schema)

    return model_fn
