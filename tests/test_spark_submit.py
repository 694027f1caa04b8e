"""spark-submit --py-files deployment contract (north_rule): the packaged
library runs through the real submit path with NO repo on PYTHONPATH —
driver and executors resolve the package from the zip alone."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    home = os.environ.get("SPARK_HOME", "/opt/spark")
    return os.path.join(home, "bin", "spark-submit")


def _make_pkg_zip(path: str) -> str:
    pkg = os.path.join(REPO, "relation_extraction_using_llms_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def test_spark_submit_py_files_end_to_end(tmp_path):
    import pytest

    if not os.path.exists(_spark_submit()):
        pytest.skip("no spark-submit launcher on this host")
    zip_path = _make_pkg_zip(str(tmp_path / "kg_pkg.zip"))
    out = str(tmp_path / "out")
    env = dict(os.environ)
    # prove --py-files supplies the code: strip any path that could leak
    # the package into the driver or the executor workers
    env["PYTHONPATH"] = ""
    env.pop("SPARK_GRAFT_CPUS", None)
    cmd = [
        _spark_submit(),
        "--master", "local[4]",
        "--conf", "spark.driver.memory=4g",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--sf-dir", SF_DIR,
        "--out", out,
        "--limit", "80",
        "--shuffle-partitions", "8",
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["eval_aggregate_rows"] > 0
    assert result["graph_edges"] > 0
    # outputs are real partitioned tables (read back without Spark)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/eval_aggregate/*.parquet')"
    ).fetchone()[0]
    assert n == result["eval_aggregate_rows"]
    buckets = [
        d for d in os.listdir(f"{out}/graph/edges") if d.startswith("subj_bucket=")
    ]
    assert len(buckets) > 1  # bucket-partitioned layout on disk


def test_rag_http_demo_end_to_end(tmp_path):
    """The served-embedder demo (in-process HTTP endpoint -> ANN RAG +
    sbert matching) must stay runnable as a plain python script: one JSON
    line with contexts retrieved and sbert counts produced through the
    endpoint."""
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "rag_http_demo.py"),
            "--sf-dir", SF_DIR,
            "--limit", "15",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # not the repo: the script must self-locate
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)
    assert got["rag_urls_with_context"] > 0
    assert got["sbert_tp"] + got["sbert_fp"] + got["sbert_fn"] > 0
    assert got["endpoint"].startswith("http://127.0.0.1:")


def test_corpus_prep_end_to_end(tmp_path):
    """The composed corpus-prep chain (quality -> PII -> dedup exact +
    MinHash -> decontamination -> sample -> pack -> partitioned shards +
    profile) must stay runnable as a plain python script: one JSON audit
    line with monotone non-increasing survivor counts, and shards /
    profile readable back without Spark."""
    import subprocess
    import sys

    out = str(tmp_path / "prep")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "corpus_prep.py"),
            "--sf-dir", SF_DIR,
            "--out", out,
            "--fraction", "0.8",
            "--mix", "src0:3,src1:1,src2:1,src3:1",
            "--mix-target-tokens", "4000",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # not the repo: the script must self-locate
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)
    chain = [
        got["input"], got["after_quality"], got["after_exact_dedup"],
        got["after_near_dedup"], got["after_decontamination"],
        got["after_sample"], got["after_mix"],
    ]
    assert all(a >= b for a, b in zip(chain, chain[1:])), chain
    assert got["after_sample"] < got["input"]  # the 0.8 sample bites
    assert got["after_mix"] < got["after_sample"]  # unlisted sources drop
    assert got["final_docs"] == got["after_mix"]
    assert got["n_bins"] >= 1
    assert got["profile"]  # at least one source group profiled
    # shards are a real partitioned table, readable without Spark
    groups = [d for d in os.listdir(f"{out}/packed") if d.startswith("group=")]
    assert groups
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/packed/*/*.parquet')"
    ).fetchone()[0]
    assert n == got["final_docs"]
    prof = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/profile/*.parquet')"
    ).fetchone()[0]
    assert prof == len(got["profile"])
