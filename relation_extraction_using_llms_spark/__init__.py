"""PySpark-native knowledge-graph construction engine.

From-scratch re-architecture of the computation in
``Soeky/relation-extraction-using-llms`` (an LLM-prompted biomedical
relation-extraction pipeline; reference read-only at /root/reference) as
scalable Spark batch stages over a Common-Crawl-style pages table
``(url, warc_ts, html, text, lang)``:

  pages -> clean_text -> prompts -> (served model) responses
        -> parsed triples -> entity linking -> canonical triples
        -> evaluation vs gold (9 matching strategies) -> metrics tables

Everything rides on the DataFrame API; Python logic is confined to
Arrow-batched pandas UDFs / ``applyInPandas`` (never per-row ``F.udf``).
Blueprint: SURVEY.md.  Targets: BASELINE.md.
"""

__version__ = "0.1.0"
