"""BioC JSON scan (SURVEY.md §2.1 S1).

The reference loads BioC JSON dicts per file (generate_clean_text.py:16-25).
Here the same structure arrives as the ``html`` binary column of the pages
table; we parse it JVM-side with ``from_json`` (whole-stage codegen, no
Python) and explode to passage / annotation / location grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOCATION = T.StructType(
    [
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)

ANNOTATION = T.StructType(
    [
        T.StructField(
            "infons",
            T.StructType(
                [
                    T.StructField("identifier", T.StringType()),
                    T.StructField("type", T.StringType()),
                ]
            ),
        ),
        T.StructField("text", T.StringType()),
        T.StructField("locations", T.ArrayType(LOCATION)),
    ]
)

RELATION_INFONS = T.StructType(
    [
        T.StructField("entity1", T.StringType()),
        T.StructField("entity2", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("novel", T.StringType()),
    ]
)

BIOC_RELATION = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("infons", RELATION_INFONS),
    ]
)

PASSAGE = T.StructType(
    [
        T.StructField("offset", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("annotations", T.ArrayType(ANNOTATION)),
    ]
)

BIOC_DOC = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("passages", T.ArrayType(PASSAGE)),
        T.StructField("relations", T.ArrayType(BIOC_RELATION)),
    ]
)

BIOC = T.StructType([T.StructField("documents", T.ArrayType(BIOC_DOC))])


def bioc_docs(pages_df: DataFrame) -> DataFrame:
    """pages -> (url, passages, relations): one row per BioC document.

    The reference treats each file as one document; our html payload holds
    exactly one document per page.
    """
    parsed = pages_df.select(
        "url",
        F.from_json(F.col("html").cast("string"), BIOC).alias("bioc"),
    )
    return parsed.select(
        "url",
        F.element_at("bioc.documents", 1).alias("doc"),
    ).select(
        "url",
        F.col("doc.passages").alias("passages"),
        F.col("doc.relations").alias("relations"),
    )


def passages_df(pages_df: DataFrame) -> DataFrame:
    """Explode to passage grain with the original list position
    (= the reference's ``passage_idx`` in collect_entities)."""
    return bioc_docs(pages_df).select(
        "url", F.posexplode_outer("passages").alias("passage_index", "passage")
    )
