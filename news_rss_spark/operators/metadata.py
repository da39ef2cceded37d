"""Page-metadata extraction as an Arrow-batched stage.

Head-parse companion to the body extractor (north-rule "DOM heuristics"):
one ``mapInPandas`` pass turns ``(id, html)`` into typed metadata columns
(headline/author/description/canonical/image/published/title plus the
meta-tag count) via :func:`news_rss_spark.kernel.metax.extract_metadata`.
Embarrassingly parallel — no shuffle; at 100 TB this rides the same scan
as body extraction (call both kernels in one stage when fusing matters).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_rss_spark.kernel.metax import METADATA_FIELDS, extract_metadata

METADATA_DDL = (
    "doc_id string, headline string, author string, description string, "
    "canonical_url string, image string, published string, title string, "
    "n_meta_tags int"
)


def extract_metadata_df(df: DataFrame, html_col: str = "html",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, html) -> one typed metadata row per document."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                m = extract_metadata(html)
                rows.append((str(did),) + tuple(m[k] for k in METADATA_FIELDS))
            yield pd.DataFrame(
                rows, columns=["doc_id", *METADATA_FIELDS])

    return df.select(F.col(id_col), F.col(html_col)) \
             .mapInPandas(fn, METADATA_DDL)
