"""End-to-end training-data curation: the composition a pretraining
pipeline actually runs over a raw document corpus, built from the
operators in this package — every stage partition-parallel, nothing
collected to the driver, cheap JVM filters before expensive candidate
generation (the order is the optimization: quality/language gates drop
rows before any shuffle-heavy dedup runs).

    raw documents
      → quality gate        (JVM expressions; operators/text.quality_score)
      → language filter     (JVM expressions; operators/text.language_id)
      → exact dedup         (one key shuffle; operators/dedup.exact_dedup)
      → near-dup collapse   (MinHash-LSH → Jaccard verify → components;
                             operators/dedup.dedup_clusters)
      → token accounting    (operators/text.token_stats)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_to_ibis_spark.operators import dedup, text


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    languages: list[str] | None = None,
    jaccard_threshold: float = 0.8,
    with_token_stats: bool = True,
) -> DataFrame:
    """Filter, deduplicate, and annotate a document corpus. Returns the
    surviving rows (original columns) plus ``quality_score``,
    ``lang_pred``, and (optionally) token statistics."""
    quality = text.quality_score(df, text_col, id_col).select(
        id_col, "quality_score")
    lang = text.language_id(df, text_col, id_col).select(id_col, "lang_pred")
    out = (
        df.join(quality, id_col)
        .join(lang, id_col)
        .filter(F.col("quality_score") >= min_quality)
    )
    if languages:
        out = out.filter(F.col("lang_pred").isin(list(languages)))
    out = dedup.exact_dedup(out, key_cols=[f"{text_col}_norm"],
                            order_col=id_col, normalize_col=text_col) \
               .drop(f"{text_col}_norm")
    out = dedup.dedup_clusters(out, text_col=text_col, id_col=id_col,
                               jaccard_threshold=jaccard_threshold)
    if with_token_stats:
        stats = text.token_stats(out, text_col, id_col).select(
            id_col, "n_tokens")
        out = out.join(stats, id_col)
    return out
