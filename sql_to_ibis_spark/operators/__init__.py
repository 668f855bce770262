"""Large-scale data-pipeline operators (extensions beyond the reference
surface; the reference has no UDF/stream/pipeline operators — SURVEY §2.9).

Every operator here is designed partition-parallel for 100 TB scale: shuffles
only on bucket/band keys, no driver-side collects of table-sized data, no
all-pairs cross joins, JVM-side expressions wherever the semantics allow and
Arrow-batched pandas UDFs where they don't.
"""

from sql_to_ibis_spark.operators import (dedup, multimodal, similarity,
                                          text, tokenize)

__all__ = ["dedup", "multimodal", "similarity", "text", "tokenize"]
