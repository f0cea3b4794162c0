"""Scalar/vector function helpers (SURVEY.md §2.7/§2.9 U1-U3).

The engine deliberately has almost no custom scalar functions — the
reference's scalar surface is string equality + integer parse (SURVEY.md
§2.7), fully covered by pyspark.sql.functions built-ins. What lives here
is the vector/text expression helpers shared across operators.
"""

from rdf_mapreduce_joins_spark.operators.asof import asof_join
from rdf_mapreduce_joins_spark.operators.dedup import connected_components
from rdf_mapreduce_joins_spark.operators.similarity import (
    as_double_array,
    cosine,
    dot,
    ivf_topk,
    ivf_train,
    l2_norm,
    lit_vector,
)
from rdf_mapreduce_joins_spark.operators.skew import salted_join
from rdf_mapreduce_joins_spark.operators.text import (
    bpe_tokens,
    rolling_hash,
    tokens,
    word_ngrams,
)

__all__ = [
    "as_double_array",
    "asof_join",
    "bpe_tokens",
    "connected_components",
    "cosine",
    "dot",
    "ivf_topk",
    "ivf_train",
    "l2_norm",
    "lit_vector",
    "rolling_hash",
    "salted_join",
    "tokens",
    "word_ngrams",
]
