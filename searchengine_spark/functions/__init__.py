from searchengine_spark.functions.text import (
    tokens_sql,
    tokens_col,
    extract_text_udf,
    lemma_apply,
)
from searchengine_spark.functions.urls import (
    canonicalize_udf,
    host_col,
    is_valid_sql,
)

__all__ = [
    "tokens_sql",
    "tokens_col",
    "extract_text_udf",
    "lemma_apply",
    "canonicalize_udf",
    "host_col",
    "is_valid_sql",
]
