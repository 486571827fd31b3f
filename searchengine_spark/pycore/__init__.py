"""Pure-Python normative semantics (no Spark imports allowed here).

Every function in this subpackage is deterministic (no wall-clock, no
PYTHONHASHSEED-dependent ``hash()``, no randomness) and is the single
source of truth for row-level semantics. The Spark pandas UDFs in
``searchengine_spark.functions`` call these exact functions over Arrow
batches; the single-node oracle in ``searchengine_spark.crawler.oracle``
calls them row-at-a-time. Parity between the two is therefore by
construction, which is how the per-row invariant "byte-identical
extracted text per url" (BASELINE.json input_hint) is made testable.
"""

from searchengine_spark.pycore.textextract import extract_text, extract_links
from searchengine_spark.pycore.tokenizer import tokenize, MAX_TOKEN_LENGTH
from searchengine_spark.pycore.urltools import (
    canonicalize,
    urlhash_sha256,
    xxhash64,
    is_valid_url,
    url_host,
)
from searchengine_spark.pycore.linksim import (
    get_link_similarity,
    should_evaluate_url,
    URL_SIMILARITY_THRESHOLD,
)
from searchengine_spark.pycore.ngrams import (
    ngram_hash_set,
    jaccard,
    MAX_ALLOWED_SIMILARITY,
    DEFAULT_N_GRAM_SIZE,
)

__all__ = [
    "extract_text",
    "extract_links",
    "tokenize",
    "MAX_TOKEN_LENGTH",
    "canonicalize",
    "urlhash_sha256",
    "xxhash64",
    "is_valid_url",
    "url_host",
    "get_link_similarity",
    "should_evaluate_url",
    "URL_SIMILARITY_THRESHOLD",
    "ngram_hash_set",
    "jaccard",
    "MAX_ALLOWED_SIMILARITY",
    "DEFAULT_N_GRAM_SIZE",
]
