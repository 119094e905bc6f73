from etly_spark.functions.hashing import (  # noqa: F401
    char_shingles,
    dot_product,
    cosine_similarity,
    md5_hex,
    minhash_signature,
    lsh_bands,
    simhash32,
)
from etly_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    stopword_ratio,
    punct_count,
    quality_score,
    fingerprint,
)
