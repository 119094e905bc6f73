from etly_spark.functions.hashing import (  # noqa: F401
    char_shingles,
    cosine_similarity,
    dot_product,
    hamming48,
    l2_norm,
    lsh_bands,
    md5_hex,
    minhash_signature,
    simhash48,
    simhash_bands16,
    token_hash,
)
from etly_spark.functions.text import (  # noqa: F401
    bpe_token_count,
    fingerprint,
    langid,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
