from cuvs_spark.pipeline.dedup import (  # noqa: F401
    connected_components,
    embedding_near_dup,
    embedding_near_dup_ann,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_lsh,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup,
)
from cuvs_spark.pipeline.text import (  # noqa: F401
    doc_fingerprints,
    language_id,
    quality_score,
    token_counts,
)
