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
from cuvs_spark.pipeline.sampling import (  # noqa: F401
    deterministic_sample,
    hash_split,
    pack_sequences,
)
from cuvs_spark.pipeline.text import (  # noqa: F401
    c4_line_filter,
    lm_score,
    pii_scrub,
    unigram_lm,
)
