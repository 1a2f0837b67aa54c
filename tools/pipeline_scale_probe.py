"""Scale probe for the training-data pipeline operators — synthesizes a
docs corpus 40× sf0.1 (plus a 200k embedding table) entirely
executor-side and times the dedup/text/curation paths. Validates the
"would this survive 100×?" claims for the pipeline family the same way
tools/scale_probe.py does for the ANN family. Writes /tmp only.

Usage: python tools/pipeline_scale_probe.py [n_docs] [n_emb]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_emb = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import functions as F

    from cuvs_spark import get_spark

    spark = get_spark("pipeline_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- synthetic docs: deterministic word streams from a 1k vocab,
    # generated executor-side (no driver materialization); the last 5%
    # of ids replay earlier texts → exact dups for the dedup stages
    vocab = ", ".join(f"'w{i}'" for i in range(1000))
    dup_start = int(n_docs * 0.95)
    docs_path = f"/tmp/pipeline_probe_docs_{n_docs}.parquet"
    if not os.path.exists(docs_path):
        (spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"CASE WHEN id >= {dup_start} THEN id - {dup_start} "
                f"ELSE id END").alias("src"))
         .withColumn("text", F.expr(
             f"array_join(transform(sequence(1, 80 + pmod(xxhash64(src), 70)), "
             f"i -> element_at(array({vocab}), "
             f"CAST(pmod(xxhash64(src * 1000 + i), 1000) + 1 AS INT))), ' ')"))
         .select("doc_id", "text")
         .write.mode("overwrite").parquet(docs_path))
    docs = spark.read.parquet(docs_path).repartition(32).cache()
    docs.count()

    from cuvs_spark.pipeline.curate import curate_corpus
    from cuvs_spark.pipeline.dedup import (exact_dedup, minhash_lsh_pairs,
                                           semantic_dedup, simhash_near_dup)
    from cuvs_spark.pipeline.text import doc_fingerprints, repetition_stats

    def timed(key, make):
        # thunk, not DataFrame: plan construction itself runs eager
        # localCheckpoints for the composed pipelines and must be timed.
        # Two passes, min kept — pass 0 absorbs codegen/JIT warmup of
        # the very wide sketch expressions (measured 10× on minhash).
        for _ in range(2):
            t0 = time.time()
            make().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 2)
            if key not in out or dt < out[key]:
                out[key] = dt

    timed("exact_dedup_sec", lambda: exact_dedup(docs))
    timed("minhash_lsh_sec",
          lambda: minhash_lsh_pairs(docs, jaccard_threshold=0.5,
                                    max_bucket_size=1000))
    timed("simhash_near_dup_sec",
          lambda: simhash_near_dup(docs, max_hamming=3, bits=60))
    timed("repetition_stats_sec", lambda: repetition_stats(docs))
    timed("fingerprints_sec",
          lambda: doc_fingerprints(docs, hash_fn="xxhash64"))
    timed("curate_gopher_sec",
          lambda: curate_corpus(docs, min_tokens=10, max_punct_ratio=0.99,
                                near_dup_jaccard=0.8,
                                max_dup_word_frac=0.999,
                                max_top_bigram_frac=0.2))

    # round-4 additions: map-only regex/LM/packing family
    from cuvs_spark.pipeline.dedup import paragraph_dedup
    from cuvs_spark.pipeline.sampling import hash_split, pack_sequences
    from cuvs_spark.pipeline.text import (lm_score, pii_scrub, token_counts,
                                          unigram_lm)
    timed("pii_scrub_sec", lambda: pii_scrub(docs))
    timed("paragraph_dedup_sec", lambda: paragraph_dedup(docs))
    timed("hash_split_sec",
          lambda: hash_split(docs, {"train": 0.9, "val": 0.1}))
    timed("pack_sequences_sec", lambda: pack_sequences(
        token_counts(docs).select(
            "doc_id", F.col("ws_tokens").alias("n_tokens"),
            (F.col("doc_id") % 64).alias("shard")),
        4096, key_col="shard"))
    vocab_df = unigram_lm(docs).localCheckpoint()
    timed("lm_score_sec", lambda: lm_score(docs, vocab_df))

    # round-5 additions: classifier / DSIR / mixture / substring dedup
    from cuvs_spark.pipeline.classify import (classifier_score,
                                              dsir_importance,
                                              synthetic_weights)
    from cuvs_spark.pipeline.dedup import substring_dedup
    from cuvs_spark.pipeline.sampling import mixture_sample
    wts = synthetic_weights(spark, 1 << 20).localCheckpoint()
    timed("classifier_score_sec",
          lambda: classifier_score(docs, wts, n_buckets=1 << 20))
    timed("dsir_importance_sec",
          lambda: dsir_importance(
              docs.withColumn("is_tgt", F.col("doc_id") % 10 < 3),
              "is_tgt", n_buckets=1 << 20))
    timed("mixture_sample_sec",
          lambda: mixture_sample(
              docs.withColumn("source", F.expr("concat('s', doc_id % 8)")),
              {f"s{i}": 0.1 * (i + 1) for i in range(8)}))
    timed("substring_dedup_sec", lambda: substring_dedup(docs, window=8))
    from cuvs_spark.pipeline.bpe import bpe_encode, bpe_train_sample
    merges = bpe_train_sample(docs, n_merges=120, max_docs=2000)
    timed("bpe_encode_counts_sec",
          lambda: bpe_encode(docs, merges, output="counts"))
    from cuvs_spark.pipeline.text import nfc_normalize
    timed("nfc_normalize_sec", lambda: nfc_normalize(docs))

    # round-6 additions: per-domain caps (exact salted select_k vs
    # rate-threshold) and quality-aware keeper selection
    from cuvs_spark.pipeline.dedup import (H64_SPARK,
                                           keep_best_representative)
    from cuvs_spark.pipeline.sampling import cap_per_group
    srcd = docs.withColumn("source", F.expr("concat('s', doc_id % 8)"))
    timed("cap_per_group_exact_sec",
          lambda: cap_per_group(srcd, 5000, group_col="source"))
    timed("cap_per_group_threshold_sec",
          lambda: cap_per_group(srcd, 5000, group_col="source",
                                method="threshold"))
    memb = docs.select(
        "doc_id", F.expr(H64_SPARK.format(s="text")).alias("cluster"))
    scores = docs.select(
        "doc_id", F.length("text").cast("double").alias("score"))
    timed("keep_best_representative_sec",
          lambda: keep_best_representative(memb, scores))

    # round-7 additions: boilerplate lines, token budget (both paths),
    # corpus top-n-grams, BM25 retrieval (10k queries vs the corpus)
    from cuvs_spark.pipeline.dedup import boilerplate_lines
    from cuvs_spark.pipeline.retrieval import bm25_search
    from cuvs_spark.pipeline.sampling import token_budget_sample
    from cuvs_spark.pipeline.text import top_ngrams
    timed("boilerplate_lines_sec",
          lambda: boilerplate_lines(docs, min_docs=3))
    timed("token_budget_exact_sec",
          lambda: token_budget_sample(srcd, 500_000))
    timed("token_budget_rate_sec",
          lambda: token_budget_sample(srcd, 500_000, method="rate"))
    timed("top_ngrams_sec", lambda: top_ngrams(docs, n=2, k=50))
    # BM25 gets its own corpus with a realistic long-tail vocabulary
    # (50k terms → ~460-doc posting lists). The shared probe corpus's
    # 1000-word uniform vocab makes EVERY term a stopword (posting
    # lists ≈ 11% of the corpus), which benchmarks the pathological
    # all-stopword query, not retrieval — that case is what the
    # max_df_frac pruning lever exists for.
    bm_path = f"/tmp/pipeline_probe_bm25_{n_docs}.parquet"
    if not os.path.exists(bm_path):
        (spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(transform(sequence(1, 80 + pmod(xxhash64(id), "
                "70)), i -> CASE WHEN pmod(xxhash64(id * 7 + i), 33) = 0 "
                "THEN concat('s', pmod(xxhash64(i), 10)) "
                "ELSE concat('w', pmod(xxhash64(id * 1000 + i), 50000)) "
                "END), ' ')").alias("text"))
         .write.mode("overwrite").parquet(bm_path))
    bm_docs = spark.read.parquet(bm_path).repartition(32).cache()
    bm_docs.count()
    bm_q = (bm_docs.filter(F.col("doc_id") < 10_000)
            .select(F.col("doc_id").alias("qid"),
                    F.expr("array_join(slice(filter(split(text, "
                           "'\\\\s+'), t -> t <> ''), 1, 5), ' ')")
                    .alias("qtext")))
    # ~3% of token positions are one of 10 stopwords (df ≈ N); content
    # terms have df ≈ 460. Unpruned pays the stopword fan-out
    # (each stopword in a query matches the whole corpus); pruned
    # (max_df_frac=0.01) drops exactly the 10 stopwords.
    timed("bm25_10k_queries_sec", lambda: bm25_search(bm_docs, bm_q, 10))
    timed("bm25_10k_queries_pruned_sec",
          lambda: bm25_search(bm_docs, bm_q, 10, max_df_frac=0.01))

    # round-7 fifth wave: corpus audits + fixed-size Bloom membership
    # + span-removal decontamination (eval = 100 replayed texts)
    from cuvs_spark.pipeline.dedup import (cross_source_dups,
                                           dedup_against_bloom)
    from cuvs_spark.pipeline.text import (decontaminate_remove,
                                          ngram_novelty, vocab_coverage)
    timed("ngram_novelty_sec", lambda: ngram_novelty(docs, 3))
    timed("vocab_coverage_sec", lambda: vocab_coverage(docs, 100))
    timed("cross_source_dups_sec",
          lambda: cross_source_dups(
              docs.withColumn("source",
                              F.expr("concat('s', doc_id % 8)"))))
    # Bloom: base = first 95%, delta = everything (the 5% replays are
    # guaranteed hits); 10 bits/key at 200k keys
    bloom_m = 63 * ((10 * n_docs) // 63 + 1)
    timed("bloom_dedup_against_sec",
          lambda: dedup_against_bloom(
              docs.filter(F.col("doc_id") < dup_start), docs,
              m_bits=bloom_m))
    bench_docs = docs.filter(F.col("doc_id") < 100) \
                     .selectExpr("doc_id AS bench_id", "text")
    timed("decontaminate_remove_sec",
          lambda: decontaminate_remove(docs, bench_docs))

    # round-8 additions: collocation lift, vocab Gini, Borda fusion of
    # the exact + pruned BM25 rankings (hybrid shape without a second
    # retriever), and the MMR diversity re-rank at serving scale
    from cuvs_spark.pipeline.retrieval import borda_fuse, mmr_diversify
    from cuvs_spark.pipeline.text import collocations, vocab_gini
    timed("collocations_sec", lambda: collocations(docs, 50, min_count=5))
    timed("vocab_gini_sec", lambda: vocab_gini(docs))
    bm_exact = bm25_search(bm_docs, bm_q, 10).localCheckpoint()
    bm_pruned = bm25_search(bm_docs, bm_q, 10,
                            max_df_frac=0.01).localCheckpoint()
    timed("borda_fuse_10k_sec",
          lambda: borda_fuse([bm_exact, bm_pruned], 10, depth=10))

    # --- embeddings: clustered gaussians (reuses scale_probe's layout)
    emb_path = f"/tmp/pipeline_probe_emb_{n_emb}.parquet"
    if not os.path.exists(emb_path):
        import numpy as np
        import pandas as pd
        rng = np.random.default_rng(7)
        centers = rng.normal(0, 1, (512, 64))
        dfs = []
        for s in range(0, n_emb, 50_000):
            m = min(50_000, n_emb - s)
            lab = rng.integers(0, 512, m)
            X = (centers[lab] + rng.normal(0, 0.25, (m, 64))).astype("float32")
            dfs.append(pd.DataFrame({
                "vec_id": np.arange(s, s + m, dtype=np.int64),
                "embedding": list(X)}))
        spark.createDataFrame(pd.concat(dfs)) \
            .write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path).repartition(32).cache()
    emb.count()

    t0 = time.time()
    sd = semantic_dedup(emb, n_clusters=512, tau=0.05, method="blas")
    n_dups = sd.filter("is_dup").count()
    out["semantic_dedup_blas_sec"] = round(time.time() - t0, 2)
    out["semantic_dedup_flagged"] = int(n_dups)

    # round-8 embedding audits + MMR at serving scale (10k queries ×
    # 20 candidates each, straight from the embedding table — the
    # unrolled 5-step greedy touches candidates only, so cost tracks
    # n_queries × N × k, never the corpus)
    from cuvs_spark.stats.metrics import (embedding_norm_quantiles,
                                          group_mmd)
    lab = emb.withColumn("label", F.expr("pmod(vec_id, 16)"))
    timed("group_mmd_sec",
          lambda: group_mmd(lab, group_col="label",
                            vec_col="embedding"))
    timed("norm_quantiles_sec",
          lambda: embedding_norm_quantiles(lab, group_col="label",
                                           vec_col="embedding"))
    cand = (emb.select(
        F.expr("CAST(vec_id DIV 20 AS BIGINT)").alias("qid"),
        F.col("vec_id").alias("doc_id"),
        F.expr("CAST(pmod(xxhash64(vec_id), 1000) AS DOUBLE) / 1000.0")
        .alias("rel"),
        F.col("embedding").alias("vec")).localCheckpoint())
    timed("mmr_diversify_10k_sec", lambda: mmr_diversify(cand, 5))

    # round-8 wave-3/4 pipeline ops: chi2 vocabulary selection and
    # importance sampling are one-exchange / map-only and must track
    # corpus size linearly; edit-distance verification cost must track
    # the CANDIDATE count (the 5% dup tail), never n²
    from cuvs_spark.pipeline.classify import chi2_terms
    from cuvs_spark.pipeline.dedup import edit_distance_pairs
    from cuvs_spark.pipeline.sampling import importance_weighted_sample
    labeled = docs.withColumn("lang", F.expr(
        "CASE WHEN pmod(doc_id, 2) = 0 THEN 'en' ELSE 'de' END"))
    timed("chi2_terms_sec",
          lambda: chi2_terms(labeled, "lang = 'en'", 50))
    timed("importance_sample_sec",
          lambda: importance_weighted_sample(
              docs.withColumn("w", F.length("text")), "w"))
    t0 = time.time()
    ed = edit_distance_pairs(docs, 0.2, jaccard_floor=0.5,
                             max_bucket_size=2000)
    out["edit_distance_pairs"] = ed.count()
    out["edit_distance_sec"] = round(time.time() - t0, 2)

    print(json.dumps({"n_docs": n_docs, "n_emb": n_emb, **out}))


if __name__ == "__main__":
    main()
