"""Round-5 operators: hashed-ngram classifier inference, DSIR
importance weights, domain-mixture sampling, duplicated-substring
dedup."""

from __future__ import annotations

import hashlib

import pytest


def _h64(s: str) -> int:
    """Python twin of dedup.H64_SPARK / H64_DUCK."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _weight(b: int) -> int:
    return ((b * 2654435761 + 40503) % 1000003) % 2001 - 1000


def test_classifier_score_matches_python(spark):
    from cuvs_spark.pipeline.classify import classifier_score, synthetic_weights

    docs = spark.createDataFrame(
        [(0, "The cat sat"), (1, "dog"), (2, ""), (3, "a a a")],
        "doc_id long, text string")
    nb = 512
    out = {r["doc_id"]: r for r in
           classifier_score(docs, synthetic_weights(spark, nb),
                            n_buckets=nb, bias_fp=7).collect()}

    def feats(text):
        toks = [t for t in text.lower().split() if t]
        f = [_h64(t) % nb for t in toks]
        f += [_h64(f"{a} {b}") % nb for a, b in zip(toks, toks[1:])]
        return f

    for doc_id, text in [(0, "The cat sat"), (1, "dog"), (2, ""),
                         (3, "a a a")]:
        fs = feats(text)
        score = sum(_weight(b) for b in fs) + 7
        assert out[doc_id]["n_feats"] == len(fs)
        assert out[doc_id]["score_fp"] == score
        assert out[doc_id]["label"] == int(score > 0)


def test_dsir_importance_matches_python(spark):
    from cuvs_spark.pipeline.classify import dsir_importance

    rows = [(0, "alpha beta beta", "en"),
            (1, "alpha gamma", "en"),
            (2, "delta delta beta", "zh"),
            (3, "epsilon", "zh")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    nb = 64
    out = {r["doc_id"]: r for r in
           dsir_importance(docs, "lang = 'en'", n_buckets=nb).collect()}

    buckets = {}
    ct, cr = {}, {}
    for _, text, lang in [(r[0], r[1], r[2]) for r in rows]:
        for t in text.lower().split():
            b = _h64(t) % nb
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    tr = sum(cr.values())
    tt = sum(ct.values())

    def ratio(b):
        return ((ct.get(b, 0) + 1.0) * (tr + float(nb))
                / ((cr[b] + 1.0) * (tt + float(nb))))

    for doc_id, text, _ in rows:
        toks = text.lower().split()
        rs = sorted(ratio(_h64(t) % nb) for t in toks)
        want = sum(rs) / len(toks)
        assert out[doc_id]["n_toks"] == len(toks)
        assert out[doc_id]["mean_ratio"] == pytest.approx(want, rel=1e-12)
    # target-domain docs should score above the off-target ones here
    assert min(out[0]["mean_ratio"], out[1]["mean_ratio"]) > \
        max(out[2]["mean_ratio"], out[3]["mean_ratio"])


def test_mixture_sample_nesting_and_determinism(spark):
    from cuvs_spark.pipeline.sampling import mixture_sample

    docs = spark.createDataFrame(
        [(i, f"t{i}", f"src{i % 3}") for i in range(600)],
        "doc_id long, text string, source string")
    hi = mixture_sample(docs, {"src0": 0.8, "src1": 0.5},
                        default_rate=0.4)
    lo = mixture_sample(docs, {"src0": 0.3, "src1": 0.2},
                        default_rate=0.1)
    hi_ids = {r["doc_id"] for r in hi.collect()}
    lo_ids = {r["doc_id"] for r in lo.collect()}
    # nested rates → subset membership, per domain
    assert lo_ids <= hi_ids
    # membership independent of partitioning
    re_ids = {r["doc_id"]
              for r in mixture_sample(docs.repartition(13),
                                      {"src0": 0.8, "src1": 0.5},
                                      default_rate=0.4).collect()}
    assert re_ids == hi_ids
    # per-domain rates in the right ballpark (200 rows per domain)
    per = {g: sum(1 for i in hi_ids if i % 3 == int(g[-1])) / 200
           for g in ("src0", "src1", "src2")}
    assert 0.65 < per["src0"] < 0.95
    assert 0.35 < per["src1"] < 0.65
    assert 0.25 < per["src2"] < 0.55


def test_substring_dedup_removes_copied_span(spark):
    from cuvs_spark.pipeline.dedup import substring_dedup

    span = "w1 w2 w3 w4 w5 w6 w7 w8"           # exactly one 8-window
    docs = spark.createDataFrame(
        [(0, f"intro {span} outro0"),
         (1, f"other prefix {span} tail1 tail2"),   # copies the span
         (2, "totally unique words here only once"),
         (3, "short doc")],                          # < window tokens
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dedup(docs, window=8).collect()}

    # doc 0 is the first occurrence — untouched
    assert out[0]["n_removed"] == 0
    assert out[0]["clean_text"] == f"intro {span} outro0"
    # doc 1 loses the copied 8-token span, keeps its own words
    assert out[1]["n_removed"] == 8
    assert out[1]["clean_text"] == "other prefix tail1 tail2"
    # unique and short docs untouched
    assert out[2]["n_removed"] == 0
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "short doc"


def test_substring_dedup_exact_copy_fully_removed(spark):
    from cuvs_spark.pipeline.dedup import substring_dedup

    text = " ".join(f"tok{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dedup(docs, window=8).collect()}
    assert out[0]["n_removed"] == 0
    assert out[1]["n_removed"] == 20          # every token covered
    assert out[1]["clean_text"] == ""


def test_gopher_quality_rules(spark):
    from cuvs_spark.pipeline.text import gopher_quality

    good = " ".join(["the quick brown fox jumps over lazy dogs and"
                     " that have with more words here now"] * 5)
    docs = spark.createDataFrame(
        [(0, good),                                   # passes everything
         (1, "# # # " + good),                        # hash symbols
         (2, "- one\n- two\n- three"),                # bullet lines
         (3, "a b c"),                                # too short
         (4, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}

    assert out[0]["gopher_keep"] == 1
    assert out[0]["n_stop_distinct"] >= 2
    assert out[0]["alpha_word_frac"] == 1.0

    assert out[1]["hash_word_ratio"] > 0
    assert out[2]["bullet_line_frac"] == 1.0
    assert out[2]["gopher_keep"] == 0
    assert out[3]["gopher_keep"] == 0
    assert out[4]["n_words"] == 0
    assert out[4]["gopher_keep"] == 0


def test_temperature_rates_properties():
    from cuvs_spark.pipeline.sampling import temperature_rates

    counts = {"big": 90_000, "mid": 9_000, "small": 1_000}
    nat = temperature_rates(counts, 10_000, alpha=1.0)
    # alpha=1 -> natural proportions: every domain sampled at the same
    # rate (budget / total)
    assert all(abs(r - 0.1) < 1e-12 for r in nat.values())

    temp = temperature_rates(counts, 10_000, alpha=0.5)
    # temperature scaling up-weights small domains relative to big ones
    assert temp["small"] > nat["small"]
    assert temp["big"] < nat["big"]
    # rates are valid probabilities and expected totals near budget
    assert all(0.0 <= r <= 1.0 for r in temp.values())
    expected = sum(temp[g] * counts[g] for g in counts)
    assert expected <= 10_000 + 1e-6

    # tiny domain saturates at 1.0 under aggressive uniformity
    uni = temperature_rates(counts, 60_000, alpha=0.0)
    assert uni["small"] == 1.0


def test_dsir_select_rank_vs_threshold(spark):
    from cuvs_spark.pipeline.classify import dsir_select

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} w{i % 11}", "en" if i % 3 else "zh")
         for i in range(120)],
        "doc_id long, text string, lang string")
    ranked = dsir_select(docs, "lang = 'en'", n_keep=40, n_buckets=256)
    rows = ranked.collect()
    assert len(rows) == 40
    ratios = [r["mean_ratio"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert ratios == sorted(ratios, reverse=True)

    thr = dsir_select(docs, "lang = 'en'", n_keep=40, n_buckets=256,
                      method="threshold")
    thr_ids = {r["doc_id"] for r in thr.collect()}
    rank_ids = {r["doc_id"] for r in rows}
    # approximate-threshold keep-set must largely agree with exact rank
    assert len(thr_ids & rank_ids) >= 30
