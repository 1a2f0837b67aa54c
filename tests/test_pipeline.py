"""Semantic tests for the LLM-data-pipeline operators: injected
duplicates must actually be found, langid must rank the right list,
multimodal plumbing must round-trip deterministically."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_spark.pipeline import (
    doc_fingerprints,
    exact_dedup,
    language_id,
    minhash_lsh_pairs,
    quality_score,
    simhash_near_dup,
    token_counts,
)
from cuvs_spark.pipeline.multimodal import (
    attach_fake_media,
    image_features,
    resize_media,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
            .cache())


@pytest.fixture(scope="module")
def docs_dup(spark, docs):
    dup = (docs.filter(F.col("doc_id") < 20)
           .select((F.col("doc_id") + 1000).alias("doc_id"), "text"))
    near = (docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
            .select((F.col("doc_id") + 2000).alias("doc_id"),
                    F.concat("text", F.lit(" tail tokens")).alias("text")))
    return docs.unionByName(dup).unionByName(near).cache()


def test_exact_dedup_finds_injected(docs_dup):
    groups = exact_dedup(docs_dup).filter(F.col("n_docs") > 1).collect()
    assert len(groups) == 20
    assert all(g["canonical_id"] < 20 for g in groups)


def test_minhash_lsh_finds_exact_and_near(docs_dup):
    pairs = minhash_lsh_pairs(docs_dup, jaccard_threshold=0.5).collect()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    exact_expected = {(i, i + 1000) for i in range(20)}
    near_expected = {(i, i + 2000) for i in range(20, 40)}
    assert exact_expected <= found, "exact dups must all collide"
    assert len(near_expected & found) >= 18, "near dups should mostly collide"
    for p in pairs:
        if (p["doc_a"], p["doc_b"]) in exact_expected:
            assert p["jaccard"] == 1.0


@pytest.mark.parametrize("n_hashes,band_r", [(32, 4), (16, 8), (24, 6)])
def test_minhash_lsh_parametrized_recall(docs_dup, n_hashes, band_r):
    """The banding knobs are per-corpus tunables: more bands (32×4)
    must keep full recall on exact dups; fewer, longer bands (16×8)
    prune candidates but exact dups (jaccard 1.0) still collide on
    every band. Default coefficients stay prefix-stable."""
    pairs = minhash_lsh_pairs(docs_dup, jaccard_threshold=0.5,
                              n_hashes=n_hashes, band_r=band_r).collect()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    exact_expected = {(i, i + 1000) for i in range(20)}
    assert exact_expected <= found
    # the 4-band default catches most near dups; a deeper table (more
    # bands) must not do worse than 8 of 20, the pruning one may drop more
    near_found = len({(i, i + 2000) for i in range(20, 40)} & found)
    if n_hashes // band_r >= 4:
        assert near_found >= 16, near_found


def test_minhash_bad_banding_raises(docs_dup):
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(docs_dup, n_hashes=16, band_r=5)


def test_simhash_near_dup_finds_exact(docs_dup):
    pairs = simhash_near_dup(docs_dup, max_hamming=0).collect()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert {(i, i + 1000) for i in range(20)} <= found


def test_simhash_banded_equals_all_pairs(docs_dup):
    """Pigeonhole band blocking must reproduce the quadratic join's
    output exactly (the bands are a candidate filter, not an
    approximation)."""
    from cuvs_spark.pipeline.dedup import simhash

    got = {(p["doc_a"], p["doc_b"], p["hamming"])
           for p in simhash_near_dup(docs_dup, max_hamming=6).collect()}
    s = simhash(docs_dup)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    brute = (a.join(b, F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b",
                     F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)")
                     .alias("hamming"))
             .filter(F.col("hamming") <= 6))
    want = {(p["doc_a"], p["doc_b"], p["hamming"]) for p in brute.collect()}
    assert got == want


def test_simhash_near_dup_plan_is_not_all_pairs(docs_dup):
    """The scale guarantee: candidate generation is an equi-join on
    (band, key) — the physical plan must contain no cartesian product
    or nested-loop join."""
    from cuvs_spark.plans.layout import plan_string

    plan = plan_string(simhash_near_dup(docs_dup, max_hamming=6))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_language_id_prefers_planted_stopwords(spark):
    d = spark.createDataFrame(
        [(1, "el perro de la casa y el gato en que vive"),
         (2, "the cat of the house and the dog in it is"),
         (3, "xyzzy plugh")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(d).collect()}
    assert got == {1: "es", 2: "en", 3: "und"}


def test_quality_and_tokens(spark):
    d = spark.createDataFrame([(1, "One two, three! 42 ok")],
                              "doc_id long, text string")
    q = quality_score(d).head()
    assert q["n_tokens"] == 5
    assert q["digit_ratio"] == pytest.approx(2 / 21)
    assert q["punct_ratio"] == pytest.approx(2 / 21)
    t = token_counts(d).head()
    assert t["ws_tokens"] == 5
    assert t["bpe_tokens"] == 7  # One,two,',',three,'!',42,ok


def test_fingerprints_overlap_for_shared_prefix(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame(
        [(1, base), (2, base + " with a different suffix appended here"),
         (3, "completely unrelated content that shares nothing at all ok")],
        "doc_id long, text string")
    fps = doc_fingerprints(d).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    sim12 = len(by_doc[1] & by_doc[2]) / len(by_doc[1] | by_doc[2])
    sim13 = len(by_doc[1] & by_doc[3]) / len(by_doc[1] | by_doc[3])
    assert sim12 > 0.3 > sim13


def test_multimodal_plumbing(spark, docs):
    media = attach_fake_media(docs.limit(8))
    feats = image_features(media).collect()
    assert len(feats) == 8
    assert all(0 <= r["mean_r"] <= 255 for r in feats)
    # determinism: rerun gives identical features
    again = image_features(media).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))
    small = resize_media(media, 4, 3).collect()
    assert all(r["width"] == 4 and r["height"] == 3 for r in small)
    assert all(len(bytes(r["media"])) == 4 * 3 * 3 for r in small)
    vid = media.withColumn("n_frames", F.lit(6))
    frames = sample_frames(vid, every_n=2).collect()
    assert len(frames) == 8 * 3
    assert {r["frame_idx"] for r in frames} == {0, 2, 4}


def test_curate_corpus_stages(spark, docs_dup):
    from cuvs_spark.pipeline.curate import curate_corpus, curate_stats
    cur = curate_corpus(docs_dup, min_tokens=5, langs=None,
                        near_dup_jaccard=0.8)
    stages = {r["doc_id"]: r["stage"] for r in cur.collect()}
    # every doc accounted for exactly once
    assert len(stages) == docs_dup.count()
    # the 20 exact copies (ids 1000+) collapse onto canonicals < 20
    for i in range(20):
        assert stages[i + 1000] == "exact_dup"
        assert stages[i] in ("kept", "near_dup")
    # the near-copies (ids 2020..2039) collapse onto their source
    near_marked = sum(stages[i + 2000] == "near_dup"
                      or stages[i] == "near_dup"
                      for i in range(20, 40))
    assert near_marked >= 18
    stats = {r["stage"]: r["n"] for r in curate_stats(cur).collect()}
    assert stats.get("exact_dup", 0) >= 20
    assert stats.get("kept", 0) > 0


def test_minhash_skew_guard(spark, docs):
    """A boilerplate bucket (many identical docs) is dropped by
    max_bucket_size without touching normal pairs."""
    boiler = spark.createDataFrame(
        [(9000 + i, "same boiler plate text repeated everywhere always forever ok")
         for i in range(30)], "doc_id long, text string")
    corpus = docs.limit(50).unionByName(boiler)
    unguarded = minhash_lsh_pairs(corpus, jaccard_threshold=0.9).collect()
    n_boiler_pairs = sum(p["doc_a"] >= 9000 for p in unguarded)
    assert n_boiler_pairs == 30 * 29 // 2  # quadratic blowup
    guarded = minhash_lsh_pairs(corpus, jaccard_threshold=0.9,
                                max_bucket_size=10).collect()
    assert sum(p["doc_a"] >= 9000 for p in guarded) == 0


def test_pii_scrub(spark):
    from cuvs_spark.pipeline.text import pii_scrub
    df = spark.createDataFrame([
        (1, "mail me at bob.smith+x@sub.example.org today"),
        (2, "server at 192.168.0.1 and call +1 555-123-4567 now"),
        (3, "clean text with no pii at all"),
        (4, "two mails: a@b.co c@d.io"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["clean_text"] == "mail me at <EMAIL> today"
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 0
    assert out[2]["clean_text"] == "server at <IP> and call <PHONE> now"
    assert out[2]["n_ipv4"] == 1 and out[2]["n_phone"] == 1
    assert out[3]["clean_text"] == out[3]["clean_text"] == \
        "clean text with no pii at all"
    assert out[4]["n_email"] == 2
    assert out[4]["clean_text"] == "two mails: <EMAIL> <EMAIL>"


def test_c4_line_filter(spark):
    from cuvs_spark.pipeline.text import c4_line_filter
    text = "\n".join([
        "This line is long enough and ends well.",
        "too short.",                      # < 3 words
        "no terminal punctuation here",    # no [.!?\"] ending
        'A quoted keeper sentence."',
        "",                                # empty
    ])
    df = spark.createDataFrame([(1, text), (2, "")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert out[1]["n_lines"] == 5 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == (
        "This line is long enough and ends well.\n"
        'A quoted keeper sentence."')
    # empty doc: one (empty) line, nothing kept, empty output
    assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""


def test_multimodal_audio_features(spark, docs):
    from cuvs_spark.pipeline.multimodal import audio_features
    media = attach_fake_media(docs.limit(6))
    feats = {r["id"]: r for r in
             audio_features(media, n_samples=2048).collect()}
    assert len(feats) == 6
    for r in feats.values():
        assert 0.0 < r["rms"] <= 1.0
        assert 0.0 < r["zcr"] < 1.0
        assert r["peak"] <= 1.0 and r["duration_s"] == 2048 / 16000
    # deterministic across runs
    again = {r["id"]: r for r in
             audio_features(media, n_samples=2048).collect()}
    assert all(feats[i]["rms"] == again[i]["rms"] for i in feats)


def test_media_embedding_near_dup(spark, docs):
    from cuvs_spark.pipeline.dedup import embedding_near_dup
    from cuvs_spark.pipeline.multimodal import media_embedding
    media = attach_fake_media(docs.limit(10))
    # plant a byte-duplicate payload: id 100 copies id 0's media row
    dup = media.filter(F.col("id") == 0).withColumn("id", F.lit(100))
    emb = media_embedding(media.union(dup), dim=16)
    rows = emb.collect()
    assert all(len(r["vec"]) == 16 for r in rows)
    vecs = {r["id"]: np.array(r["vec"]) for r in rows}
    np.testing.assert_array_equal(vecs[0], vecs[100])
    # embedding-cosine near-dup recovers exactly the planted pair
    pairs = embedding_near_dup(emb, tau=1e-6, id_col="id",
                               vec_col="vec").collect()
    assert {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
            for r in pairs} == {(0, 100)}


def test_unigram_lm_score(spark):
    from cuvs_spark.pipeline.text import lm_score, unigram_lm
    docs = spark.createDataFrame([
        (1, "the the the cat"),
        (2, "the cat"),
        (3, "zyzzyva qwxzj"),          # all tokens unseen elsewhere
    ], "doc_id long, text string")
    vocab = unigram_lm(docs)
    v = {r["w"]: r for r in vocab.collect()}
    assert v["the"]["cnt"] == 4 and v["the"]["total"] == 8
    out = {r["doc_id"]: r for r in lm_score(docs, vocab).collect()}
    # doc 1 is dominated by the most frequent token -> higher mean prob
    assert out[1]["mean_tok_prob"] > out[2]["mean_tok_prob"]
    assert out[1]["oov_frac"] == 0.0
    assert out[3]["n_scored"] == 2 and out[3]["oov_frac"] == 0.0
    # score doc 3 against a vocab trained WITHOUT it: all OOV
    held_out = lm_score(docs.filter("doc_id = 3"),
                        unigram_lm(docs.filter("doc_id < 3")))
    r3 = held_out.collect()[0]
    assert r3["oov_frac"] == 1.0 and r3["mean_tok_prob"] == 0.0


def test_paragraph_dedup(spark):
    from cuvs_spark.pipeline.dedup import paragraph_dedup
    docs = spark.createDataFrame([
        (1, "HEADER\nunique one\nFOOTER"),
        (2, "HEADER\nunique two\nFOOTER"),
        (3, "HEADER\nunique three"),
        (4, ""),                           # empty doc
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # first doc keeps everything
    assert out[1]["clean_text"] == "HEADER\nunique one\nFOOTER"
    assert out[1]["n_removed"] == 0
    # later docs lose the shared header/footer but keep their own line
    assert out[2]["clean_text"] == "unique two"
    assert out[2]["n_removed"] == 2 and out[2]["n_paragraphs"] == 3
    assert out[3]["clean_text"] == "unique three"
    assert out[4]["clean_text"] == "" and out[4]["n_paragraphs"] == 0


def test_mine_hard_negatives(spark, vectors_df, queries_df):
    from cuvs_spark.pipeline.dedup import mine_hard_negatives
    pos = queries_df.select("qid", (F.col("qid") + 1).alias("pos_id"))
    out = mine_hard_negatives(
        queries_df.select("qid", "vec"),
        vectors_df.select("id", "vec"), pos, 5, metric="sqeuclidean")
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == 5
        nids = {r["nid"] for r in rs}
        assert qid not in nids           # self excluded
        assert qid + 1 not in nids       # labeled positive excluded
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]


def test_decontaminate(spark):
    from cuvs_spark.pipeline.text import decontaminate
    eval_text = "the quick brown fox jumps over the lazy sleeping dog today"
    docs = spark.createDataFrame([
        (1, "prefix words " + eval_text + " suffix words"),   # contains it
        (2, "totally unrelated content with no overlapping eight gram "
            "sequence anywhere in this training document at all"),
        (3, eval_text),                                        # exact copy
    ], "doc_id long, text string")
    bench = spark.createDataFrame([(eval_text,)], "text string")
    out = {r["doc_id"]: r for r in
           decontaminate(docs, bench, n=8).collect()}
    assert out[1]["n_contaminated"] > 0
    assert out[2]["n_contaminated"] == 0
    assert out[3]["n_contaminated"] == out[3]["n_grams"] > 0


def test_chunk_documents_boundaries(spark):
    """Chunk windows tile the token stream: stride = chunk - overlap,
    tail kept, consecutive chunks share exactly `overlap` tokens,
    short docs give one chunk, empty docs none."""
    from cuvs_spark.pipeline.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),
         (2, "a b c"),
         (3, "")],
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: 10 tokens, stride 3 -> chunks at 0,3,6,9 => 1+ceil(6/3)=3
    d1 = sorted(k for k in rows if k[0] == 1)
    assert d1 == [(1, 0), (1, 1), (1, 2)]
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"
    assert rows[(1, 2)]["chunk_text"] == "t6 t7 t8 t9"
    assert [rows[k]["n_tokens"] for k in d1] == [4, 4, 4]
    # doc 2: 3 tokens < chunk -> one short chunk
    assert rows[(2, 0)]["chunk_text"] == "a b c"
    assert rows[(2, 0)]["n_tokens"] == 3
    assert len([k for k in rows if k[0] == 2]) == 1
    # doc 3: no tokens -> no rows
    assert not [k for k in rows if k[0] == 3]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_bigram_lm_score_matches_python(spark):
    """Bigram LM: add-one-smoothed conditional pair probabilities vs an
    exact Python reference; unseen pairs and unseen contexts fall back
    to 1/(ctx+V) and 1/V."""
    from collections import Counter

    from cuvs_spark.pipeline.text import bigram_lm, lm_score_bigram

    texts = {1: "the cat sat", 2: "the cat ran", 3: "a dog sat", 4: "x"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    big, ctx, v = bigram_lm(docs)
    out = {r["doc_id"]: r for r in
           lm_score_bigram(docs, big, ctx, v).collect()}

    toks = {k: t.split() for k, t in texts.items()}
    pairs = [(w[i], w[i + 1]) for w in toks.values()
             for i in range(len(w) - 1)]
    cb, cc = Counter(pairs), Counter(p[0] for p in pairs)
    vocab = {t for w in toks.values() for t in w}
    assert v == len(vocab)
    for k, w in toks.items():
        ps = [(cb[(w[i], w[i + 1])] + 1) / (cc[w[i]] + v)
              for i in range(len(w) - 1)]
        assert out[k]["n_pairs"] == len(ps)
        want = sum(ps) / len(ps) if ps else 0.0
        assert abs(out[k]["mean_pair_prob"] - want) < 1e-12
    # held-out doc with an unseen context scores 1/V per pair
    held = spark.createDataFrame([(9, "qq zz")], "doc_id long, text string")
    got = lm_score_bigram(held, big, ctx, v).head()
    assert abs(got["mean_pair_prob"] - 1.0 / v) < 1e-12


def test_tfidf_keywords_matches_python(spark):
    """Rational-IDF TF-IDF top-k vs an exact Python reference,
    including the (score DESC, term ASC) tie order."""
    from collections import Counter

    from cuvs_spark.pipeline.text import tfidf_keywords

    texts = {1: "cat cat dog", 2: "dog fish", 3: "cat fish fish zebra"}
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    out = {}
    for r in tfidf_keywords(docs, 2).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tfidf"]))
    n = len(texts)
    dfreq = Counter(t for txt in texts.values() for t in set(txt.split()))
    for k, txt in texts.items():
        tf = Counter(txt.split())
        scored = sorted(
            ((-tf[t] * ((n + 1) / (dfreq[t] + 1))), t) for t in tf)[:2]
        want = [(i + 1, t, -s) for i, (s, t) in enumerate(scored)]
        assert sorted(out[k]) == want, (k, out[k], want)


def test_multimodal_real_netpbm_decode(spark):
    """Binary PPM/PGM payloads decode for REAL (pure NumPy, no codec
    lib): pixel-exact features end-to-end through the Arrow pipeline,
    header comments handled, PGM replicated to 3 channels, compressed
    magics still raise."""
    import numpy as np
    import pytest
    from cuvs_spark.pipeline.multimodal import (decode_pixels,
                                                image_features,
                                                media_embedding)

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    ppm = b"P6\n# a comment\n5 4\n255\n" + px.tobytes()
    assert (decode_pixels(ppm, 5, 4) == px).all()
    gray = rng.integers(0, 256, (3, 2), dtype=np.uint8)
    pgm = b"P5 2 3 255 " + gray.tobytes()
    assert (decode_pixels(pgm, 2, 3) == gray[..., None]).all()
    with pytest.raises(NotImplementedError, match="JPEG|PNG"):
        decode_pixels(b"\xff\xd8\xff\xe0fakejpeg", 1, 1)

    media = spark.createDataFrame(
        [(7, bytearray(ppm), "image/x-portable-pixmap", 5, 4, 1)],
        "id long, media binary, media_type string, width int, "
        "height int, n_frames int")
    feat = image_features(media).collect()[0]
    assert feat["mean_r"] == px[..., 0].astype(np.float64).mean()
    assert feat["mean_g"] == px[..., 1].astype(np.float64).mean()
    emb = media_embedding(media, dim=16).collect()[0]
    assert len(emb["vec"]) == 16
    assert abs(float(np.linalg.norm(emb["vec"])) - 1.0) < 1e-5


def test_multimodal_real_wav_decode(spark, tmp_path):
    """RIFF/WAV 16-bit PCM decodes for real via the stdlib wave module:
    rms/peak/duration match the synthesized waveform exactly; stereo
    keeps channel 0; MP3 magic raises."""
    import io
    import wave

    import numpy as np
    import pytest
    from cuvs_spark.pipeline.multimodal import audio_features, decode_pcm

    rate, n = 8000, 1600
    t = np.arange(n)
    x = (10000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    payload = buf.getvalue()
    assert (decode_pcm(payload, 0) == x).all()
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_pcm(b"ID3\x04fakemp3", 16)

    media = spark.createDataFrame(
        [(1, bytearray(payload), "audio/wav", 0, 0, 1)],
        "id long, media binary, media_type string, width int, "
        "height int, n_frames int")
    row = audio_features(media).collect()[0]
    xf = x.astype(np.float64) / 32768.0
    assert row["duration_s"] == n / rate
    assert abs(row["rms"] - float(np.sqrt((xf ** 2).mean()))) < 1e-12
    assert row["peak"] == float(np.abs(xf).max())

    # stereo: channel 0 wins
    st = np.stack([x, np.zeros_like(x)], axis=1)
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(st.tobytes())
    assert (decode_pcm(buf2.getvalue(), 0) == x).all()
