"""Cross-engine parity of the round-5 text templates on adversarial
docs: empty / whitespace-only / single-token / newline / unicode /
symbol-heavy inputs. The sf0.01 gates exercise the happy path; these
rows exercise the branches (empty token arrays, NULL list folds,
multibyte lengths) where Spark and DuckDB semantics most often drift.
Exact equality required — every template is built libm-free."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

DOCS = [
    (0, "", "en", "srcA"),
    (1, "   \t  ", "en", "srcA"),
    (2, "word", "zh", "srcB"),
    (3, "line one.\n- bullet\nend with…\n\nthe and that have", "en", "srcB"),
    (4, "ümläut Ünïcode ẞtraße 中文 字符 emoji🙂 mix", "de", "srcC"),
    (5, ("dup " * 12).strip(), "en", "srcC"),
    (6, "# ## ... … #tag the of and", "en", "srcA"),
    (7, "The quick brown fox jumps over the lazy dog and that is that",
     "en", "srcB"),
]


@pytest.fixture(scope="module")
def engines(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR)")
    for row in DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?, ?, ?)", list(row))
    return df, con


def _cmp(spark_df, con, sql, sort_cols=("doc_id",)):
    got = (spark_df.toPandas().sort_values(list(sort_cols))
           .reset_index(drop=True))
    want = (con.sql(sql).fetchdf().sort_values(list(sort_cols))
            .reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        assert a == b, (c, a, b)


def test_gopher_quality_edge_parity(engines):
    from cuvs_spark.pipeline.text import gopher_quality, gopher_quality_sql
    df, con = engines
    _cmp(gopher_quality(df), con,
         gopher_quality_sql("SELECT doc_id, text FROM documents"))


def test_classifier_edge_parity(engines, spark):
    from cuvs_spark.pipeline.classify import (classifier_score,
                                              classifier_score_sql,
                                              synthetic_weights)
    df, con = engines
    _cmp(classifier_score(df, synthetic_weights(spark, 256), n_buckets=256,
                          bias_fp=5),
         con,
         classifier_score_sql("SELECT doc_id, text FROM documents",
                              n_buckets=256, bias_fp=5))


def test_dsir_edge_parity(engines):
    from cuvs_spark.pipeline.classify import (dsir_importance,
                                              dsir_importance_sql)
    df, con = engines
    # docs 0/1 have no tokens -> absent from both outputs identically
    _cmp(dsir_importance(df, "lang = 'en'", n_buckets=128), con,
         dsir_importance_sql("SELECT doc_id, text, lang FROM documents",
                             "lang = 'en'", n_buckets=128))


def test_substring_dedup_edge_parity(engines):
    from cuvs_spark.pipeline.dedup import substring_dedup, substring_dedup_sql
    df, con = engines
    _cmp(substring_dedup(df, window=3), con,
         substring_dedup_sql("SELECT doc_id, text FROM documents", 3))


def test_mixture_sample_edge_parity(engines):
    from cuvs_spark.pipeline.sampling import mixture_sample, mixture_sample_sql
    df, con = engines
    rates = {"srcA": 0.7, "srcB": 0.4}
    _cmp(mixture_sample(df, rates, default_rate=0.5)
         .select("doc_id", "source"),
         con,
         "SELECT doc_id, source FROM ("
         + mixture_sample_sql(
             "SELECT doc_id, text, source FROM documents", rates,
             default_rate=0.5).strip() + ")")


def test_nfc_normalize_edge_parity(engines, spark):
    """Composed vs decomposed accents, compatibility chars, empty —
    Python unicodedata NFC and DuckDB nfc_normalize must agree."""
    import duckdb

    from cuvs_spark.pipeline.text import nfc_normalize, nfc_normalize_sql
    rows = [
        (0, "café"),                # composed é
        (1, "café"),               # decomposed e + combining acute
        (2, "Å"),                  # A + ring -> Å
        (3, "ﬁle"),                 # fi ligature (NFC keeps it)
        (4, ""),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    for r in rows:
        con.execute("INSERT INTO docs VALUES (?, ?)", list(r))
    _cmp(nfc_normalize(df), con,
         nfc_normalize_sql("SELECT doc_id, text FROM docs"))
    out = {r["doc_id"]: r for r in nfc_normalize(df).collect()}
    assert out[1]["norm_text"] == "café" and out[1]["changed"] == 1
    assert out[2]["norm_text"] == "Å" and out[2]["changed"] == 1
    assert out[3]["changed"] == 0 and out[5]["changed"] == 0
