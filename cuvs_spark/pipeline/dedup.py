"""Deduplication operators for training-data pipelines.

Not in the reference (cuVS stops at ANN); these are the canonical
LLM-corpus dedup family (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup) built Spark-first — every hot path is JVM
expression code (md5/conv/bit ops, higher-order array functions),
shuffles only on group/band keys, and each operator ships a DuckDB
oracle twin built from the same hash arithmetic so results hash-match
exactly (integers end-to-end; ratios are single IEEE divisions).

Scale notes (100 TB):
* exact: one shuffle on a 64-bit digest — textbook map-side-combine.
* MinHash-LSH: signatures are a narrow map-only projection; candidate
  generation shuffles on (band, key) — band width tunes the
  recall/cost curve; verification joins only the candidate pairs.
* SimHash: map-only 64→32-bit sketch, then a band-bucketed self-join
  (here: small cross join at test scale; band-prefix blocking at scale).
* embedding near-dup: delegates to the ANN/eps-join machinery.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared hash/tokenize template pairs (Spark SQL, DuckDB SQL).
# ---------------------------------------------------------------------------

# 60-bit md5-based hash of a string expression
H64_SPARK = "CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
H64_DUCK = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"
# 32-bit variant (fits minhash modular arithmetic in int64)
H32_SPARK = "CAST(conv(substr(md5({s}), 1, 8), 16, 10) AS BIGINT)"
H32_DUCK = "CAST(('0x' || substr(md5({s}), 1, 8)) AS BIGINT)"

TOKS_SPARK = "filter(split({s}, '\\\\s+'), t -> t <> '')"
TOKS_DUCK = "list_filter(regexp_split_to_array({s}, '\\s+'), t -> t <> '')"

# word 3-shingles, distinct
SHINGLES_SPARK = (
    "array_distinct(CASE WHEN size({t}) >= 3 THEN "
    "transform(sequence(1, size({t}) - 2), "
    "i -> concat_ws(' ', slice({t}, i, 3))) "
    "ELSE array() END)")
SHINGLES_DUCK = (
    "list_distinct(CASE WHEN len({t}) >= 3 THEN "
    "list_transform(range(1, len({t}) - 1), "
    "i -> array_to_string({t}[i:i+2], ' ')) "
    "ELSE [] END)")

# MinHash parameters: H hash functions a*h32+b mod P, banded r at a time
MINHASH_P = 4_294_967_311          # prime > 2^32
N_HASHES, BAND_R = 16, 4           # default: 4 bands × 4 rows


def _minhash_ab(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients; the first 16 are identical to
    the historical fixed table, so existing oracles keep matching."""
    rng = random.Random(42)
    return [(rng.randrange(1, 1 << 20) * 2 + 1, rng.randrange(1 << 20))
            for _ in range(n_hashes)]


MINHASH_AB = _minhash_ab(N_HASHES)

SIMHASH_BITS = 32


def _doc(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.col(text_col).alias("text"))


def _doc_spread(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # r14: for sketch-heavy operators (minhash, simhash, CDC) spread a
    # narrow input over the cores — no-op when the source already has
    # enough partitions (see plans.layout.spread_narrow); measured
    # 2-4x on the one-file bench tables, while cheap shuffle-bound
    # operators (exact_dedup) stay on the un-spread path
    from cuvs_spark.plans.layout import spread_narrow
    return spread_narrow(_doc(df, id_col, text_col), "doc_id")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

import threading

# FIFO of persisted tables, keyed per SparkSession (not one module
# global — two concurrent sessions must not evict each other's caches)
_PERSISTED: dict = {}
_PERSIST_CAP = 4
_PERSIST_LOCK = threading.Lock()

# Flip to False to keep substring/paragraph dedup fully lazy (no Spark
# job at plan-construction time). The shared hash table may then be
# computed more than once if two downstream stages race to materialize
# the cache concurrently — correct, just slower on first action.
EAGER_PERSIST = True


def _session_stopped(s) -> bool:
    """True iff the session's SparkContext has been stopped (classic
    pyspark nulls ``_jsc`` on stop). Errs toward 'alive' — wrongly
    evicting a live session's FIFO would orphan its cached tables."""
    try:
        return s.sparkContext._jsc is None
    except Exception:
        return False


def _eager_persist(df: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK persist, materialized now (when
    :data:`EAGER_PERSIST`): the eager count guarantees single
    computation even when two downstream stages of one job would
    otherwise race to materialize the cache concurrently (each
    computing every partition). Callers that build plans they may
    never execute can set ``EAGER_PERSIST = False`` to defer the job
    to the first action.

    Persisted tables are tracked in a small per-SparkSession FIFO
    (lock-guarded); older ones are unpersisted once more than
    ``_PERSIST_CAP`` accumulate, so a long-lived session running many
    dedup calls doesn't pin every window-hash table (the pipeline's
    largest intermediates) in executor storage for the session's
    lifetime. An evicted table that a still-lazy consumer reads again
    simply recomputes — correctness is unaffected."""
    from pyspark import StorageLevel
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    if EAGER_PERSIST:
        df.count()
    sess = df.sparkSession
    with _PERSIST_LOCK:
        # drop FIFOs owned by stopped sessions: their executors (and
        # caches) are gone, so the references only pin driver memory —
        # and id() reuse after GC must not hand a new session a stale
        # FIFO, hence the identity check below
        for key in [k for k, (s, _) in _PERSISTED.items()
                    if _session_stopped(s)]:
            del _PERSISTED[key]
        ent = _PERSISTED.get(id(sess))
        if ent is None or ent[0] is not sess:
            ent = (sess, [])
            _PERSISTED[id(sess)] = ent
        fifo = ent[1]
        fifo.append(df)
        evict = fifo[:-_PERSIST_CAP]
        del fifo[:-_PERSIST_CAP]
    for old in evict:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    return df


def _re_lit(sep: str) -> str:
    """Escape a literal separator for use as a Java/RE2 regex (both
    engines' split functions take patterns; '.'/'|' must not explode
    into char-level splits)."""
    return "".join("\\" + c if c in "\\.[]{}()*+?^$|" else c
                   for c in sep)


def exact_dedup(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Group by content digest → ``(text_hash, n_docs, canonical_id)``.

    canonical = lowest doc_id; downstream keeps exactly the canonical
    rows (``anti-join`` on the rest). One shuffle on the digest."""
    d = _doc(df, id_col, text_col)
    return (d.select(F.expr(H64_SPARK.format(s="text")).alias("text_hash"),
                     "doc_id")
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("canonical_id")))


def exact_dedup_sql(doc_sql: str) -> str:
    return f"""
WITH d AS ({doc_sql})
SELECT {H64_DUCK.format(s='text')} AS text_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS canonical_id
FROM d GROUP BY 1
"""


def keep_best_representative(membership: DataFrame, scores: DataFrame, *,
                             id_col: str = "doc_id",
                             cluster_col: str = "cluster",
                             score_col: str = "score") -> DataFrame:
    """Quality-aware keeper selection: within each duplicate cluster
    keep the highest-``score`` member (ties → lowest id) instead of the
    first occurrence — the "keep best, not first" curation variant
    (e.g. prefer the wiki copy of boilerplate over the crawl copy).

    ``membership`` is any (id, cluster) relation — exact-hash groups,
    LSH components, SemDeDup clusters; ``scores`` any (id, score).
    Members with no score row keep their place with score = -inf (a
    scorer that skips docs must not silently delete them from the
    corpus — they can still be the keeper of an all-unscored cluster,
    lowest id winning); rows whose cluster is NULL are rejected (a
    null key would be dropped by the keeper join — cluster unassigned
    docs should not pass through a dedup keeper at all).
    The argmax is ``max(struct(score, -id))`` — one partial-aggregating
    groupBy (map-side combine, skew-safe like the first-occurrence
    keeper in :func:`substring_dedup`) plus a keeper join of one row
    per cluster. Returns ``(doc_id, cluster, score, is_kept)``."""
    memb = membership.select(
        F.col(id_col).cast("long").alias("doc_id"),
        # the check rides the cluster column itself so column pruning
        # can't optimize it away
        F.when(F.col(cluster_col).isNull(),
               F.raise_error(F.lit(
                   "keep_best_representative: NULL cluster key in "
                   "membership")))
        .otherwise(F.col(cluster_col)).alias("cluster"))
    j = (memb
         .join(scores.select(F.col(id_col).cast("long").alias("doc_id"),
                             F.col(score_col).alias("score")),
               "doc_id", "left")
         .select("doc_id", "cluster",
                 F.coalesce(F.col("score").cast("double"),
                            F.lit(float("-inf"))).alias("score")))
    best = (j.groupBy("cluster")
            .agg(F.max(F.struct(F.col("score").alias("s"),
                                (-F.col("doc_id")).alias("n"))).alias("_b")))
    return (j.join(best, "cluster")
            .select("doc_id", "cluster", "score",
                    (F.col("doc_id") == -F.col("_b.n"))
                    .cast("int").alias("is_kept")))


def keep_best_representative_sql(membership_sql: str,
                                 scores_sql: str) -> str:
    """DuckDB twin: ``membership_sql`` → (doc_id, cluster),
    ``scores_sql`` → (doc_id, score)."""
    return f"""
WITH m AS ({membership_sql}),
s AS ({scores_sql}),
-- left join + -inf default mirrors the Spark side: unscored cluster
-- members keep their place (kept only if the whole cluster is
-- unscored, lowest id winning)
j AS (SELECT m.doc_id, m.cluster,
             COALESCE(CAST(s.score AS DOUBLE),
                      CAST('-infinity' AS DOUBLE)) AS score
      FROM m LEFT JOIN s ON m.doc_id = s.doc_id),
b AS (SELECT cluster, max(struct_pack(s := score, n := -doc_id)) AS _b
      FROM j GROUP BY cluster)
SELECT j.doc_id, j.cluster, j.score,
       CAST(CASE WHEN j.doc_id = -(b._b.n) THEN 1 ELSE 0 END AS INT)
         AS is_kept
FROM j JOIN b ON j.cluster = b.cluster
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# the md5 of each shingle is hashed ONCE into an int array ("hs"); the
# 16 minhash folds then run over cheap bigint arrays (16× less md5 work)
HS_SPARK = ("transform(" + SHINGLES_SPARK.format(t=TOKS_SPARK.format(s="text"))
            + ", s -> " + H32_SPARK.format(s="s") + ")")
HS_DUCK = ("list_transform(" + SHINGLES_DUCK.format(t=TOKS_DUCK.format(s="text"))
           + ", s -> " + H32_DUCK.format(s="s") + ")")


def _sig_exprs_spark(hs: str = "hs",
                     n_hashes: int = N_HASHES) -> list[str]:
    return [
        f"array_min(transform({hs}, h -> ({a} * h + {b}) % {MINHASH_P}))"
        for a, b in _minhash_ab(n_hashes)
    ]


def _sig_exprs_duck(hs: str = "hs",
                    n_hashes: int = N_HASHES) -> list[str]:
    return [
        f"list_min(list_transform({hs}, h -> ({a} * h + {b}) % {MINHASH_P}))"
        for a, b in _minhash_ab(n_hashes)
    ]


def _check_bands(n_hashes: int, band_r: int) -> int:
    if n_hashes % band_r:
        raise ValueError(f"n_hashes={n_hashes} not divisible by "
                         f"band_r={band_r}")
    return n_hashes // band_r


def minhash_signatures(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text",
                       n_hashes: int = N_HASHES) -> DataFrame:
    """Per-doc MinHash signature, exploded ``(doc_id, sig_idx, sig)``.

    Map-only: shingling, hashing and the min-fold all run as JVM array
    expressions inside one projection — no shuffle, no Python."""
    # staged projections: tokenizing/shingling/hashing inline would be
    # re-evaluated once per consumer expression — lambda-bearing
    # higher-order functions are excluded from Spark's subexpression
    # elimination, so each stage gets its own column (measured 7×)
    d = (_doc_spread(df, id_col, text_col)
         .withColumn("t", F.expr(TOKS_SPARK.format(s="text")))
         .withColumn("sh", F.expr(SHINGLES_SPARK.format(t="t")))
         .withColumn("hs", F.expr(
             "transform(sh, s -> " + H32_SPARK.format(s="s") + ")")))
    sig = F.expr("array(" + ", ".join(
        _sig_exprs_spark(n_hashes=n_hashes)) + ")")
    return (d.select("doc_id", F.posexplode(sig).alias("sig_idx", "sig"))
            .select("doc_id", F.col("sig_idx").cast("long"), "sig"))


def minhash_signatures_sql(doc_sql: str, n_hashes: int = N_HASHES) -> str:
    exprs = ", ".join(f"({e})" for e in _sig_exprs_duck(n_hashes=n_hashes))
    return f"""
WITH d0 AS ({doc_sql}),
d AS (SELECT doc_id, {HS_DUCK} AS hs FROM d0),
sigs AS (SELECT doc_id, [{exprs}] AS sig FROM d)
SELECT doc_id,
       CAST(generate_subscripts(sig, 1) AS BIGINT) - 1 AS sig_idx,
       unnest(sig) AS sig
FROM sigs
"""


def _bands_array_sql(n_bands: int, band_r: int) -> str:
    """SQL for the banded-signature array
    ``array(struct(b AS band, concat_ws('-', sig[...]) AS key), ...)``.

    Resolves to the exact tree the element-wise Column-API construction
    produced (canonicalized-plan equality verified), but costs one expr
    parse instead of ``n_bands × band_r`` py4j roundtrips per caller."""
    return "array(" + ", ".join(
        "struct({b} AS band, concat_ws('-', {cols}) AS key)".format(
            b=b, cols=", ".join(f"sig[{b * band_r + r}]"
                                for r in range(band_r)))
        for b in range(n_bands)) + ")"


def minhash_lsh_pairs(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text",
                      jaccard_threshold: float = 0.5,
                      max_bucket_size: int | None = None,
                      n_hashes: int = N_HASHES,
                      band_r: int = BAND_R) -> DataFrame:
    """LSH candidate pairs verified by exact shingle Jaccard →
    ``(doc_a, doc_b, jaccard)`` with doc_a < doc_b.

    shingle → minhash → band → bucket-join: candidates shuffle on the
    (band, band_key) pair only; the exact-Jaccard verification join
    touches candidates, never the full corpus square.

    ``n_hashes``/``band_r`` set the (bands × rows) recall/cost curve —
    the S-curve threshold sits near ``(1/b)^(1/r)``, so a 100 TB corpus
    can trade candidate volume for recall per run (e.g. 32×4 catches
    lower-similarity pairs than the default 16×4; 16×8 prunes harder).

    ``max_bucket_size`` is the skew guard for 100 TB corpora:
    boilerplate (empty pages, license headers) lands millions of docs in
    one band bucket, turning the self-join quadratic on a single hot
    key. Buckets above the cap are dropped — their members are
    near-identical en masse and exact dedup already collapses them."""
    n_bands = _check_bands(n_hashes, band_r)
    d = _doc(df, id_col, text_col)
    sig = F.expr("array(" + ", ".join(
        _sig_exprs_spark(n_hashes=n_hashes)) + ")")
    # staged: each expensive lambda expression lands in its own column
    # (HOF lambdas are excluded from subexpression elimination — an
    # inlined tokenizer would run once per consumer, measured 7×)
    docs = (d.withColumn("t", F.expr(TOKS_SPARK.format(s="text")))
            .withColumn("sh", F.expr(SHINGLES_SPARK.format(t="t")))
            .withColumn("hs", F.expr(
                "transform(sh, s -> " + H32_SPARK.format(s="s") + ")"))
            .select("doc_id", sig.alias("sig"), "sh")
            .persist())
    # one SQL-string expression instead of n_bands × band_r Column-API
    # trees: the resolved plan is IDENTICAL (canonicalized-plan equality
    # verified), but constructing it costs one expr parse instead of
    # hundreds of py4j driver roundtrips (~0.5 s → ~0.03 s measured)
    bands = docs.select("doc_id", F.explode(F.expr(
        _bands_array_sql(n_bands, band_r))).alias("bk"))
    if max_bucket_size is not None:
        hot = (bands.groupBy(F.col("bk.band").alias("_hb"),
                             F.col("bk.key").alias("_hk"))
               .count().filter(F.col("count") > max_bucket_size)
               .select("_hb", "_hk"))
        bands = bands.join(
            F.broadcast(hot),
            (F.col("bk.band") == F.col("_hb"))
            & (F.col("bk.key") == F.col("_hk")), "left_anti")
    cand = (bands.alias("x").join(bands.alias("y"),
            (F.col("x.bk.band") == F.col("y.bk.band"))
            & (F.col("x.bk.key") == F.col("y.bk.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_a"),
                    F.col("y.doc_id").alias("doc_b"))
            .distinct())
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    jac = (F.size(F.array_intersect("sha", "shb"))
           / F.size(F.array_union("sha", "shb")))
    return (cand.join(a, "doc_a").join(b, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= jaccard_threshold))


def minhash_lsh_pairs_sql(doc_sql: str, jaccard_threshold: float = 0.5,
                          n_hashes: int = N_HASHES,
                          band_r: int = BAND_R) -> str:
    n_bands = _check_bands(n_hashes, band_r)
    exprs = ", ".join(f"({e})" for e in _sig_exprs_duck(n_hashes=n_hashes))
    sh = SHINGLES_DUCK.format(t=TOKS_DUCK.format(s="text"))
    hs = "list_transform(sh, s -> " + H32_DUCK.format(s="s") + ")"
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || '-' || ".join(f"CAST(sig[{b * band_r + r + 1}] AS VARCHAR)"
                             for r in range(band_r))
        + " AS key FROM sigs"
        for b in range(n_bands))
    return f"""
WITH d0 AS ({doc_sql}),
d1 AS (SELECT doc_id, {sh} AS sh FROM d0),
d AS (SELECT doc_id, sh, {hs} AS hs FROM d1),
sigs AS (SELECT doc_id, [{exprs}] AS sig, sh FROM d),
bands AS ({band_rows}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(a.sh || b.sh)) AS jaccard
FROM cand c JOIN sigs a ON a.doc_id = c.doc_a
            JOIN sigs b ON b.doc_id = c.doc_b
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(a.sh || b.sh)) >= {jaccard_threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, *, id_col: str = "doc_id",
            text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """``bits``-wide SimHash per doc from token hashes — pure integer
    expression pipeline (``bits`` ≤ 60 so the packed sketch stays a
    positive BIGINT; default 32).

    One row per (doc, token) flows into ``bits`` parallel signed-sum
    aggregates (one per bit) with map-side combine, so the shuffle
    carries one ``bits``-column row per doc — no bit-explosion relation.
    """
    assert bits <= 60, "packed sketch must fit a positive BIGINT"
    d = _doc_spread(df, id_col, text_col)
    toks = TOKS_SPARK.format(s="text")
    # bits ≤ 32 → 32-bit md5 token hash (historical/oracle default);
    # wider sketches draw from the 60-bit md5 template — still
    # oracle-exact, and the point of `bits` is bucket cardinality:
    # pigeonhole bands get bits/(h+1) key bits each, so a 60-bit sketch
    # keeps band buckets sparse at corpus scales where 32 bits collide
    h = (H32_SPARK if bits <= 32 else H64_SPARK).format(s="t")
    hs = (d.select("doc_id", F.explode(F.expr(toks)).alias("t"))
          .select("doc_id", F.expr(h).alias("h")))
    aggs = [F.sum(F.expr(
        f"CASE WHEN (h DIV {1 << j}) % 2 = 1 THEN 1 ELSE -1 END"))
        .alias(f"s{j}") for j in range(bits)]
    acc = hs.groupBy("doc_id").agg(*aggs)
    packed = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)" for j in range(bits))
    return acc.select("doc_id", F.expr(packed).alias("simhash"))


def simhash_sql(doc_sql: str, bits: int = SIMHASH_BITS) -> str:
    toks = TOKS_DUCK.format(s="text")
    h = (H32_DUCK if bits <= 32 else H64_DUCK).format(s="t")
    sums = ", ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits))
    packed = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)" for j in range(bits))
    return f"""
WITH d AS ({doc_sql}),
tok AS (SELECT doc_id, unnest({toks}) AS t FROM d),
hs AS (SELECT doc_id, {h} AS h FROM tok),
acc AS (SELECT doc_id, {sums} FROM hs GROUP BY doc_id)
SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM acc
"""


def simhash_near_dup(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     max_hamming: int = 6,
                     bits: int = SIMHASH_BITS) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ ``max_hamming`` →
    ``(doc_a, doc_b, hamming)``.

    Pigeonhole band blocking, never an all-pairs self-join: the
    ``bits``-wide sketch is split into ``max_hamming + 1`` contiguous
    bit-bands, so any pair within ``max_hamming`` differing bits agrees
    EXACTLY on at least one band. Candidates come from an equi-join on
    ``(band, band_bits)`` — the shuffle carries ``(max_hamming+1)·n``
    rows — and are verified with an exact popcount, giving output
    identical to the quadratic formulation at linear-ish cost.

    ``bits`` is the scale knob: band buckets have ``2^(bits/(h+1))``
    possible keys, so the default 32-bit sketch collides past ~10⁵ docs
    (measured: 200k docs × h=3 → 256-key bands → 5·10⁸ candidate
    pairs) while ``bits=60`` keeps buckets sparse into the 10⁸-doc
    range (15-bit bands; choose bits so band width ≥ log2(n_docs) - 10
    or so). Verification cost tracks true near-dups either way."""
    s = simhash(df, id_col=id_col, text_col=text_col, bits=bits)
    nb = max_hamming + 1
    bounds = [round(i * bits / nb) for i in range(nb + 1)]
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.expr(f"(simhash DIV {1 << bounds[i]}) % "
                   f"{1 << (bounds[i + 1] - bounds[i])}").alias("key"))
        for i in range(nb)])
    sb = (s.select("doc_id", "simhash", F.explode(bands).alias("b"))
          .select("doc_id", "simhash", F.col("b.band").alias("band"),
                  F.col("b.key").alias("key")))
    # The self-join would compute the whole sketch pipeline TWICE (once
    # per side): the two Exchange subtrees never canonicalize equal, so
    # neither static nor AQE runtime exchange reuse fires — the FINAL
    # plan shows two tokenize-explode + bit-sum towers under both the
    # broadcast and hinted-SMJ shapes. Materialize the banded sketch
    # (~(h+1)·n rows of 4 small columns) once and feed both sides from
    # it; a fresh construction re-materializes, so nothing is reused
    # across runs. Measured at the 200k-doc probe: 5.06 → 3.30 s.
    sb = sb.localCheckpoint()
    a = sb.select(F.col("doc_id").alias("doc_a"),
                  F.col("simhash").alias("ha"), "band", "key")
    b = sb.select(F.col("doc_id").alias("doc_b"),
                  F.col("simhash").alias("hb"), "band", "key")
    cand = (a.join(b, ["band", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "ha", "hb").distinct())
    ham = F.expr("CAST(bit_count(ha ^ hb) AS BIGINT)")
    return (cand.select("doc_a", "doc_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def simhash_near_dup_sql(doc_sql: str, max_hamming: int = 6,
                         bits: int = SIMHASH_BITS) -> str:
    return f"""
WITH s AS ({simhash_sql(doc_sql, bits)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

NGRAM_SPARK = ("array_distinct(CASE WHEN length({s}) >= {n} THEN "
               "transform(sequence(1, length({s}) - {n} + 1), "
               "i -> substr({s}, i, {n})) ELSE array() END)")
NGRAM_DUCK = ("list_distinct(CASE WHEN length({s}) >= {n} THEN "
              "list_transform(range(1, length({s}) - {n} + 2), "
              "i -> substr({s}, CAST(i AS INT), {n})) ELSE [] END)")


def ngram_jaccard_pairs(df: DataFrame, n: int = 3, *, id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.0,
                        max_docs: int | None = None) -> DataFrame:
    """Character n-gram Jaccard similarity for all doc pairs →
    ``(doc_a, doc_b, jaccard)``. All-pairs is for corpora already
    blocked/bucketed (use minhash_lsh_pairs to generate candidates at
    scale)."""
    d = _doc(df, id_col, text_col)
    if max_docs is not None:
        d = d.filter(F.col("doc_id") < max_docs)
    g = d.select("doc_id", F.expr(NGRAM_SPARK.format(s="text", n=n)).alias("g"))
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    jac = (F.size(F.array_intersect("ga", "gb")).cast("double")
           / F.size(F.array_union("ga", "gb")))
    return (a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def ngram_jaccard_lsh(df: DataFrame, n: int = 3, *, id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.0,
                      lsh_jaccard_threshold: float = 0.3,
                      max_bucket_size: int | None = None) -> DataFrame:
    """Character n-gram Jaccard computed ONLY on MinHash-LSH candidate
    pairs → ``(doc_a, doc_b, jaccard)`` — the composed scale path:
    ``ngram_jaccard_pairs`` is the all-pairs verification kernel, this
    routes it behind the banded bucket join so cost tracks the
    candidate count, never the corpus square."""
    cand = minhash_lsh_pairs(
        df, id_col=id_col, text_col=text_col,
        jaccard_threshold=lsh_jaccard_threshold,
        max_bucket_size=max_bucket_size).select("doc_a", "doc_b")
    d = _doc(df, id_col, text_col)
    g = d.select("doc_id",
                 F.expr(NGRAM_SPARK.format(s="text", n=n)).alias("g"))
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    jac = (F.size(F.array_intersect("ga", "gb")).cast("double")
           / F.size(F.array_union("ga", "gb")))
    return (cand.join(a, "doc_a").join(b, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def ngram_jaccard_lsh_sql(doc_sql: str, n: int = 3,
                          threshold: float = 0.0,
                          lsh_jaccard_threshold: float = 0.3) -> str:
    g = NGRAM_DUCK.format(s="text", n=n)
    return f"""
WITH cand0 AS ({minhash_lsh_pairs_sql(doc_sql, lsh_jaccard_threshold)}),
d AS ({doc_sql}),
g AS (SELECT doc_id, {g} AS g FROM d)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         / len(list_distinct(a.g || b.g)) AS jaccard
FROM cand0 c JOIN g a ON a.doc_id = c.doc_a
             JOIN g b ON b.doc_id = c.doc_b
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        / len(list_distinct(a.g || b.g)) >= {threshold}
"""


def ngram_jaccard_pairs_sql(doc_sql: str, n: int = 3,
                            threshold: float = 0.0) -> str:
    g = NGRAM_DUCK.format(s="text", n=n)
    return f"""
WITH d AS ({doc_sql}),
g AS (SELECT doc_id, {g} AS g FROM d)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         / len(list_distinct(a.g || b.g)) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        / len(list_distinct(a.g || b.g)) >= {threshold}
"""


# ---------------------------------------------------------------------------
# Embedding near-dup (cosine eps-join)
# ---------------------------------------------------------------------------

def embedding_near_dup(emb: DataFrame, tau: float = 0.3, *,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs by cosine distance ≤ tau →
    ``(doc_a, doc_b, distance)``; the eps/ANN machinery does the work."""
    from cuvs_spark.operators.pairwise import epsilon_neighborhood
    X = emb.select(F.col(id_col).cast("long").alias("id"),
                   F.col(vec_col).alias("vec"))
    adj = epsilon_neighborhood(X, None, tau, "cosine")
    return (adj.filter(F.col("i") < F.col("j"))
            .select(F.col("i").alias("doc_a"), F.col("j").alias("doc_b"),
                    "distance"))


def embedding_near_dup_ann(emb: DataFrame, tau: float = 0.3, *,
                           n_lists: int = 16, n_probes: int = 4,
                           k: int = 20, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           centroids=None) -> DataFrame:
    """The IVF-bucketed scale path for embedding near-dup: instead of
    the all-pairs eps join, every doc retrieves its ``k`` approximate
    neighbors from an IVF index (candidate cost n·k, partition-pruned
    by coarse list) and pairs are kept at cosine distance ≤ ``tau``.
    → ``(doc_a, doc_b, distance)`` with doc_a < doc_b.  Recall vs the
    exact eps join is driver-gated as a quality scalar."""
    from cuvs_spark.operators.ivf_flat import ivf_flat_build, ivf_flat_search
    X = emb.select(F.col(id_col).cast("long").alias("id"),
                   F.col(vec_col).alias("vec"))
    idx = ivf_flat_build(X, n_lists, metric="cosine", centroids=centroids)
    q = X.select(F.col("id").alias("qid"), F.col("vec").alias("qv"))
    nn = ivf_flat_search(idx, q, k + 1, n_probes, qvec_col="qv")
    return (nn.filter((F.col("distance") <= tau)
                      & (F.col("qid") < F.col("nid")))
            .select(F.col("qid").alias("doc_a"),
                    F.col("nid").alias("doc_b"), "distance"))


def embedding_near_dup_sql(tau: float = 0.3) -> str:
    from cuvs_spark.functions.distance import distance_sql_duckdb
    dist = distance_sql_duckdb("cosine", "a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, {dist} AS distance
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {dist} <= {tau}
"""


# ---------------------------------------------------------------------------
# Near-dup canonicalization: connected components over dup pairs
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, *, max_iterations: int = 20,
                         a_col: str = "doc_a",
                         b_col: str = "doc_b") -> DataFrame:
    """Collapse near-duplicate pairs into groups →
    ``(doc_id, canonical_id)`` with canonical = min id per component
    (the ANN-join + connected-components dedup finisher, SURVEY §2.8).

    Distributed min-label propagation over the (small) dup-pair edge
    table; each round is one join + groupBy-min and the label table is
    one row per endpoint node; converges in O(component diameter)
    rounds. Dup components are shallow in practice (stars around a
    canonical), so 2-3 rounds is typical."""
    from pyspark.sql import Observation

    e = pairs.select(F.col(a_col).cast("long").alias("a"),
                     F.col(b_col).cast("long").alias("b"))
    # materialize the edge table once: its lineage (an LSH/ANN join) is
    # otherwise re-derived by BOTH jobs of EVERY propagation round.
    # r15 (guide §1.2 — remove passes): the edge count is OBSERVED
    # during the checkpoint's own materialization job, so the separate
    # isEmpty scan job disappears (same boolean: count == 0).
    obs_e = Observation()
    und = (e.unionByName(e.select(F.col("b").alias("a"),
                                  F.col("a").alias("b"))).distinct()
           .observe(obs_e, F.count(F.lit(1)).alias("n"))
           .localCheckpoint())
    if obs_e.get["n"] == 0:
        # no dup pairs at all (common on clean corpora): skip the
        # label-table checkpoint and the first propagation round
        return und.select(F.col("a").alias("doc_id"),
                          F.col("b").alias("canonical_id"))
    # round 1 fused into init (r14): with labels == ids the first
    # propagation is min(id, min neighbor id) per node — one aggregation
    # over the checkpointed edges, no labels join, no separate
    # label-table checkpoint job
    labels = (und.groupBy(F.col("a").alias("id"))
              .agg(F.least(F.first("a"), F.min("b")).alias("lbl"))
              ).localCheckpoint()
    for _ in range(max_iterations - 1):
        neigh = (und.join(labels.withColumnRenamed("id", "b")
                          .withColumnRenamed("lbl", "nl"), "b")
                 .groupBy("a").agg(F.min("nl").alias("nl"))
                 .withColumnRenamed("a", "id"))
        # carry the previous label through the propagation select so
        # convergence reads off the checkpointed output — the old
        # change-detection join re-shuffled new_labels against labels
        # every round just to compare a column each row already had
        # (r14, guide §2.4: one join per round, not two).
        # r15: the changed-label count is OBSERVED during the
        # checkpoint's materialization job itself, so the per-round
        # stability scan of the label table (a whole extra job, and at
        # scale a full pass over the labels) disappears — the boolean
        # is the same: no row with lbl != _prev.
        obs = Observation()
        merged = (labels.join(neigh, "id", "left")
                  .select("id", F.col("lbl").alias("_prev"),
                          F.least("lbl", F.coalesce("nl", "lbl"))
                          .alias("lbl"))
                  .observe(obs, F.sum(F.expr(
                      "CASE WHEN lbl != _prev THEN 1 ELSE 0 END"))
                      .alias("n_changed"))
                  .localCheckpoint())
        n_changed = obs.get["n_changed"]
        labels = merged.select("id", "lbl")
        if n_changed is None or n_changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("lbl").alias("canonical_id"))


def connected_components_sql(pairs_sql: str) -> str:
    """DuckDB oracle: recursive transitive closure + min ancestor —
    reaches the same fixpoint as the label propagation."""
    return f"""
WITH RECURSIVE p AS ({pairs_sql}),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM p
  UNION SELECT doc_b AS a, doc_a AS b FROM p),
nodes AS (SELECT DISTINCT a AS id FROM und),
reach(a, b) AS (
  SELECT id AS a, id AS b FROM nodes
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a
"""


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup): cluster embeddings, prune within clusters
# ---------------------------------------------------------------------------

def semantic_dedup(emb: DataFrame, *, n_clusters: int = 8,
                   tau: float = 0.15, centroids: DataFrame | None = None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   method: str = "expr") -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    space, then inside each cluster mark a document as a semantic
    duplicate when a lower-id cluster-mate sits within cosine distance
    ``tau``. → ``(id, cluster, is_dup)``.

    ``centroids`` accepts a ``(label, cv)`` frame (e.g. from
    ``cluster.kmeans.fit``); the default — the ``n_clusters``
    smallest-id embeddings — is deterministic and oracle-reproducible.

    Scale shape: assignment is a broadcast argmin join emitting one row
    per doc (ties → lowest label, matching the kmeans oracle); the dup
    check self-joins WITHIN a cluster bucket only — candidate cost
    Σ|cluster|², the SemDeDup design point (at 100 TB raise
    ``n_clusters`` to ~10⁵ so buckets stay small; the centroid table
    stays broadcastable).

    ``method="expr"`` is the oracle-exact declarative join;
    ``method="blas"`` replaces the within-cluster join with one
    ``applyInPandas`` GEMM per cluster bucket (cosine Gram matrix,
    lower-id rule via a sorted mask) — no per-pair rows ever
    materialize, throughput tracks BLAS."""
    from cuvs_spark.functions.distance import distance_sql_spark

    X = emb.select(F.col(id_col).cast("long").alias("id"),
                   F.col(vec_col).alias("vec"))
    if centroids is None:
        centroids = (X.orderBy("id").limit(n_clusters)
                     .select(F.col("id").alias("label"),
                             F.col("vec").alias("cv")))
    if method == "blas":
        import numpy as np
        import pandas as pd

        crows = sorted(centroids.collect(), key=lambda r: r["label"])
        labels = np.array([r["label"] for r in crows], dtype=np.int64)
        C = np.vstack([np.asarray(r["cv"], dtype=np.float64)
                       for r in crows])
        Cn = C / np.where((nc := np.sqrt((C * C).sum(1, keepdims=True)))
                          == 0.0, 1.0, nc)
        bc = X.sparkSession.sparkContext.broadcast((labels, Cn))

        def assign_batches(batches):
            labels, Cn = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                Xb = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
                nrm = np.sqrt((Xb * Xb).sum(1, keepdims=True))
                nrm[nrm == 0.0] = 1.0
                # cosine argmin == argmax similarity; first-max rule
                # gives the lowest-label tie-break (labels sorted)
                lab = labels[np.argmax((Xb / nrm) @ Cn.T, axis=1)]
                pdf = pdf.assign(cluster=lab)
                yield pdf[["id", "vec", "cluster"]]

        assigned = X.mapInPandas(
            assign_batches, "id long, vec array<float>, cluster long")

        def find_dups(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values("id").reset_index(drop=True)
            X = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((X * X).sum(1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            S = (X / nrm) @ (X / nrm).T        # cosine similarity Gram
            D = 1.0 - S
            # dup iff any strictly-lower-id row within tau
            mask = np.tril(D <= tau, k=-1).any(axis=1)
            return pd.DataFrame({"id": pdf["id"].to_numpy(),
                                 "cluster": pdf["cluster"].to_numpy(),
                                 "is_dup": mask})
        return assigned.groupBy("cluster").applyInPandas(
            lambda pdf: find_dups(pdf),
            "id long, cluster long, is_dup boolean")
    dist_c = F.expr(distance_sql_spark("cosine", "vec", "cv"))
    assigned = (X.join(F.broadcast(centroids))
                .select("id", "vec",
                        F.struct(dist_c.alias("d"),
                                 F.col("label").alias("l")).alias("_s"))
                .groupBy("id", "vec").agg(F.min("_s").alias("_b"))
                .select("id", "vec", F.col("_b.l").alias("cluster")))
    a = assigned.alias("a")
    b = (assigned.select(F.col("id").alias("bid"),
                         F.col("vec").alias("bvec"),
                         F.col("cluster").alias("bcluster")).alias("b"))
    dist_ab = F.expr(distance_sql_spark("cosine", "a.vec", "bvec"))
    dups = (a.join(b, (F.col("a.cluster") == F.col("bcluster"))
                   & (F.col("bid") < F.col("a.id")))
            .filter(dist_ab <= tau)
            .select(F.col("a.id").alias("id")).distinct()
            .withColumn("_dup", F.lit(True)))
    return (assigned.join(dups, "id", "left")
            .select("id", "cluster",
                    F.coalesce("_dup", F.lit(False)).alias("is_dup")))


def semantic_dedup_sql(n_clusters: int = 8, tau: float = 0.15,
                       emb_sql: str = "SELECT vec_id AS id, embedding "
                                      "AS vec FROM embeddings") -> str:
    from cuvs_spark.functions.distance import distance_sql_duckdb
    d_assign = distance_sql_duckdb("cosine", "X.vec", "c.cv")
    d_pair = distance_sql_duckdb("cosine", "x.vec", "y.vec")
    return f"""
WITH X AS ({emb_sql}),
c AS (SELECT id AS label, vec AS cv FROM X ORDER BY id LIMIT {n_clusters}),
scored AS (
  SELECT X.id AS id, X.vec AS vec, c.label AS label,
         row_number() OVER (PARTITION BY X.id
                            ORDER BY {d_assign} ASC, c.label ASC) AS rn
  FROM X CROSS JOIN c
),
a AS (SELECT id, vec, label AS cluster FROM scored WHERE rn = 1),
dup AS (
  SELECT DISTINCT x.id FROM a x JOIN a y
  ON x.cluster = y.cluster AND y.id < x.id
  WHERE {d_pair} <= {tau}
)
SELECT a.id AS id, a.cluster AS cluster,
       (d.id IS NOT NULL) AS is_dup
FROM a LEFT JOIN dup d ON a.id = d.id
"""


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (RefinedWeb-style)
# ---------------------------------------------------------------------------

def paragraph_dedup(df: DataFrame, *, sep: str = "\n",
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Corpus-wide paragraph dedup: split docs on ``sep``, hash each
    non-empty paragraph, keep only its FIRST occurrence (lowest
    (doc_id, position)), reassemble → ``(doc_id, clean_text,
    n_paragraphs, n_removed)``.

    The repeated-boilerplate remover (headers, footers, nav blocks
    shared across pages) that doc-level dedup can't touch. Scale shape:
    the first occurrence per hash is ``min(struct(doc_id, pos))`` — a
    partial-aggregating groupBy (map-side combine), NOT a per-hash
    ``row_number`` window, so a boilerplate paragraph repeated across
    billions of pages partially aggregates on every mapper instead of
    sorting in one reducer; the keeper join back is 1 row per distinct
    hash (AQE skew-split-able) and reuses the groupBy exchange. One
    more shuffle on doc_id (reassembly); paragraphs travel as hashes +
    text once each, never all-pairs."""
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text"))
    paras = (d.select("doc_id", F.posexplode(
                 F.split("text", _re_lit(sep))).alias("pos", "p"))
             .filter(F.col("p") != ""))
    h = F.expr(H64_SPARK.format(s="p"))
    # materialized once — consumed by both the keeper aggregation and
    # the marking join (exchange reuse can't apply across them);
    # persist keeps lineage, unlike localCheckpoint
    paras_h = _eager_persist(paras.withColumn("_h", h))
    keeper = (paras_h.groupBy("_h")
              .agg(F.min(F.struct("doc_id", "pos")).alias("_k1")))
    marked = (paras_h.join(keeper, "_h")
              .withColumn("_keep",
                          (F.col("doc_id") == F.col("_k1.doc_id")) &
                          (F.col("pos") == F.col("_k1.pos"))))
    out = (marked.groupBy("doc_id")
           .agg(F.count("*").alias("n_paragraphs"),
                F.sum((~F.col("_keep")).cast("long")).alias("n_removed"),
                F.array_sort(F.collect_list(F.when(
                    F.col("_keep"),
                    F.struct("pos", "p")))).alias("_ks")))
    return (d.join(out, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.array_join(F.transform(
                        F.filter(F.col("_ks"), lambda x: x.isNotNull()),
                        lambda x: x["p"]), sep),
                        F.lit("")).alias("clean_text"),
                    F.coalesce("n_paragraphs", F.lit(0)).cast("long")
                    .alias("n_paragraphs"),
                    F.coalesce("n_removed", F.lit(0)).cast("long")
                    .alias("n_removed")))


def _sep_lit_duck(sep: str) -> str:
    """DuckDB literal for a separator (chr(10) for the default so no
    raw newline lands inside the SQL string)."""
    if sep == "\n":
        return "chr(10)"
    return "'" + sep.replace("'", "''") + "'"


def paragraph_dedup_sql(doc_sql: str, sep: str = "\n") -> str:
    h = H64_DUCK.format(s="p")
    sl = _sep_lit_duck(sep)
    return f"""
WITH d AS ({doc_sql}),
paras0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(ps, 1) AS BIGINT) - 1 AS pos,
         unnest(ps) AS p
  FROM (SELECT doc_id, string_split(text, {sl}) AS ps FROM d)
),
paras AS (SELECT * FROM paras0 WHERE p <> ''),
ranked AS (
  SELECT doc_id, pos, p,
         row_number() OVER (PARTITION BY {h}
                            ORDER BY doc_id, pos) AS rn
  FROM paras
),
agg AS (
  SELECT doc_id, count(*) AS n_paragraphs,
         sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_removed,
         array_to_string(list(p ORDER BY pos)
                         FILTER (WHERE rn = 1), {sl}) AS clean_text
  FROM ranked GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(a.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,
       CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def boilerplate_lines(df: DataFrame, *, min_docs: int = 3,
                      sep: str = "\n", id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate removal: drop EVERY
    occurrence of a line whose document frequency (number of distinct
    docs containing it) reaches ``min_docs`` → ``(doc_id, clean_text,
    n_lines, n_removed)``.

    Complements :func:`paragraph_dedup`, which keeps the FIRST
    occurrence — nav bars / cookie banners / footers repeated across a
    site are junk in their first document too, so the boilerplate rule
    removes them everywhere (CCNet §4.1's shard-hash line dedup,
    RefinedWeb's line-wise filter).

    Scale shape: document frequency is a two-level aggregation — the
    distinct ``(line_hash, doc_id)`` pair set (groupBy, map-side
    combine; a line repeated within one page collapses on the mapper)
    then a count per hash. Only hashes AT OR ABOVE the threshold
    survive the filter (the boilerplate set — tiny relative to the
    distinct-line universe), so the marking join's build side is small
    and AQE broadcasts it; the corpus text shuffles once for the
    doc_id reassembly. No windows, no skew exposure: a line repeated
    on billions of pages is one row after the pair-distinct combine.

    ``sep`` is a LITERAL separator (escaped before it reaches the
    regex split) and is used verbatim for the reassembly join, so
    e.g. ``sep='.'`` or a paragraph ``sep='\\n\\n'`` behave as typed.
    """
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text"))
    lines = (d.select("doc_id", F.posexplode(
                 F.split("text", _re_lit(sep))).alias("pos", "p"))
             .filter(F.col("p") != ""))
    lh = lines.withColumn("_h", F.expr(H64_SPARK.format(s="p")))
    bad = (lh.select("_h", "doc_id").distinct()
           .groupBy("_h").agg(F.count("*").alias("_df"))
           .filter(F.col("_df") >= min_docs)
           .select("_h", F.lit(True).alias("_bad")))
    marked = lh.join(bad, "_h", "left")
    out = (marked.groupBy("doc_id")
           .agg(F.count("*").alias("n_lines"),
                F.sum(F.col("_bad").isNotNull().cast("long"))
                .alias("n_removed"),
                F.array_sort(F.collect_list(F.when(
                    F.col("_bad").isNull(),
                    F.struct("pos", "p")))).alias("_ks")))
    return (d.join(out, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.array_join(F.transform(
                        F.filter(F.col("_ks"), lambda x: x.isNotNull()),
                        lambda x: x["p"]), sep),
                        F.lit("")).alias("clean_text"),
                    F.coalesce("n_lines", F.lit(0)).cast("long")
                    .alias("n_lines"),
                    F.coalesce("n_removed", F.lit(0)).cast("long")
                    .alias("n_removed")))


def boilerplate_lines_sql(doc_sql: str, min_docs: int = 3,
                          sep: str = "\n") -> str:
    h = H64_DUCK.format(s="p")
    sl = _sep_lit_duck(sep)
    return f"""
WITH d AS ({doc_sql}),
lines0 AS (
  SELECT doc_id,
         CAST(generate_subscripts(ps, 1) AS BIGINT) - 1 AS pos,
         unnest(ps) AS p
  FROM (SELECT doc_id, string_split(text, {sl}) AS ps FROM d)
),
lines AS (SELECT doc_id, pos, p, {h} AS h FROM lines0 WHERE p <> ''),
bad AS (
  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df
                 FROM lines GROUP BY h)
  WHERE df >= {min_docs}
),
marked AS (
  SELECT l.doc_id, l.pos, l.p,
         (b.h IS NOT NULL) AS is_bad
  FROM lines l LEFT JOIN bad b ON l.h = b.h
),
agg AS (
  SELECT doc_id, count(*) AS n_lines,
         sum(CASE WHEN is_bad THEN 1 ELSE 0 END) AS n_removed,
         array_to_string(list(p ORDER BY pos)
                         FILTER (WHERE NOT is_bad), {sl}) AS clean_text
  FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(a.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(a.n_removed, 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def substring_dedup(df: DataFrame, *, window: int = 8,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Duplicated-substring removal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): hash every ``window``-
    token sliding window corpus-wide, keep each window's FIRST
    occurrence (lowest (doc_id, position)), and drop every token
    covered by a repeated occurrence → ``(doc_id, clean_text,
    n_tokens, n_removed)``. ``clean_text`` is token-rejoined
    (whitespace-normalized) for all docs, deduplicated or not.

    The published method builds a corpus suffix array; the
    fixed-window formulation here finds the same ≥window-token repeats
    (any longer repeat is a run of repeated windows, so its positions
    are covered) and is shuffle-friendly: the first occurrence per
    window hash is ``min(struct(doc_id, pos))`` — a partial-aggregating
    groupBy (map-side combine), NOT a per-hash ``row_number`` window,
    so a ubiquitous 8-gram (boilerplate headers) partially aggregates
    on every mapper instead of sorting its billions of occurrences in
    one reducer. The duplicate-marking join back prunes to hashes with
    count > 1 first (the vast majority of grams are unique) and reuses
    the groupBy exchange; one more shuffle on doc_id (position-set
    assembly + reassembly join). Tokens travel once as hashes — never
    all-pairs, no suffix array. Reassembly is linear per doc
    (``array_except`` hash lookup, not per-token array_contains)."""
    L = int(window)
    if L < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    d = (df.select(F.col(id_col).cast("long").alias("doc_id"),
                   F.col(text_col).alias("text"))
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="text"))))
    gram = f"concat_ws(' ', slice(_t, i, {L}))"
    wins_expr = (f"CASE WHEN size(_t) >= {L} THEN "
                 f"transform(sequence(1, size(_t) - {L} + 1), "
                 f"i -> struct(i AS pos, "
                 f"{H64_SPARK.format(s=gram)} AS h)) "
                 f"ELSE array() END")
    wins = (d.select("doc_id", F.explode(F.expr(wins_expr)).alias("w"))
            .select("doc_id", F.col("w.pos").alias("pos"),
                    F.col("w.h").alias("_h")))
    # materialized once: both the keeper aggregation and the
    # duplicate-marking join consume it, and exchange reuse can't
    # apply (the partial agg sits under the groupBy exchange) — an
    # unpersisted plan runs the tokenize+hash map work twice.
    # persist + eager count rather than localCheckpoint: lineage
    # survives, so an executor loss recomputes the lost blocks
    # instead of aborting the job (checkpointed blocks are
    # non-replicated executor-local state)
    wins = _eager_persist(wins)
    keeper = (wins.groupBy("_h")
              .agg(F.min(F.struct("doc_id", "pos")).alias("_k1"),
                   F.count("*").alias("_cnt")))
    dup = (wins.join(keeper.filter(F.col("_cnt") > 1)
                     .select("_h", "_k1"), "_h")
           .filter((F.col("doc_id") != F.col("_k1.doc_id")) |
                   (F.col("pos") != F.col("_k1.pos"))))
    removed = (dup.select("doc_id", F.explode(F.expr(
                   f"sequence(pos, pos + {L} - 1)")).alias("rp"))
               .select("doc_id", F.col("rp").cast("long").alias("rp"))
               .distinct()
               .groupBy("doc_id")
               .agg(F.array_sort(F.collect_list("rp")).alias("_rm")))
    out = d.join(removed, "doc_id", "left")
    # complement of the removed set, order-preserving and linear:
    # array_except builds one hash set per row instead of an
    # array_contains scan per token (O(tokens + removed))
    keep = (f"transform(array_except(sequence(CAST(1 AS BIGINT), "
            f"CAST(size(_t) AS BIGINT)), "
            f"coalesce(_rm, CAST(array() AS ARRAY<BIGINT>))), "
            f"i -> element_at(_t, CAST(i AS INT)))")
    return out.select(
        "doc_id",
        F.when(F.size("_t") == 0, F.lit(""))
        .otherwise(F.expr(f"array_join({keep}, ' ')")).alias("clean_text"),
        F.expr("CAST(size(_t) AS BIGINT)").alias("n_tokens"),
        F.coalesce(F.expr("CAST(size(_rm) AS BIGINT)"), F.lit(0))
        .cast("long").alias("n_removed"))


def substring_dedup_sql(doc_sql: str, window: int = 8) -> str:
    L = int(window)
    toks = TOKS_DUCK.format(s="text")
    gram = f"array_to_string(_t[i:i + {L - 1}], ' ')"
    return f"""
WITH d AS (SELECT doc_id, text, {toks} AS _t FROM ({doc_sql})),
wins AS (
  SELECT doc_id, unnest(CASE WHEN len(_t) >= {L} THEN
           list_transform(range(1, len(_t) - {L} + 2),
             i -> {{'pos': i, 'h': {H64_DUCK.format(s=gram)}}})
         ELSE [] END) AS w
  FROM d
),
ranked AS (
  SELECT doc_id, w.pos AS pos,
         row_number() OVER (PARTITION BY w.h
                            ORDER BY doc_id, w.pos) AS rn
  FROM wins
),
rp AS (
  SELECT DISTINCT doc_id, unnest(range(pos, pos + {L})) AS rp
  FROM ranked WHERE rn > 1
),
rm AS (
  SELECT doc_id, list_sort(list(rp)) AS _rm FROM rp GROUP BY doc_id
)
SELECT d.doc_id,
       -- DuckDB array_to_string([]) is NULL; Spark array_join is ''
       COALESCE(array_to_string(
           list_filter(list_transform(range(1, len(d._t) + 1),
             i -> CASE WHEN r._rm IS NULL OR NOT list_contains(r._rm, i)
                  THEN d._t[i] END),
           x -> x IS NOT NULL), ' '), '') AS clean_text,
       CAST(len(d._t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(r._rm), 0) AS BIGINT) AS n_removed
FROM d LEFT JOIN rm r ON d.doc_id = r.doc_id
"""


# ---------------------------------------------------------------------------
# Hard-negative mining (embedding-training data pipelines)
# ---------------------------------------------------------------------------

def mine_hard_negatives(queries: DataFrame, dataset: DataFrame,
                        positives: DataFrame, k: int = 10, *,
                        metric: str = "cosine", extra_depth: int = 8,
                        method: str = "expr",
                        qid_col: str = "qid", qvec_col: str = "vec",
                        id_col: str = "id",
                        vec_col: str = "vec") -> DataFrame:
    """Top-``k`` nearest non-positive neighbors per query →
    ``(qid, nid, distance, rank)`` — the mining step of contrastive
    embedding training (hard negatives = closest corpus items that are
    NOT labeled positives and not the query itself).

    Composition over the engine's kNN: search ``k + extra_depth``
    candidates (any physical path — expr/blas/broadcast or an IVF
    search via a wrapper), anti-join the ``(qid, pos_id)`` positive
    pairs and the self-match, re-rank to ``k``. The anti-join touches
    only candidate rows, never the corpus."""
    from cuvs_spark.operators.brute_force import knn
    from cuvs_spark.operators.select_k import select_k
    from cuvs_spark.functions.distance import is_min_close
    n_pos = positives.groupBy(F.col("qid")).count() \
        .agg(F.max("count")).first()[0] or 0
    k0 = k + int(n_pos) + extra_depth
    cand = knn(dataset, queries, k0, metric, qid_col=qid_col,
               qvec_col=qvec_col, id_col=id_col, vec_col=vec_col,
               method=method)
    excl = positives.select(F.col("qid").cast("long").alias("qid"),
                            F.col("pos_id").cast("long").alias("nid"))
    kept = (cand.drop("rank")
            .filter(F.col("nid") != F.col("qid"))
            .join(excl, ["qid", "nid"], "left_anti"))
    return select_k(kept, "qid", "distance", k,
                    select_min=is_min_close(metric), tie_cols=["nid"])


# ---------------------------------------------------------------------------
# Incremental dedup: delta corpus vs an existing base corpus
# ---------------------------------------------------------------------------

def dedup_against(base: DataFrame, delta: DataFrame, *,
                  id_col: str = "doc_id", text_col: str = "text",
                  jaccard_threshold: float = 0.5,
                  n_hashes: int = N_HASHES, band_r: int = BAND_R,
                  max_bucket_size: int | None = None) -> DataFrame:
    """Near-dup matches of a DELTA corpus against a BASE corpus →
    ``(doc_id, base_id, jaccard)``: each delta doc's best base match
    (max Jaccard, ties → max base_id) at or above the threshold.
    Delta docs with no row survive; ``delta.join(result, 'doc_id',
    'left_anti')`` is the incremental-ingest filter.

    The continuous-crawl shape: a weekly crawl lands as *delta* and
    must be deduplicated against the accumulated corpus WITHOUT
    re-pairing the base against itself (:func:`minhash_lsh_pairs` is
    the O(base²-candidates) self-join; this is delta×base only). Both
    sides use the same MinHash parameters, so the base side's bands
    can be computed once and persisted by the caller across ingests —
    at 100 TB the base bands are a bucketed table the weekly job
    equi-joins into, and only the delta (orders of magnitude smaller)
    is shingled fresh.

    Candidates shuffle on the (band, band_key) pair only; the exact
    shingle-Jaccard verification touches candidates, never
    |delta|×|base|. ``max_bucket_size`` drops hot band buckets on the
    BASE side (boilerplate: license pages, empty docs) exactly like
    the self-join variant; a delta doc whose only matches live in a
    dropped bucket is near-identical to a base doc en masse, which
    exact dedup on ingest already collapses.
    """
    n_bands = _check_bands(n_hashes, band_r)
    sig = F.expr("array(" + ", ".join(
        _sig_exprs_spark(n_hashes=n_hashes)) + ")")

    def _prep(df: DataFrame) -> DataFrame:
        # staged projections: HOF lambdas are excluded from Spark's
        # subexpression elimination (same structure as the self-join)
        return (_doc(df, id_col, text_col)
                .withColumn("t", F.expr(TOKS_SPARK.format(s="text")))
                .withColumn("sh", F.expr(SHINGLES_SPARK.format(t="t")))
                .withColumn("hs", F.expr(
                    "transform(sh, s -> " + H32_SPARK.format(s="s") + ")"))
                .select("doc_id", sig.alias("sig"), "sh"))

    def _bands(docs: DataFrame) -> DataFrame:
        # same plan as the Column-API form, one expr parse (see
        # _bands_array_sql)
        return docs.select("doc_id", F.explode(F.expr(
            _bands_array_sql(n_bands, band_r))).alias("bk"))

    # both sides feed two consumers (bands + shingle join) — route
    # through the tracked per-session FIFO so repeated incremental
    # ingests in one long-lived session can't pin unbounded storage
    bdocs = _eager_persist(_prep(base))
    ddocs = _eager_persist(_prep(delta))
    bb = _bands(bdocs)
    if max_bucket_size is not None:
        hot = (bb.groupBy(F.col("bk.band").alias("_hb"),
                          F.col("bk.key").alias("_hk"))
               .count().filter(F.col("count") > max_bucket_size)
               .select("_hb", "_hk"))
        bb = bb.join(F.broadcast(hot),
                     (F.col("bk.band") == F.col("_hb"))
                     & (F.col("bk.key") == F.col("_hk")), "left_anti")
    cand = (_bands(ddocs).alias("x").join(
                bb.alias("y"),
                (F.col("x.bk.band") == F.col("y.bk.band"))
                & (F.col("x.bk.key") == F.col("y.bk.key")))
            .select(F.col("x.doc_id").alias("doc_id"),
                    F.col("y.doc_id").alias("base_id"))
            .distinct())
    dsh = ddocs.select(F.col("doc_id"), F.col("sh").alias("sh_d"))
    bsh = bdocs.select(F.col("doc_id").alias("base_id"),
                       F.col("sh").alias("sh_b"))
    jac = (F.size(F.array_intersect("sh_d", "sh_b"))
           / F.size(F.array_union("sh_d", "sh_b")))
    matches = (cand.join(dsh, "doc_id").join(bsh, "base_id")
               .select("doc_id", "base_id", jac.alias("jaccard"))
               .filter(F.col("jaccard") >= jaccard_threshold))
    # best match per delta doc: max(struct) is a partial agg (map-side
    # combine) — lexicographic max = (max jaccard, then max base_id)
    return (matches.groupBy("doc_id")
            .agg(F.max(F.struct(F.col("jaccard").alias("_j"),
                                F.col("base_id").alias("_b"))).alias("m"))
            .select("doc_id", F.col("m._b").alias("base_id"),
                    F.col("m._j").alias("jaccard")))


def dedup_against_sql(base_sql: str, delta_sql: str,
                      jaccard_threshold: float = 0.5,
                      n_hashes: int = N_HASHES,
                      band_r: int = BAND_R) -> str:
    """DuckDB twin: same signatures, same band join, same
    (jaccard DESC, base_id DESC) best-match rule."""
    n_bands = _check_bands(n_hashes, band_r)
    exprs = ", ".join(f"({e})" for e in _sig_exprs_duck(n_hashes=n_hashes))
    sh = SHINGLES_DUCK.format(t=TOKS_DUCK.format(s="text"))
    hs = "list_transform(sh, s -> " + H32_DUCK.format(s="s") + ")"

    def _band_rows(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, "
            + " || '-' || ".join(f"CAST(sig[{b * band_r + r + 1}] AS VARCHAR)"
                                 for r in range(band_r))
            + f" AS key FROM {src}"
            for b in range(n_bands))

    return f"""
WITH b0 AS ({base_sql}),
d0 AS ({delta_sql}),
b1 AS (SELECT doc_id, {sh} AS sh FROM b0),
b2 AS (SELECT doc_id, sh, {hs} AS hs FROM b1),
bsigs AS (SELECT doc_id, [{exprs}] AS sig, sh FROM b2),
d1 AS (SELECT doc_id, {sh} AS sh FROM d0),
d2 AS (SELECT doc_id, sh, {hs} AS hs FROM d1),
dsigs AS (SELECT doc_id, [{exprs}] AS sig, sh FROM d2),
bbands AS ({_band_rows('bsigs')}),
dbands AS ({_band_rows('dsigs')}),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS base_id
  FROM dbands x JOIN bbands y ON x.band = y.band AND x.key = y.key
),
m AS (
  SELECT c.doc_id, c.base_id,
         CAST(len(list_intersect(d.sh, b.sh)) AS DOUBLE)
           / len(list_distinct(d.sh || b.sh)) AS jaccard
  FROM cand c JOIN dsigs d ON d.doc_id = c.doc_id
              JOIN bsigs b ON b.doc_id = c.base_id
),
r AS (
  SELECT doc_id, base_id, jaccard,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY jaccard DESC, base_id DESC) AS rn
  FROM m WHERE jaccard >= {jaccard_threshold}
)
SELECT doc_id, base_id, jaccard FROM r WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC): shift-resistant dedup units
# ---------------------------------------------------------------------------

def cdc_chunks(df: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text", window: int = 4,
               divisor: int = 16) -> DataFrame:
    """Content-defined chunking over the token stream →
    ``(doc_id, chunk_idx, n_tokens, chunk_hash)``.

    A chunk boundary falls after token ``i`` wherever the hash of the
    ``window``-token gram ending at ``i`` is ≡ 0 mod ``divisor`` —
    boundaries are a function of local CONTENT, not position (the
    rsync/LBFS/FastCDC trick, applied to tokens instead of bytes). A
    doc edited near its start re-synchronizes to the same chunk
    boundaries a few tokens past the edit, so shared chunk hashes
    recover doc-level near-duplication that fixed-offset windows lose
    to shifting; expected chunk length ≈ ``divisor`` tokens. Exact
    dedup over ``chunk_hash`` (one groupBy) is then the incremental /
    shifted-content dedup unit — the same pipeline slot where
    :func:`substring_dedup` removes repeats WITHIN the corpus, CDC
    chunks dedup storage and overlap ACROSS corpus versions.

    Map-only: tokenizing, gram hashing, boundary selection and chunk
    assembly all run as one JVM HOF projection + a posexplode — no
    shuffle, no Python. Empty docs yield no rows; a doc shorter than
    ``window`` is one whole-doc chunk.
    """
    if window < 1 or divisor < 1:
        raise ValueError(f"window/divisor must be >= 1, "
                         f"got {window}/{divisor}")
    d = (_doc_spread(df, id_col, text_col)
         .withColumn("_t", F.expr(TOKS_SPARK.format(s="text")))
         .filter(F.expr("size(_t) >= 1")))
    gram = f"concat_ws(' ', slice(_t, i - {window} + 1, {window}))"
    bexpr = (f"array_sort(array_distinct(concat("
             f"filter(sequence({window}, size(_t)), "
             f"i -> pmod({H32_SPARK.format(s=gram)}, {divisor}) = 0), "
             f"array(size(_t)))))")
    # sequence(w, n) with w > n would count DOWN in Spark — guard it
    bexpr = (f"CASE WHEN size(_t) >= {window} THEN {bexpr} "
             f"ELSE array(size(_t)) END")
    ctext = "concat_ws(' ', slice(_t, s + 1, e - s))"
    d = (d.withColumn("_ends", F.expr(bexpr))
         .withColumn("_starts", F.expr(
             "concat(array(0), slice(_ends, 1, size(_ends) - 1))"))
         .select("doc_id", "_t", F.posexplode(F.expr(
             "zip_with(_starts, _ends, (s, e) -> struct("
             f"CAST(e - s AS BIGINT) AS n_tokens, "
             f"{H64_SPARK.format(s=ctext)} AS chunk_hash))"))
             .alias("chunk_idx", "c")))
    return d.select("doc_id", F.col("chunk_idx").cast("long"),
                    F.col("c.n_tokens").alias("n_tokens"),
                    F.col("c.chunk_hash").alias("chunk_hash"))


def cdc_chunks_sql(doc_sql: str, window: int = 4,
                   divisor: int = 16) -> str:
    """DuckDB twin: same gram hash, boundary rule, and chunk hash
    (1-based ``list_slice`` vs Spark's (start, length) ``slice``)."""
    toks = TOKS_DUCK.format(s="text")
    gram = f"array_to_string(list_slice(t, i - {window} + 1, i), ' ')"
    ctext = "array_to_string(list_slice(t, p[1] + 1, p[2]), ' ')"
    return f"""
WITH d0 AS ({doc_sql}),
t0 AS (SELECT doc_id, {toks} AS t FROM d0),
t1 AS (SELECT doc_id, t, len(t) AS n FROM t0 WHERE len(t) >= 1),
b AS (SELECT doc_id, t, n,
             CASE WHEN n >= {window} THEN list_sort(list_distinct(
               list_filter(generate_series({window}, n),
                 i -> ({H32_DUCK.format(s=gram)}) % {divisor} = 0)
               || [n]))
             ELSE [n] END AS ends
      FROM t1),
s AS (SELECT doc_id, t, ends,
             list_prepend(0, list_slice(ends, 1, len(ends) - 1)) AS starts
      FROM b),
e AS (SELECT doc_id, t,
             CAST(generate_subscripts(list_zip(starts, ends), 1)
                  AS BIGINT) - 1 AS chunk_idx,
             unnest(list_zip(starts, ends)) AS p
      FROM s)
SELECT doc_id, chunk_idx, CAST(p[2] - p[1] AS BIGINT) AS n_tokens,
       {H64_DUCK.format(s=ctext)} AS chunk_hash
FROM e
"""


def dup_cluster_histogram(df: DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Exact-duplicate cluster-size histogram →
    ``(cluster_size, n_clusters, n_docs)`` — the dedup AUDIT view:
    before deleting anything, a corpus owner wants the duplication
    profile (how much of the crawl is 2-way mirrors vs one page
    duplicated 50 000 times — the latter is boilerplate/SEO spam and
    usually warrants dropping ALL copies, not keeping one).

    Two map-side-combined groupBys over integer keys: text-hash →
    cluster size, then size → cluster count; the histogram is at most
    ~log-many distinct rows, so the second shuffle is trivial. Hot
    clusters are ONE row after the first combine — no skew exposure.
    """
    d = _doc(df, id_col, text_col)
    h = H64_SPARK.format(s="text")
    sizes = (d.select(F.expr(h).alias("h"))
             .groupBy("h").agg(F.count("*").alias("sz")))
    return (sizes.groupBy("sz")
            .agg(F.count("*").alias("n_clusters"))
            .select(F.col("sz").cast("long").alias("cluster_size"),
                    F.col("n_clusters").cast("long").alias("n_clusters"),
                    (F.col("sz") * F.col("n_clusters")).cast("long")
                    .alias("n_docs")))


def dup_cluster_histogram_sql(doc_sql: str) -> str:
    h = H64_DUCK.format(s="text")
    return f"""
WITH d AS ({doc_sql}),
s AS (SELECT {h} AS h, count(*) AS sz FROM d GROUP BY 1),
g AS (SELECT sz, count(*) AS n_clusters FROM s GROUP BY sz)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(sz * n_clusters AS BIGINT) AS n_docs
FROM g
"""


def cross_source_dups(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text",
                      source_col: str = "source") -> DataFrame:
    """Exact-duplicate clusters that span MORE THAN ONE source →
    ``(text_hash, n_docs, n_sources, canonical_id, sources)`` with
    ``sources`` the sorted, comma-joined distinct source names.

    The provenance-leakage audit: identical text appearing under two
    domains is either syndication (keep one, attribute carefully),
    a mirror (drop the mirror domain wholesale), or a scraped eval
    set leaking into a second crawl — all decisions a per-source
    dedup report drives. Composes with
    :func:`dup_cluster_histogram` (the size view) and
    :func:`keep_best_representative` (the resolution step).

    One map-side-combined groupBy on the 60-bit content digest; the
    per-cluster source set is bounded by the number of SOURCES (not
    docs), so ``collect_set`` state stays tiny even for a 50 000-copy
    boilerplate cluster. Null sources coalesce to '' on both engines.
    """
    d = df.select(F.col(id_col).cast("long").alias("doc_id"),
                  F.col(text_col).alias("text"),
                  F.coalesce(F.col(source_col).cast("string"),
                             F.lit("")).alias("src"))
    h = H64_SPARK.format(s="text")
    g = (d.select(F.expr(h).alias("text_hash"), "doc_id", "src")
         .groupBy("text_hash")
         .agg(F.count("*").cast("long").alias("n_docs"),
              F.min("doc_id").alias("canonical_id"),
              F.array_sort(F.collect_set("src")).alias("_srcs")))
    return (g.filter(F.size("_srcs") >= 2)
            .select("text_hash", "n_docs",
                    F.size("_srcs").cast("long").alias("n_sources"),
                    "canonical_id",
                    F.array_join("_srcs", ",").alias("sources")))


def cross_source_dups_sql(doc_sql: str) -> str:
    """DuckDB twin; ``doc_sql`` must yield ``(doc_id, text, src)``."""
    h = H64_DUCK.format(s="text")
    return f"""
WITH d AS (SELECT doc_id, text, COALESCE(CAST(src AS VARCHAR), '') AS src
           FROM ({doc_sql})),
g AS (
  SELECT {h} AS text_hash,
         CAST(count(*) AS BIGINT) AS n_docs,
         min(doc_id) AS canonical_id,
         list_sort(list_distinct(list(src))) AS _srcs
  FROM d GROUP BY 1
)
SELECT text_hash, n_docs,
       CAST(len(_srcs) AS BIGINT) AS n_sources,
       canonical_id,
       array_to_string(_srcs, ',') AS sources
FROM g WHERE len(_srcs) >= 2
"""


# ---------------------------------------------------------------------------
# Bloom-filter membership (fixed-size dedup state for incremental ingest)
# ---------------------------------------------------------------------------

# 63 usable bits per BIGINT word: bit 63 is the sign bit, and while the
# or/and arithmetic would still be correct on negative longs, DuckDB's
# checked `<<` and the hash-compare's canonicalizer are simpler kept in
# non-negative territory on both engines.
_BLOOM_WORD_BITS = 63


def bloom_build(df: DataFrame, *, m_bits: int = 63 * 16384, k: int = 4,
                text_col: str = "text") -> DataFrame:
    """Build a Bloom filter over exact-text digests →
    ``(word_idx, bits)`` — one row per non-zero 63-bit word.

    The fixed-size membership state for continuous-crawl exact dedup:
    :func:`dedup_against` keeps the base corpus' bands as a TABLE that
    every delta must join (state grows with the corpus); the Bloom
    filter compresses "have I seen this exact text" into ``m_bits``
    REGARDLESS of corpus size, so a 100 TB base becomes a few hundred
    MB that broadcasts to every executor and the weekly delta scan is
    MAP-ONLY (plus one tiny join) with a bounded, tunable
    false-positive rate ≈ (1 − e^(−k·n/m))^k — size ``m_bits`` at
    ~10 bits per expected key for ~1% FPR, and route the few positives
    through the exact path. False negatives are impossible, so it is
    always safe as a pre-filter.

    Everything is integer md5 arithmetic (no RNG, no libm): position i
    of a doc is ``H64(text ∥ '#bloom' ∥ i) % m_bits``, and the build is
    one explode + one map-side-combined ``bit_or`` groupBy — a hot
    duplicate text sets the same bits on every mapper and collapses to
    k rows before the shuffle.

    The build parameters travel WITH the filter as two metadata rows
    (``word_idx = -1 → m_bits``, ``word_idx = -2 → k``, the same trick
    as the HNSW ``layer = -1`` M row): a probe with mismatched
    parameters would silently produce false negatives — the one
    failure mode a Bloom pre-filter must never have — so
    :func:`bloom_contains` reads (or cross-checks) them instead of
    trusting the caller. Probe word indices are always ≥ 0, so the
    metadata rows can never collide with a probe."""
    if m_bits % _BLOOM_WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {_BLOOM_WORD_BITS}")
    pos = [F.expr(H64_SPARK.format(s=f"concat({text_col}, '#bloom{i}')"))
           % m_bits for i in range(k)]
    bits = (df.select(F.explode(F.array(*pos)).alias("_p"))
            .select(F.expr(f"CAST(_p DIV {_BLOOM_WORD_BITS} AS BIGINT)")
                    .alias("word_idx"),
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                           f"CAST(_p % {_BLOOM_WORD_BITS} AS INT))")
                    .alias("_b")))
    meta = df.sparkSession.createDataFrame(
        [(-1, m_bits), (-2, k)], "word_idx long, bits long")
    return (bits.groupBy("word_idx")
            .agg(F.expr("bit_or(_b)").alias("bits"))
            .unionByName(meta))


def bloom_build_sql(doc_sql: str, m_bits: int = 63 * 16384,
                    k: int = 4) -> str:
    """DuckDB twin of :func:`bloom_build`, INCLUDING the two metadata
    rows (``word_idx = -1 → m_bits``, ``-2 → k``) so both engines emit
    the same self-describing filter table: a filter materialized from
    the SQL path is probe-able by :func:`bloom_contains` without the
    caller re-supplying the build parameters."""
    sel = " UNION ALL ".join(
        f"SELECT {H64_DUCK.format(s=h)} % {m_bits} AS p FROM d"
        for i in range(k)
        for h in [f"(text || '#bloom{i}')"])
    return f"""
WITH d AS ({doc_sql}),
pos AS ({sel})
SELECT CAST(p // {_BLOOM_WORD_BITS} AS BIGINT) AS word_idx,
       bit_or(CAST(1 AS BIGINT) << CAST(p % {_BLOOM_WORD_BITS} AS INT))
         AS bits
FROM pos GROUP BY 1
UNION ALL SELECT CAST(-1 AS BIGINT), CAST({m_bits} AS BIGINT)
UNION ALL SELECT CAST(-2 AS BIGINT), CAST({k} AS BIGINT)
"""


def bloom_contains(delta: DataFrame, bloom: DataFrame, *,
                   m_bits: int | None = None, k: int | None = None,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Probe a :func:`bloom_build` filter → ``(doc_id, maybe_dup)``
    (1 = all ``k`` bits set: exact text PROBABLY seen; 0 = definitely
    novel). The filter table broadcasts (≤ m_bits/63 rows); each delta
    doc contributes k probe rows, and the verdict is a partial
    ``min`` agg — no window, no skew.

    ``m_bits``/``k`` default to the parameters stored in the filter's
    metadata rows; passing values that disagree with them raises
    (probing with the wrong modulus silently yields false negatives,
    the one failure a Bloom pre-filter must never have)."""
    stored = {r["word_idx"]: r["bits"]
              for r in bloom.filter(F.col("word_idx") < 0).collect()}
    if stored:
        sm, sk = int(stored.get(-1, 0)), int(stored.get(-2, 0))
        if m_bits is None:
            m_bits = sm
        elif m_bits != sm:
            raise ValueError(
                f"bloom_contains: m_bits={m_bits} does not match the "
                f"filter's build m_bits={sm}")
        if k is None:
            k = sk
        elif k != sk:
            raise ValueError(
                f"bloom_contains: k={k} does not match the filter's "
                f"build k={sk}")
    elif m_bits is None or k is None:
        raise ValueError(
            "bloom_contains: filter carries no metadata rows; pass "
            "m_bits and k explicitly")
    d = delta.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.col(text_col).alias("text"))
    pos = [F.expr(H64_SPARK.format(s=f"concat(text, '#bloom{i}')"))
           % m_bits for i in range(k)]
    probes = (d.select("doc_id", F.explode(F.array(*pos)).alias("_p"))
              .select("doc_id",
                      F.expr(f"CAST(_p DIV {_BLOOM_WORD_BITS} AS BIGINT)")
                      .alias("word_idx"),
                      F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                             f"CAST(_p % {_BLOOM_WORD_BITS} AS INT))")
                      .alias("_m")))
    hit = (probes.join(F.broadcast(bloom), "word_idx", "left")
           .select("doc_id",
                   (F.coalesce(F.col("bits"), F.lit(0))
                    .bitwiseAND(F.col("_m")) != 0).cast("int")
                   .alias("_hit")))
    return (hit.groupBy("doc_id")
            .agg(F.min("_hit").cast("int").alias("maybe_dup")))


def dedup_against_bloom(base: DataFrame, delta: DataFrame, *,
                        m_bits: int = 63 * 16384, k: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Exact-dup pre-filter of a delta crawl against a base corpus
    through a fixed-size Bloom filter → ``(doc_id, maybe_dup)``.

    The O(1)-state companion to :func:`dedup_against` (whose MinHash
    band state grows with the base): at 100 TB the base is one
    broadcastable bit array, the delta pass is a scan, and only the
    ``maybe_dup = 1`` sliver (true dups + the tuned FP rate) proceeds
    to exact/near verification. Deterministic md5 bit positions → the
    whole pipeline is gate-exact across engines. The filter is
    persisted (tracked FIFO) so the metadata read and the probe join
    share one build; callers holding a filter across many ingests
    should persist or save it themselves."""
    bloom = _eager_persist(bloom_build(base, m_bits=m_bits, k=k,
                                       text_col=text_col))
    return bloom_contains(delta, bloom,
                          m_bits=m_bits, k=k, id_col=id_col,
                          text_col=text_col)


def dedup_against_bloom_sql(base_sql: str, delta_sql: str,
                            m_bits: int = 63 * 16384, k: int = 4) -> str:
    build = bloom_build_sql(base_sql, m_bits, k)
    probe_sel = " UNION ALL ".join(
        f"SELECT doc_id, {H64_DUCK.format(s=h)} % {m_bits} AS p FROM delta"
        for i in range(k)
        for h in [f"(text || '#bloom{i}')"])
    return f"""
WITH bloom AS ({build}),
delta AS ({delta_sql}),
probes AS (
  SELECT doc_id,
         CAST(p // {_BLOOM_WORD_BITS} AS BIGINT) AS word_idx,
         CAST(1 AS BIGINT) << CAST(p % {_BLOOM_WORD_BITS} AS INT) AS m
  FROM ({probe_sel})
),
hits AS (
  SELECT probes.doc_id,
         CAST(CASE WHEN (COALESCE(b.bits, 0) & probes.m) <> 0
              THEN 1 ELSE 0 END AS INT) AS hit
  FROM probes LEFT JOIN bloom b USING (word_idx)
)
SELECT doc_id, CAST(min(hit) AS INT) AS maybe_dup
FROM hits GROUP BY doc_id
"""


def ngram_containment_pairs(df: DataFrame, n: int = 8, *,
                            threshold: float = 0.5,
                            max_df: int = 20,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Asymmetric near-dup detection by character-n-gram CONTAINMENT →
    ``(doc_a, doc_b, containment)`` with
    ``containment = |A∩B| / min(|A|, |B|)`` — the excerpt/quote/
    truncation detector Jaccard structurally misses: a 100-word doc
    copied verbatim inside a 10,000-word doc has Jaccard ≈ 0.01 (below
    any near-dup bar, and below MinHash-LSH's candidate floor) but
    containment 1.0. Standard alongside symmetric dedup in corpus
    curation (Broder's containment, the "coverage" half of shingling).

    Candidate generation is RARE-SHINGLE BLOCKING, not LSH (LSH
    candidates are Jaccard-bounded, exactly what excerpts evade): two
    docs become a candidate pair iff they share at least one n-gram
    with document frequency in [2, ``max_df``]. The gram→docs relation
    self-joins only inside those rare grams — per-gram fanout ≤
    max_df², and burned-in grams (df > max_df: boilerplate, common
    phrases) generate no pairs at all, so candidate count tracks genuine
    rare-content sharing, never the corpus square. Verification then
    intersects the two docs' distinct-gram sets on candidates only.
    An excerpt shares ALL its grams with its source, so rare-gram
    blocking cannot miss a pair whose shared content contains at least
    one sub-``max_df`` gram; a corpus where every shared gram is
    boilerplate has nothing containment should flag.

    Determinism: integer set sizes, one final double division."""
    d = _doc(df, id_col, text_col)
    g = d.select("doc_id",
                 F.expr(NGRAM_SPARK.format(s="text", n=n)).alias("g"))
    posting = g.select("doc_id", F.explode("g").alias("_g"))
    rare = (posting.groupBy("_g").agg(F.count("*").alias("_df"))
            .filter((F.col("_df") >= 2) & (F.col("_df") <= int(max_df)))
            .select("_g"))
    rp = posting.join(rare, "_g")
    cand = (rp.select(F.col("_g"), F.col("doc_id").alias("doc_a"))
            .join(rp.select(F.col("_g"), F.col("doc_id").alias("doc_b")),
                  "_g")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    cont = (F.size(F.array_intersect("ga", "gb")).cast("double")
            / F.least(F.size("ga"), F.size("gb")).cast("double"))
    return (cand.join(a, "doc_a").join(b, "doc_b")
            .select("doc_a", "doc_b", cont.alias("containment"))
            .filter(F.col("containment") >= float(threshold)))


def ngram_containment_pairs_sql(doc_sql: str, n: int = 8,
                                threshold: float = 0.5,
                                max_df: int = 20) -> str:
    g = NGRAM_DUCK.format(s="text", n=n)
    return f"""
WITH d AS ({doc_sql}),
g AS (SELECT doc_id, {g} AS g FROM d),
posting AS (SELECT doc_id, unnest(g) AS _g FROM g),
rare AS (
  SELECT _g FROM (SELECT _g, count(*) AS _df FROM posting GROUP BY _g)
  WHERE _df >= 2 AND _df <= {int(max_df)}
),
rp AS (SELECT p.doc_id, p._g FROM posting p JOIN rare USING (_g)),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM rp x JOIN rp y ON x._g = y._g AND x.doc_id < y.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         / CAST(least(len(a.g), len(b.g)) AS DOUBLE) AS containment
FROM cand c JOIN g a ON a.doc_id = c.doc_a
            JOIN g b ON b.doc_id = c.doc_b
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        / CAST(least(len(a.g), len(b.g)) AS DOUBLE) >= {float(threshold)}
"""

def edit_distance_pairs(df: DataFrame, max_frac: float = 0.2, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        jaccard_floor: float = 0.3,
                        max_bucket_size: int | None = None,
                        n_hashes: int = N_HASHES,
                        band_r: int = BAND_R) -> DataFrame:
    """Character-level near-dup verification: LSH candidate pairs
    confirmed by Levenshtein distance → ``(doc_a, doc_b, lev, len_a,
    len_b)`` with ``lev ≤ max_frac · max(len_a, len_b)``.

    Token-set measures (Jaccard/MinHash/containment) are blind to the
    EDIT structure — a doc with every 5th word swapped and a doc with
    one appended paragraph can share a Jaccard score while only the
    second is a true near-dup for training-dedup purposes. This is the
    standard second-stage verifier: cheap set-based candidates first
    (``jaccard_floor``, deliberately below the dedup threshold), exact
    edit distance only on the candidate sliver.

    Engine parity: every output column is a BIGINT, and the relative
    threshold is cross-multiplied into integers (``lev·1000 ≤
    ⌊max_frac·1000⌋·max(len)``) — no float output at all. NOTE for the
    oracle twin: DuckDB's ``levenshtein`` counts BYTES where Spark
    counts CHARACTERS, so dual-engine gates must feed ASCII-normalized
    text; the Spark operator itself is fully Unicode.

    Scale shape: inherits :func:`minhash_lsh_pairs`' banded candidate
    generation (with the ``max_bucket_size`` skew guard); the O(L²)
    Levenshtein DP runs once per CANDIDATE pair, never per corpus
    pair."""
    cand = minhash_lsh_pairs(
        df, id_col=id_col, text_col=text_col,
        jaccard_threshold=jaccard_floor,
        max_bucket_size=max_bucket_size,
        n_hashes=n_hashes, band_r=band_r).select("doc_a", "doc_b")
    a = df.select(F.col(id_col).cast("long").alias("doc_a"),
                  F.col(text_col).alias("_ta"))
    b = df.select(F.col(id_col).cast("long").alias("doc_b"),
                  F.col(text_col).alias("_tb"))
    thr = int(max_frac * 1000)
    return (cand.join(a, "doc_a").join(b, "doc_b")
            .select("doc_a", "doc_b",
                    F.levenshtein("_ta", "_tb").cast("long").alias("lev"),
                    F.length("_ta").cast("long").alias("len_a"),
                    F.length("_tb").cast("long").alias("len_b"))
            .filter(F.expr(
                f"lev * 1000 <= {thr} * greatest(len_a, len_b)")))


def edit_distance_pairs_sql(doc_sql: str, max_frac: float = 0.2, *,
                            jaccard_floor: float = 0.3,
                            n_hashes: int = N_HASHES,
                            band_r: int = BAND_R) -> str:
    """DuckDB twin of :func:`edit_distance_pairs` — same candidates,
    same integer cross-multiplied threshold (feed ASCII text: DuckDB's
    levenshtein is bytewise)."""
    cand = minhash_lsh_pairs_sql(doc_sql, jaccard_floor,
                                 n_hashes=n_hashes, band_r=band_r)
    thr = int(max_frac * 1000)
    return f"""
WITH src AS ({doc_sql}),
cand AS (SELECT doc_a, doc_b FROM ({cand.strip()})),
j AS (
  SELECT c.doc_a, c.doc_b,
         CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
         CAST(length(a.text) AS BIGINT) AS len_a,
         CAST(length(b.text) AS BIGINT) AS len_b
  FROM cand c
  JOIN src a ON a.doc_id = c.doc_a
  JOIN src b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, lev, len_a, len_b
FROM j WHERE lev * 1000 <= {thr} * greatest(len_a, len_b)
"""
