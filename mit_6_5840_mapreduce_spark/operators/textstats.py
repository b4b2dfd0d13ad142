"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, fingerprinting (LLM-pipeline north star).

All JVM-side built-ins (split/regexp/md5) — no Python in the row path, so
each query is one codegen'd scan + at most one shuffle at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mit_6_5840_mapreduce_spark.functions.numeric import floor4
from mit_6_5840_mapreduce_spark.functions.text import tokenize
from mit_6_5840_mapreduce_spark.sources.tables import fan_out, load_table

# Tiny stopword lexicons for the n-gram/stopword language-ID heuristic.
# Scores are computed over the doc's tokens; predicted language = argmax
# hit count with deterministic lexicographic tiebreak ('und' beats unknown).
LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu", "mit", "den", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "por"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "du", "une", "est"),
}

# BPE-ish pre-tokenization: letter runs | digit runs | single non-space symbol
BPE_RE = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"
PUNCT_STRIP_RE = r"[\p{L}\p{N}\s]"


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID: per doc, hits per lexicon -> argmax
    (ties -> lexicographically smallest language; no hits -> 'und').

    SHUFFLE-FREE form (r14, guide §2.4): the lexicons are 10-word
    constants, so per-lexicon hit counts are a per-row JVM expression —
    ``size(filter(toks, t -> t IN lexicon))`` — and the argmax is
    ``array_min`` over the (-hits, lang) structs of the lexicons that
    hit (struct ordering is field-by-field, exactly the old
    min-over-struct aggregate). The previous form exploded every token
    and paid three exchanges (hits agg, argmax agg, doc re-join) to
    compare each token against 40 constant words; this one is a single
    narrow scan at any corpus size — same rows, same values."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    toks = tokenize(F.lower(F.col("text")))
    staged = docs.select("doc_id", toks.alias("toks"))
    cands = F.array(*[
        F.struct(
            (-F.size(F.filter(
                F.col("toks"),
                lambda t: t.isin(*words)))).cast("bigint").alias("neg"),
            F.lit(lang).alias("l"))
        for lang, words in sorted(LEXICONS.items())
    ])
    best = F.array_min(F.filter(cands, lambda s: s["neg"] < 0))
    return staged.select(
        "doc_id",
        F.coalesce(best["l"], F.lit("und")).alias("pred_lang"),
        F.coalesce(-best["neg"], F.lit(0).cast("bigint")).alias("hits"))


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: token counts, mean token length, punctuation ratio,
    and a composite score in [0,1] (heuristic, deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    avg_tok = F.when(n_tokens > 0,
                     F.aggregate(toks, F.lit(0.0),
                                 lambda acc, t: acc + F.length(t))
                     / n_tokens).otherwise(F.lit(0.0))
    n_punct = F.length(F.regexp_replace("text", PUNCT_STRIP_RE, ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
        + F.least(avg_tok / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars"),
        floor4(avg_tok).alias("avg_token_len"),
        floor4(punct_ratio).alias("punct_ratio"),
        floor4(score).alias("quality_score"),
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, letter-run, BPE-ish regex."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                         lambda t: t != F.lit("")))
    letter = F.size(tokenize(F.col("text")))
    bpe = F.regexp_count(F.col("text"), F.lit(BPE_RE))
    distinct_letter = F.size(F.array_distinct(tokenize(F.col("text"))))
    return docs.select(
        "doc_id",
        ws.cast("bigint").alias("ws_tokens"),
        letter.cast("bigint").alias("letter_tokens"),
        bpe.cast("bigint").alias("bpe_tokens"),
        distinct_letter.cast("bigint").alias("distinct_tokens"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint: md5 over lowercased,
    whitespace-collapsed, trimmed text."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).cast("bigint").alias("norm_len"),
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 24   # 8-token overlap between consecutive chunks


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline chunking: sliding token windows of CHUNK_TOKENS with
    CHUNK_STRIDE step (8-token overlap). One narrow pass — tokens staged,
    chunk starts generated per doc, slices re-joined; no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokenize(F.col("text")).alias("toks")) \
                 .where(F.size("toks") > 0)
    return (
        staged.select(
            "doc_id", "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks"),
                                 F.lit(CHUNK_STRIDE))).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint")
             .alias("chunk_id"),
            F.size(F.slice("toks", F.col("start"), CHUNK_TOKENS))
             .cast("bigint").alias("chunk_tokens"),
            F.concat_ws(" ", F.slice("toks", F.col("start"), CHUNK_TOKENS))
             .alias("chunk_text"))
    )


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier audit: confusion matrix of lang_id's prediction
    against the corpus's labeled language, with per-cell document count
    and cell share of the true-language row (floor4). The evaluation
    grid a curation pipeline watches before trusting a language
    filter."""
    from pyspark.sql.window import Window as W
    preds = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    cells = (
        docs.join(preds, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )
    row_total = F.sum("n_docs").over(W.partitionBy("lang"))
    return cells.select(
        "lang", "pred_lang", "n_docs",
        floor4(F.col("n_docs") / row_total).alias("row_share"))


class _ChunkDocsUDTF:
    """Python UDTF twin of doc_chunks (Spark 4 table-function API) —
    the reference's ``Map: (k, v) -> []KeyValue`` is exactly a UDTF
    (src/mr/worker.go:123-124), and this exercises the native
    ``LATERAL``-join surface the RDD compat layer approximates with
    flatMap. Tokenization uses str.isalpha, the Python mirror of Go
    ``unicode.IsLetter`` / regex ``\\p{L}`` (parity pinned by
    tests/test_tokenizer_parity.py)."""

    def eval(self, doc_id, text):  # noqa: ANN001 — UDTF contract
        import itertools
        toks = ["".join(g)
                for alpha, g in itertools.groupby(text, key=str.isalpha)
                if alpha]
        for ci, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
            window = toks[start:start + CHUNK_TOKENS]
            yield doc_id, ci, len(window), " ".join(window)


def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_chunks through a registered Python UDTF + LATERAL join —
    same output contract as the JVM form (shared oracle), kept OUT of
    the bench set: it is the API-surface demonstration, the shuffle-free
    JVM doc_chunks is the scale path."""
    from pyspark.sql.functions import udtf
    chunker = udtf(_ChunkDocsUDTF,
                   returnType="doc_id bigint, chunk_id bigint, "
                              "chunk_tokens bigint, chunk_text string")
    spark.udtf.register("chunk_docs_udtf", chunker)
    docs = load_table(spark, sf_dir, "documents")
    return spark.sql(
        "SELECT c.* FROM {docs} d, "
        "LATERAL chunk_docs_udtf(d.doc_id, d.text) c "
        "WHERE length(d.text) > 0",
        docs=docs)


TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TFIDF_TOP_K terms per document.

    Scoring uses the ratio form tf * (N / df) rather than tf * ln(N/df):
    libm log is not guaranteed bit-identical across engines, while
    (term_count * N) / (doc_len * df) is ONE correctly-rounded division
    of exactly-representable integers — deterministic everywhere, and
    monotone in the same (tf, 1/df) ordering for fixed doc_len.

    Scale shape: one shuffle to (doc_id, word) counts, doc lengths via a
    window on the same partitioning, document frequencies as a per-word
    aggregate joined back, corpus size as a broadcast scalar (no
    driver-side .count() round trip). The df join is deliberately
    UNHINTED (r7): the document-frequency table is VOCABULARY-sized and
    the vocabulary grows with the corpus (unique-token spam adds |doc|
    words per doc), so a forced ``broadcast(dfreq)`` would OOM every
    executor at 100 TB. At gate SF the join still EXECUTES as a
    broadcast join — converted by AQE at runtime from the finished
    shuffle stage's actual size (ADVICE r7: dfreq is an aggregation
    output, so the STATIC planner's estimate derives from the large
    child scan and would never pick the broadcast on its own) — and
    it degrades to an AQE-skew-managed shuffle join when the runtime
    stats outgrow the threshold."""
    from pyspark.sql.window import Window
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    # doc_len = total tokens = size of the token array — computed in the
    # scan and carried through the explode (r14, guide §2.4): the old
    # ``sum(term_count) over (partition by doc_id)`` window re-derived
    # the same number through an extra Exchange+Sort after the tf
    # aggregation. max() over the group is a constant pick, no window.
    # The explode child is a STRUCT-transform EXPRESSION on purpose:
    # exploding a staged attribute lets InferFiltersFromGenerate add a
    # size>0 filter that pushdown re-inlines as a second full tokenize
    # per row at the scan (the _doc_shingles trap — measured +70% on
    # the cosine sibling); an expensive generator child skips the
    # inference, and size() on the staged array is a cheap per-element
    # length read.
    staged = docs.select("doc_id",
                         tokenize(F.lower(F.col("text"))).alias("toks"))
    toks = (staged.select("doc_id", F.explode(F.transform(
                "toks", lambda t: F.struct(
                    t.alias("word"),
                    F.size("toks").alias("dl")))).alias("s"))
            .select("doc_id", F.col("s.word").alias("word"),
                    F.col("s.dl").cast("bigint").alias("doc_len")))
    tf = (toks.groupBy("doc_id", "word")
          .agg(F.count("*").alias("term_count"),
               F.max("doc_len").alias("doc_len")))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("n_docs"))
    raw = ((F.col("term_count") * F.col("n_docs")).cast("double")
           / (F.col("doc_len") * F.col("df")).cast("double"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("raw"), F.asc("word"))
    return (
        tf.join(dfreq, "word")
        .crossJoin(broadcast(total))
        .withColumn("raw", raw)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "word", "term_count",
                floor4(F.col("raw")).alias("tfidf"), "rank")
    )


TFIDF_COS_THRESHOLD = 0.5
TFIDF_W_SCALE = 1000
DF_CAP_FRAC = 10        # keep terms with df <= N/DF_CAP_FRAC


def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical similarity join: document pairs with TF-IDF cosine >=
    TFIDF_COS_THRESHOLD over an inverted-index term join.

    Numerics: weights are INTEGER-exact — iw = (tf·N·SCALE) div (len·df)
    — so dot products and squared norms are exact integer sums in any
    order; floats appear only in the final sqrt/division, which both
    engines compute identically from identical integers. The weight
    scale grows with corpus size (rarest terms carry iw ~ N·SCALE/len),
    so the squared sums accumulate in DECIMAL(38,0) (DuckDB: HUGEINT):
    in BIGINT, iw^2 overflows — loudly, under ANSI — once N passes
    ~1e9 docs (r6, the user_value_outliers discipline). The exact
    integer converts to DOUBLE at the same point either way, so values
    are unchanged wherever BIGINT sufficed.

    Scale: stopword-frequency terms (df > N/DF_CAP_FRAC) are dropped
    BEFORE the self-join — they contribute negligible idf weight but
    quadratic candidate pairs; with them gone the inverted index joins
    only on discriminative terms (the same reason the Jaccard join works
    on rare shingles). The df join is deliberately UNHINTED (r7, the
    tfidf_top_terms rule): the df table is vocabulary-sized and the
    vocabulary grows with the corpus, so forcing its broadcast would
    OOM every executor at 100 TB. It still EXECUTES as a broadcast
    join at gate SF — via AQE's runtime join-strategy conversion from
    the finished shuffle stage's actual statistics (ADVICE r7: the
    STATIC planner sees only the large child scan's sizeInBytes for an
    aggregation output, so it is the runtime stats that convert) —
    and stays a shuffle join when those stats outgrow the
    threshold."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    # doc_len carried through the explode off the token array (r14 —
    # the tfidf_top_terms rewrite applied to its sibling): the old
    # ``sum(cnt) over (partition by doc_id)`` re-derived it through an
    # extra Exchange+Sort after the tf aggregation; max() over the
    # (doc_id, word) group is a constant pick. Struct-transform explode
    # child for the same InferFiltersFromGenerate reason as
    # tfidf_top_terms (a first cut that exploded the staged attribute
    # measured +70% from the pushed re-tokenize filter).
    staged = docs.select("doc_id",
                         tokenize(F.lower(F.col("text"))).alias("toks"))
    toks = (staged.select("doc_id", F.explode(F.transform(
                "toks", lambda t: F.struct(
                    t.alias("word"),
                    F.size("toks").alias("dl")))).alias("s"))
            .select("doc_id", F.col("s.word").alias("word"),
                    F.col("s.dl").cast("bigint").alias("doc_len")))
    tf = (toks.groupBy("doc_id", "word")
          .agg(F.count("*").alias("cnt"), F.max("doc_len").alias("doc_len")))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("n_docs"))
    # persist: the weight table feeds THREE consumers (norms + both
    # self-join sides — the sh.cache()/bands.persist() pattern in the
    # dedup siblings); ReuseExchange covers the two identically-keyed
    # join sides but not the doc_id-keyed norms branch, which would
    # otherwise re-run the scan+tokenize+tf-window lineage.
    # INTENTIONALLY not unpersisted (ADVICE r7): the RETURNED frame
    # still reads w lazily, so releasing it here would defeat the
    # reuse; callers that loop (bench) clearCache() between runs —
    # the repo's contract for result-lineage persists
    w = (
        tf.join(dfreq, "word")
        .crossJoin(broadcast(total))
        .where(F.col("df") * DF_CAP_FRAC <= F.col("n_docs"))
        .select("doc_id", "word",
                F.expr(f"(cnt * n_docs * {TFIDF_W_SCALE}) div "
                       "(doc_len * df)").alias("iw"))
        .where(F.col("iw") > 0)
    ).persist()
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("iw").cast("decimal(38,0)") * F.col("iw"))
        .alias("norm2"))
    a = w.select(F.col("doc_id").alias("doc_a"), "word",
                 F.col("iw").alias("iwa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "word",
                 F.col("iw").alias("iwb"))
    dots = (
        a.join(b, "word")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("iwa").cast("decimal(38,0)") * F.col("iwb"))
             .alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"),
                      F.col("norm2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"),
                      F.col("norm2").alias("nb2"))
    return (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .withColumn("cos_sim",
                    floor4(F.col("dot")
                           / (F.sqrt("na2") * F.sqrt("nb2"))))
        .where(F.col("cos_sim") >= TFIDF_COS_THRESHOLD)
        .select("doc_a", "doc_b", "cos_sim")
    )


PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85          # = PR_D_NUM / PR_D_DEN exactly
PR_D_NUM, PR_D_DEN = 17, 20
PR_SCALE = 10 ** 12              # fixed-point rank resolution


def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the lexical similarity graph
    (tfidf_cosine_pairs edges, cosine as edge weight) — document
    centrality for corpus curation (a high-rank doc is 'representative',
    a near-zero one an outlier). Pregel shape: per round one join of the
    compact rank vector against the (persisted) edge list and one
    hash-agg; ranks live only on graph nodes, never the full corpus.

    Numerics: ranks are FIXED-POINT BIGINTs at PR_SCALE resolution and
    every per-round operation is integer (per-edge contribution
    ``(r * w) div out_w``, damping ``(17 * c) div 20``), so the result
    is EXACT in any summation order and on any engine — the DuckDB
    oracle unrolls the same PAGERANK_ITERS rounds as chained CTEs and
    hash-matches. Truncation bias per round is < n_edges / PR_SCALE,
    ~1e-9 at any plausible graph size (pinned vs float numpy within
    1e-5 by tests/test_pagerank.py)."""
    pairs = tfidf_cosine_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst"),
                     F.round(F.col("cos_sim") * 10000)
                     .cast("bigint").alias("w"))
        .union(pairs.select(F.col("doc_b").alias("src"),
                            F.col("doc_a").alias("dst"),
                            F.round(F.col("cos_sim") * 10000)
                            .cast("bigint").alias("w")))
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans_raw = edges.join(out_w, "src").persist()
    # size the iteration to the similarity graph, not the corpus: edges
    # are hash-partitioned by src into |edges|/100k partitions and cached
    # in that layout, so each round reshuffles only the rank vector (same
    # pattern as dedup.dedup_groups)
    n_edges = trans_raw.count()
    n_parts = max(2, min(spark.sparkContext.defaultParallelism,
                         1 + n_edges // 100_000))
    trans = trans_raw.repartition(n_parts, "src").persist()
    nodes = trans.select(F.col("src").alias("doc_id")).distinct()
    n_nodes = nodes.count()
    trans_raw.unpersist()
    if n_nodes == 0:
        trans.unpersist()
        return nodes.select("doc_id", F.lit(0.0).alias("rank"))
    r0 = PR_SCALE // n_nodes
    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // (PR_D_DEN * n_nodes)
    ranks = nodes.select(
        "doc_id", F.lit(r0).cast("bigint").alias("r")) \
        .localCheckpoint(eager=True)
    for _ in range(PAGERANK_ITERS):
        contrib = (
            trans.join(ranks.select(F.col("doc_id").alias("src"), "r"),
                       "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("(r * w) div out_w")).alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes.doc_id == contrib.dst, "left")
            .select("doc_id",
                    F.expr(f"CAST({base} + ({PR_D_NUM} * coalesce(c, 0)) "
                           f"div {PR_D_DEN} AS BIGINT)").alias("r"))
            .localCheckpoint(eager=True)
        )
    trans.unpersist()
    return ranks.select(
        "doc_id", (F.col("r") / F.lit(float(PR_SCALE))).alias("rank"))


SPLIT_BUCKETS = 100
TRAIN_PCT, VAL_PCT = 80, 10


def split_bucket() -> Column:
    """THE holdout-bucket rule, single-sourced (VERDICT r13 item 1):
    first-8-hex md5 of doc_id read as a base-16 integer, mod
    SPLIT_BUCKETS. Shared by ``doc_split`` (bucket -> named split) and
    ``quality``'s inline train gate (bucket < TRAIN_PCT applied as one
    extra projection — at 100 TB a join back to a second documents
    scan would shuffle the corpus to attach one boolean a hash of the
    key already encodes), so the two renderings cannot drift."""
    return (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                               1, 8), 16, 10)
            .cast("bigint") % SPLIT_BUCKETS)


def split_bucket_sql() -> str:
    """DuckDB rendering of ``split_bucket`` — every oracle that
    re-derives the holdout split composes this fragment (doc_split's
    oracle, quality's replay CTEs, corpus.py's ``_SPLIT_SQL``)."""
    return ("CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), "
            f"1, 8)) AS BIGINT) % {SPLIT_BUCKETS}")


def split_name() -> Column:
    """bucket -> named split, the ``doc_split`` rendering of THE
    single-sourced rule — exposed (r14, guide §2.4) so consumers whose
    frame already carries ``doc_id`` attach the split ROW-LOCALLY as a
    projection instead of joining a second ``documents`` scan: at
    100 TB that join shuffles the corpus to attach a string a hash of
    the key already encodes (the ``split_bucket`` docstring's own
    argument, previously applied only to quality's train gate)."""
    bucket = split_bucket()
    return (F.when(bucket < TRAIN_PCT, "train")
            .when(bucket < TRAIN_PCT + VAL_PCT, "val")
            .otherwise("test"))


def doc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test holdout assignment: md5-bucket of
    doc_id -> 80/10/10 (rule: ``split_bucket``). No RNG and no state,
    so the split is reproducible on any engine, cluster size, or
    partitioning — the property a training pipeline actually needs
    from a holdout (a seeded `sample()` changes with partition
    layout)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", split_bucket().alias("bucket"),
        split_name().alias("split"))


# Per-language sampling targets in per-mille (upsample nothing, just
# deterministic downsampling); languages not listed fall back to DEFAULT.
SAMPLE_RATES: dict[str, int] = {"en": 500, "de": 350, "es": 350,
                                "fr": 350, "zh": 250}
SAMPLE_DEFAULT = 200
SAMPLE_BUCKETS = 1000


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a per-LANGUAGE fraction of
    documents, selected by md5 bucket of a salted doc_id ('sample:' salt
    keeps this independent of doc_split's buckets). No RNG, no state —
    the sample is identical on any engine, cluster size, or partition
    layout, which is what corpus-mixing recipes need (a seeded sample()
    changes with partitioning). Rates ride a broadcast constant dim, so
    the plan is scan -> broadcast join -> filter: one pass, no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("bigint") % SAMPLE_BUCKETS)
    rates = spark.createDataFrame(
        sorted(SAMPLE_RATES.items()), "lang STRING, rate_per_mille INT")
    return (
        docs.select("doc_id", "lang", bucket.alias("sample_bucket"))
        .join(broadcast(rates), "lang", "left")
        .withColumn("rate_per_mille",
                    F.coalesce("rate_per_mille", F.lit(SAMPLE_DEFAULT)))
        .where(F.col("sample_bucket") < F.col("rate_per_mille"))
        .select("doc_id", "lang", "sample_bucket", "rate_per_mille")
    )


SOURCE_QUOTA = 15
N_QUOTA_SALTS = 32


def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping (anti-domination): keep at most
    SOURCE_QUOTA documents per source, chosen by deterministic
    md5-priority order (salted hash, tiebreak doc_id) so the survivors
    are partition-independent — the "no single crawl domain dominates
    the mix" primitive.

    Salted two-phase top-K (same pattern as functions/skew.py): a
    single window over (source) would sort EVERY row of a hot source in
    one task at 100 TB; instead phase 1 takes top-K within
    (source, salt) — bounding any task at ~1/N_QUOTA_SALTS of the
    hottest source — and phase 2 re-ranks the surviving
    K x N_QUOTA_SALTS rows per source. Dropping a row ranked > K inside
    its salt can never drop a global top-K row, so the result is
    IDENTICAL to the one-window form (the oracle is that form)."""
    from pyspark.sql.window import Window
    docs = load_table(spark, sf_dir, "documents")
    pri = F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(N_QUOTA_SALTS))
    w1 = Window.partitionBy("source", "salt").orderBy("pri", "doc_id")
    cand = (
        docs.select("doc_id", "source", pri.alias("pri"),
                    salt.alias("salt"))
        .withColumn("rk1", F.row_number().over(w1))
        .where(F.col("rk1") <= SOURCE_QUOTA)
    )
    w2 = Window.partitionBy("source").orderBy("pri", "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= SOURCE_QUOTA)
        .select("doc_id", "source", "rk")
    )


def token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-token density — the unigram-LM quality proxy without the
    log: per document, the mean inverse corpus frequency of its tokens,
    rarity(w) = N div c_w (N = corpus token count). A doc full of
    common words scores near its length's floor; OOV-heavy or
    jargon-heavy docs score high — the same signal 'perplexity-filter'
    pipelines threshold on, in an integer-exact form (exact integer
    sums in any order, then ONE float division; libm log would not
    hash-match across engines).

    The per-doc sum accumulates in DECIMAL(38,0) (DuckDB: HUGEINT) and
    emits DOUBLE (r7, the text_hash_sum rule): a globally-unique token
    contributes rarity N per occurrence, so a single ~4e5-token
    identifier/base64-spam document at a 100 TB corpus (N ~ 2.5e13
    tokens) pushes the sum past BIGINT — real web-crawl input, not a
    corner case. DOUBLE is the one output representation both engines'
    pandas bridges agree on byte-for-byte, and both convert the same
    exact integer, so values match wherever BIGINT sufficed. The
    (38,0) width is measured ~FREE here (r9 A/B at sf0.1: 0.887 s vs
    0.879-0.892 s for an (18,0) row variant — this wall is tokenize +
    the vocabulary join, not the one sum per doc), unlike the hot
    multi-sum aggregates the r8 row_units lesson applies to; and the
    r9 scale decomposition showed the probe's former 5.3x 16x-growth
    was replica-layout confound + fixed-cost dilution (honest layout:
    3.25x wall at 16x input, ~linear per-row cost).

    Scale shape: one tokenize pass, token counts as a per-word
    aggregate joined back, corpus total as a broadcast scalar — no
    driver round trip. The count-back join is deliberately UNHINTED
    (r7): the vocabulary grows with the corpus — the same unique-token
    spam that motivates the decimal sum adds |doc| words per doc — so
    a forced ``broadcast(cw)`` would OOM every executor at 100 TB.
    At gate SF the join still executes broadcast — AQE's runtime
    conversion from the finished shuffle stage's actual size (ADVICE
    r7: cw is an aggregation output, so static estimates derive from
    the large child scan and never pick the broadcast themselves) —
    and degrades to a shuffle join when the runtime stats outgrow the
    threshold; stopword-key skew in that join is AQE skew-join's job
    (on in session.py)."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id",
                       F.explode(tokenize(F.lower(F.col("text"))))
                       .alias("word"))
    cw = toks.groupBy("word").agg(F.count("*").alias("c_w"))
    # corpus total = sum of the per-word counts: a vocabulary-sized scan
    # of the aggregate just built, not a THIRD full tokenize pass over
    # the corpus (r14, guide §1.2 "don't compute things twice")
    total = cw.agg(F.sum("c_w").alias("n_total"))
    return (
        toks.join(cw, "word")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             F.sum(F.expr("CAST(n_total div c_w AS DECIMAL(38,0))"))
             .alias("rsum"))
        .select("doc_id", "n_tokens",
                F.col("rsum").cast("double").alias("rarity_sum"),
                floor4(F.col("rsum").cast("double") / F.col("n_tokens"))
                .alias("avg_rarity"))
    )


PACK_BUDGET = 256                 # tokens per packed training sequence

# Two-pass packing form: contiguous doc_ids per sub-shard. The default
# single-window form is optimal while sources are numerous; the
# two-pass distributed scan takes over for a HOT source — see
# pack_assignment's docstring and the hot-source probe in
# tools/scale_probe.py.
PACK_SUBSHARD_DOCS = 4096

# Auto-switch boundary (VERDICT r13 item 3): the idle-host crossover
# was MEASURED between ~6M and ~23M docs in the hottest source
# (tools/scale_probe.py hot-source section, NOTES_r13 — two-pass wins
# 1.28x at 23M with a growing gap, and its real 100 TB advantage is
# task MEMORY: the window form sorts the hot source's whole row set in
# ONE task). 10M sits inside the measured band, so below it the
# window's one-task sort is both faster and safely small.
PACK_HOT_DOCS = 10_000_000


def _pack_mode() -> str:
    """Packing form selection: the ``SPARK_GRAFT_PACK_TWO_PASS`` knob
    (read at call time so probes/tests flip it per run) forces a form
    ("1" = two-pass, "0" = window); otherwise ``pack_assignment``
    decides from the staged frame's own per-source counts — the
    100 TB default no longer rides on an operator remembering to flip
    a knob (VERDICT r13 item 3)."""
    v = os.environ.get("SPARK_GRAFT_PACK_TWO_PASS", "")
    if v == "1":
        return "two_pass"
    if v == "0":
        return "window"
    return "auto"


def pack_assignment(staged: DataFrame, n_col: str) -> DataFrame:
    """THE packing rule, single-sourced (VERDICT r12 item 3): documents
    concatenate per source in doc_id order; ``start_offset`` is the
    exclusive per-source prefix sum of ``n_col``; ``seq_id =
    start_offset div PACK_BUDGET`` (a doc belongs to the sequence its
    FIRST token lands in). Shared by ``pack_sequences`` (raw token
    counts) and ``epoch_assembly`` (post-scrub counts) so the rule
    cannot drift between the operator and the capstone. Adds ``cum``,
    ``start_offset``, ``seq_id``; callers project.

    Two physical forms, value-identical by construction — the offset
    arithmetic does not depend on how the prefix sum was computed
    (pinned across forms AND across the auto-switch boundary by
    tests/test_training_layout.py):

    - window form: ONE prefix-sum window per source — fewest shuffles,
      but a hot source puts all its rows through one task's sort;
    - two-pass form: the classic two-pass distributed scan —
      contiguous doc_id sub-shards take local prefix sums in parallel
      under a (source, sub-shard) window; per-sub-shard totals (one
      tiny row each) prefix-sum into cumulative offsets; an equi-join
      on the same keys (no extra corpus exchange — the window already
      hashed on them) adds the offset back. A source holding 90% of
      the corpus spreads over ~|docs|/PACK_SUBSHARD_DOCS tasks instead
      of one (measured: tools/scale_probe.py hot-source probe).

    Form selection is AUTOMATIC (VERDICT r13 item 3): one source-only
    counting aggregation over the staged frame (Catalyst prunes the
    token-count expression away, so this scans just the source column;
    the result is ONE scalar to the driver — the ivf_train rule)
    reads the hottest source's row count and picks two-pass past
    PACK_HOT_DOCS. The env knob still forces either form (probes,
    tests, operator override)."""
    from pyspark.sql.window import Window
    mode = _pack_mode()
    if mode == "auto":
        hot = (staged.groupBy("source").count()
               .agg(F.max("count")).collect()[0][0]) or 0
        mode = "two_pass" if hot > PACK_HOT_DOCS else "window"
    if mode == "window":
        w = Window.partitionBy("source").orderBy("doc_id") \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cum = staged.withColumn("cum", F.sum(n_col).over(w))
    else:
        # exact integer floor-div for the sub-shard id: DIV truncates
        # toward zero, which would interleave negative ids with bucket
        # 0 — subtracting pmod first makes the dividend exactly
        # divisible, so sub-shard order == doc_id order for ALL ids
        sub = F.expr(f"(doc_id - pmod(doc_id, {PACK_SUBSHARD_DOCS})) "
                     f"div {PACK_SUBSHARD_DOCS}")
        with_sub = staged.withColumn("sub", sub)
        w_local = Window.partitionBy("source", "sub").orderBy("doc_id") \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        w_off = Window.partitionBy("source").orderBy("sub") \
            .rowsBetween(Window.unboundedPreceding, -1)
        offsets = (with_sub.groupBy("source", "sub")
                   .agg(F.sum(n_col).alias("sub_total"))
                   .withColumn("off", F.coalesce(
                       F.sum("sub_total").over(w_off),
                       F.lit(0).cast("bigint")))
                   .select("source", "sub", "off"))
        cum = (with_sub.join(offsets, ["source", "sub"])
               .withColumn("cum", F.sum(n_col).over(w_local) + F.col("off"))
               .drop("sub", "off"))
    return (cum.withColumn("start_offset",
                           (F.col("cum") - F.col(n_col)).cast("bigint"))
            .withColumn("seq_id",
                        F.expr(f"(cum - {n_col}) div {PACK_BUDGET}")))


def pack_sql(inner: str, n_col: str) -> str:
    """DuckDB rendering of ``pack_assignment`` — the oracles compose the
    SAME single-sourced rule (pack_sequences over raw counts,
    epoch_assembly over scrubbed counts). Emits inner's columns plus
    cum/start_offset/seq_id; callers project."""
    return f"""
        SELECT *, CAST(cum - {n_col} AS BIGINT) AS start_offset,
               CAST((cum - {n_col}) // {PACK_BUDGET} AS BIGINT) AS seq_id
        FROM (SELECT *, sum({n_col}) OVER (PARTITION BY source
                  ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
              FROM ({inner}))
    """


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the GPT-style training
    data layout (rule: ``pack_assignment``). Output is the per-doc
    packing assignment a dataloader consumes: (doc_id, source,
    n_tokens, start_offset, seq_id).

    Scale shape: one prefix-sum window per source by default; a hot
    source switches to the two-pass sub-sharded scan (same values —
    pack_assignment's docstring). All arithmetic is exact BIGINT, so
    any engine agrees."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokenize(F.col("text"))).cast("bigint")
    staged = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    return pack_assignment(staged, "n_tokens").select(
        "doc_id", "source", "n_tokens", "start_offset", "seq_id")


SHUFFLE_SHARDS = 16


def shuffle_assignment(df: DataFrame, unit_key, *tiebreak: str) -> DataFrame:
    """THE training-shuffle rule, single-sourced (VERDICT r12 item 3):
    shard = first-8-hex md5 bucket of the salted unit key, pos = rank
    of an independently salted md5 key within the shard (``tiebreak``
    columns break exact md5 ties deterministically). No RNG, no state —
    reproducible on any engine, cluster size, or partition layout.
    Shared by ``training_shuffle`` (units = documents) and
    ``epoch_assembly`` (units = packed sequences). Adds
    ``shard``/``key``/``pos``; callers project."""
    from pyspark.sql.window import Window
    shard = (F.conv(F.substring(
        F.md5(F.concat(F.lit("shard:"), unit_key)), 1, 8), 16, 10)
        .cast("bigint") % SHUFFLE_SHARDS)
    w = Window.partitionBy("shard").orderBy("key", *tiebreak)
    return (df.withColumn("shard", shard)
            .withColumn("key", F.md5(F.concat(F.lit("shuffle:"), unit_key)))
            .withColumn("pos", F.row_number().over(w).cast("bigint")))


def shuffle_sql(inner: str, key_expr: str, tiebreak: str) -> str:
    """DuckDB rendering of ``shuffle_assignment`` — same single-sourced
    rule for the oracles. Emits inner's columns plus shard/key/pos;
    callers project."""
    return f"""
        SELECT *, CAST(row_number() OVER (PARTITION BY shard
                   ORDER BY key, {tiebreak}) AS BIGINT) AS pos
        FROM (SELECT *,
                   CAST(concat('0x', substring(md5(
                        'shard:' || {key_expr}), 1, 8))
                        AS BIGINT) % {SHUFFLE_SHARDS} AS shard,
                   md5('shuffle:' || {key_expr}) AS key
              FROM ({inner}))
    """


def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order randomization, in
    the sharded form a distributed dataloader consumes (rule:
    ``shuffle_assignment``). A seeded ``orderBy(rand())`` is NOT
    reproducible across engines/partitionings; salted md5 is. The
    per-shard window parallelizes across shards — no global sort — and
    md5 spreads shard sizes to ~n/SHUFFLE_SHARDS whp, so no task hot
    spot; at 100 TB, raise SHUFFLE_SHARDS to the target file count."""
    docs = load_table(spark, sf_dir, "documents")
    return shuffle_assignment(
        docs.select("doc_id"), F.col("doc_id").cast("string"), "doc_id"
    ).select("doc_id", "shard", "pos")


QUALITY_CUT = 0.5


def curation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation pipeline as ONE declarative
    plan: exact-dedup survivors -> quality gate (doc_quality score >=
    QUALITY_CUT) -> language ID -> deterministic holdout split, then
    corpus accounting per (split, language). Composes the individual
    operators' logic so Catalyst fuses the whole pipeline; per-group
    stats use only counts, integer sums, and min/max (all
    engine-order-independent)."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    survivors = (docs.select(F.md5("text").alias("h"), "doc_id")
                 .groupBy("h").agg(F.min("doc_id").alias("doc_id"))
                 .select("doc_id"))
    from mit_6_5840_mapreduce_spark.operators import textstats as _self
    quality = _self.doc_quality(spark, sf_dir).where(
        F.col("quality_score") >= QUALITY_CUT)
    lang = _self.lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    # split attached row-locally (split_name, r14, guide §2.4): every
    # surviving doc_id is from documents, so the old inner join against
    # a fourth documents scan was a projection in disguise
    return (
        survivors.join(quality, "doc_id")
        .join(lang, "doc_id")
        .withColumn("split", _self.split_name())
        .groupBy("split", "pred_lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("total_tokens"),
             F.min("quality_score").alias("min_quality"),
             F.max("quality_score").alias("max_quality"))
    )



def similarity_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the lexical similarity graph — the
    second graph-analytics operator next to ``doc_pagerank``: all
    (a < b < c) document triples whose three pairwise TF-IDF cosine
    similarities clear the edge threshold. Dense near-dup clusters show
    up as triangle-rich neighborhoods (the clustering-coefficient
    signal community detection builds on).

    Scale shape (100 TB): the canonical ordered edge-edge-edge join —
    every edge is stored once with doc_a < doc_b, so each triangle is
    produced exactly once with no post-hoc dedup; both joins are
    equi-joins on document ids over the EDGE SUBGRAPH (orders of
    magnitude smaller than the corpus — the doc_pagerank argument), and
    the edge frame is persisted so the three references share one
    materialization instead of re-running the TF-IDF pipeline."""
    from mit_6_5840_mapreduce_spark.operators import textstats as _self
    edges = (_self.tfidf_cosine_pairs(spark, sf_dir)
             .select("doc_a", "doc_b").persist())
    ab = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    bc = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    ac = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    return (
        ab.join(bc, "b").join(ac, ["a", "c"])
        .select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"),
                F.col("c").alias("doc_c"))
    )


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "similarity_triangles": similarity_triangles,
    "tfidf_cosine_pairs": tfidf_cosine_pairs,
    "curation_summary": curation_summary,
    "doc_pagerank": doc_pagerank,   # fixed-point integer PageRank
    "doc_split": doc_split,
    "pack_sequences": pack_sequences,
    "training_shuffle": training_shuffle,
    "stratified_sample": stratified_sample,
    "source_quota_cap": source_quota_cap,
    "doc_chunks": doc_chunks,
    "doc_chunks_udtf": doc_chunks_udtf,
    "lang_id": lang_id,
    "lang_confusion": lang_confusion,
    "doc_quality": doc_quality,
    "token_stats": token_stats,
    "token_rarity": token_rarity,
    "doc_fingerprint": doc_fingerprint,
}

_LEX_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, words in LEXICONS.items() for w in words)

# pack_sequences' staging scan: raw token counts per doc (the rule
# itself is rendered by pack_sql)
_PACK_STAGED_SQL = r"""
    SELECT doc_id, source,
           len(list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
                           t -> t <> ''))::BIGINT AS n_tokens
    FROM documents
"""

_RATE_VALUES = ", ".join(
    f"('{lang}', {rate})" for lang, rate in sorted(SAMPLE_RATES.items()))

ORACLES = {
    # both rendered by the single-sourced rule fragments (pack_sql /
    # shuffle_sql) that epoch_assembly's oracle composes too
    "pack_sequences": f"""
        SELECT doc_id, source, n_tokens, start_offset, seq_id
        FROM ({pack_sql(_PACK_STAGED_SQL, "n_tokens")})
    """,
    "training_shuffle": f"""
        SELECT doc_id, shard, pos
        FROM ({shuffle_sql("SELECT doc_id FROM documents",
                           "CAST(doc_id AS VARCHAR)", "doc_id")})
    """,
    "stratified_sample": f"""
        WITH rates(lang, rate_per_mille) AS (VALUES {_RATE_VALUES}),
        b AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substring(
                        md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % {SAMPLE_BUCKETS} AS sample_bucket
            FROM documents
        )
        SELECT doc_id, b.lang, sample_bucket,
               CAST(coalesce(rate_per_mille, {SAMPLE_DEFAULT}) AS INT)
                   AS rate_per_mille
        FROM b LEFT JOIN rates ON rates.lang = b.lang
        WHERE sample_bucket < coalesce(rate_per_mille, {SAMPLE_DEFAULT})
    """,
    "source_quota_cap": f"""
        SELECT doc_id, source, CAST(rk AS INT) AS rk
        FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rk
            FROM documents
        )
        WHERE rk <= {SOURCE_QUOTA}
    """,
    "doc_split": f"""
        SELECT doc_id, bucket,
               CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                    WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, {split_bucket_sql()} AS bucket
            FROM documents
        )
    """,
    "tfidf_cosine_pairs": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^\p{{L}}]+'),
                       t -> t <> '')) AS word
            FROM documents
        ),
        tf AS (
            SELECT doc_id, word, count(*) AS cnt
            FROM toks GROUP BY doc_id, word
        ),
        wl AS (
            SELECT tf.*, sum(cnt) OVER (PARTITION BY doc_id) AS doc_len
            FROM tf
        ),
        dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        total AS (SELECT count(*) AS n_docs FROM documents),
        w AS (
            SELECT doc_id, word,
                   (cnt * n_docs * {TFIDF_W_SCALE})
                       // (doc_len * df) AS iw
            FROM wl JOIN dfreq USING (word) CROSS JOIN total
            WHERE df * {DF_CAP_FRAC} <= n_docs
              AND (cnt * n_docs * {TFIDF_W_SCALE}) // (doc_len * df) > 0
        ),
        -- HUGEINT (Spark: DECIMAL(38,0)): iw^2 overflows BIGINT once
        -- n_docs passes ~1e9; exact integer -> DOUBLE at the same
        -- point, so values are unchanged where BIGINT sufficed
        norms AS (
            SELECT doc_id,
                   CAST(sum(CAST(iw AS HUGEINT) * iw) AS HUGEINT)
                       AS norm2
            FROM w GROUP BY doc_id
        ),
        dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(sum(CAST(a.iw AS HUGEINT) * b.iw) AS HUGEINT)
                       AS dot
            FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               floor(dot / (sqrt(na.norm2) * sqrt(nb.norm2)) * 10000)
                   / 10000 AS cos_sim
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b
        WHERE floor(dot / (sqrt(na.norm2) * sqrt(nb.norm2)) * 10000)
              / 10000 >= {TFIDF_COS_THRESHOLD}
    """,
    "tfidf_top_terms": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^\p{{L}}]+'),
                       t -> t <> '')) AS word
            FROM documents
        ),
        tf AS (
            SELECT doc_id, word, count(*) AS term_count
            FROM toks GROUP BY doc_id, word
        ),
        wl AS (
            SELECT tf.*, sum(term_count) OVER (PARTITION BY doc_id)
                       AS doc_len
            FROM tf
        ),
        dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        total AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, word, term_count, tfidf, rank FROM (
            SELECT doc_id, word, term_count,
                   floor(((term_count * n_docs)::DOUBLE
                          / (doc_len * df)::DOUBLE) * 10000) / 10000
                       AS tfidf,
                   row_number() OVER (PARTITION BY doc_id
                       ORDER BY (term_count * n_docs)::DOUBLE
                                / (doc_len * df)::DOUBLE DESC,
                                word) AS rank
            FROM wl JOIN dfreq USING (word) CROSS JOIN total
        ) WHERE rank <= {TFIDF_TOP_K}
    """,
    "doc_chunks": rf"""
        WITH staged AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'),
                               t -> t <> '') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(len(list_slice(toks, start,
                    least(start + {CHUNK_TOKENS} - 1, len(toks))))
                    AS BIGINT) AS chunk_tokens,
               array_to_string(list_slice(toks, start,
                    least(start + {CHUNK_TOKENS} - 1, len(toks))), ' ')
                   AS chunk_text
        FROM (
            SELECT doc_id, toks,
                   unnest(range(1, len(toks) + 1, {CHUNK_STRIDE})) AS start
            FROM staged
            WHERE len(toks) > 0
        )
    """,
    "lang_id": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^\p{{L}}]+'))
                       AS word
            FROM documents
        ),
        lex AS (SELECT * FROM (VALUES {_LEX_VALUES}) l(cand_lang, stopword)),
        hits AS (
            SELECT doc_id, cand_lang, count(*) AS hits
            FROM toks JOIN lex ON word = stopword
            GROUP BY doc_id, cand_lang
        ),
        best AS (
            SELECT doc_id, cand_lang AS pred_lang, hits,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY hits DESC, cand_lang) AS rn
            FROM hits
        )
        SELECT d.doc_id,
               coalesce(b.pred_lang, 'und') AS pred_lang,
               coalesce(b.hits, 0) AS hits
        FROM documents d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
    """,
    "doc_quality": rf"""
        WITH base AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'),
                                   t -> t <> ''))::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars,
                   list_sum(list_transform(
                       list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'),
                                   t -> t <> ''),
                       t -> length(t)::DOUBLE)) AS tok_len_sum,
                   length(regexp_replace(text, '[\p{{L}}\p{{N}}\s]', '', 'g'))
                       ::BIGINT AS n_punct
            FROM documents
        ),
        derived AS (
            SELECT doc_id, n_tokens, n_chars,
                   CASE WHEN n_tokens > 0
                        THEN coalesce(tok_len_sum, 0) / n_tokens
                        ELSE 0.0 END AS avg_tok,
                   CASE WHEN n_chars > 0
                        THEN n_punct::DOUBLE / n_chars
                        ELSE 0.0 END AS punct_ratio
            FROM base
        )
        SELECT doc_id, n_tokens, n_chars,
               floor(avg_tok * 10000) / 10000 AS avg_token_len,
               floor(punct_ratio * 10000) / 10000 AS punct_ratio,
               floor((least(n_tokens / 100.0, 1.0) * 0.5
                      + (1 - least(punct_ratio * 5, 1.0)) * 0.3
                      + least(avg_tok / 8.0, 1.0) * 0.2) * 10000) / 10000
                   AS quality_score
        FROM derived
    """,
    "token_rarity": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^\p{{L}}]+'),
                       t -> t <> '')) AS word
            FROM documents
        ),
        cw AS (SELECT word, count(*) AS c_w FROM toks GROUP BY word),
        total AS (SELECT count(*) AS n_total FROM toks)
        -- HUGEINT accumulation + DOUBLE emission (Spark: DECIMAL(38,0)):
        -- a unique token contributes rarity n_total per occurrence, so
        -- BIGINT overflows on identifier-spam docs at 100 TB corpus N
        SELECT doc_id,
               count(*) AS n_tokens,
               CAST(sum(CAST(n_total // c_w AS HUGEINT)) AS DOUBLE)
                   AS rarity_sum,
               floor(CAST(sum(CAST(n_total // c_w AS HUGEINT)) AS DOUBLE)
                     / count(*) * 10000) / 10000 AS avg_rarity
        FROM toks JOIN cw USING (word) CROSS JOIN total
        GROUP BY doc_id
    """,
    "token_stats": rf"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\s+'),
                               t -> t <> ''))::BIGINT AS ws_tokens,
               len(list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'),
                               t -> t <> ''))::BIGINT AS letter_tokens,
               len(regexp_extract_all(text,
                   '\p{{L}}+|\p{{N}}+|[^\s\p{{L}}\p{{N}}]'))::BIGINT AS bpe_tokens,
               len(list_distinct(
                   list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'),
                               t -> t <> '')))::BIGINT AS distinct_tokens
        FROM documents
    """,
    "doc_fingerprint": r"""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   AS fingerprint,
               length(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   ::BIGINT AS norm_len
        FROM documents
    """,
}

# doc_pagerank is a FIXED iteration count of integer-exact operations
# (see its docstring), so the oracle unrolls the power iteration as
# chained CTEs: c{{i}} = per-node contribution sums, r{{i}} = damped
# update, repeated PAGERANK_ITERS times over the same edge list the
# Spark side uses (the tfidf_cosine_pairs oracle, composed as a CTE).
def _pagerank_oracle() -> str:
    steps = []
    for i in range(1, PAGERANK_ITERS + 1):
        steps.append(f"""
    c{i} AS (
        SELECT t.dst, sum((r.r * t.w) // t.out_w) AS c
        FROM trans t JOIN r{i - 1} r ON r.doc_id = t.src
        GROUP BY t.dst
    ),
    r{i} AS (
        SELECT n.doc_id,
               (SELECT base FROM consts)
               + ({PR_D_NUM} * coalesce(c.c, 0)) // {PR_D_DEN} AS r
        FROM nodes n LEFT JOIN c{i} c ON n.doc_id = c.dst
    )""")
    # AS MATERIALIZED is load-bearing: the unrolled rounds reference
    # trans/nodes repeatedly, and DuckDB's default CTE inlining would
    # re-evaluate the expensive pairs self-join once per round
    # (measured 78 s -> 0.2 s at sf0.01)
    return f"""
    WITH pairs AS MATERIALIZED ({ORACLES["tfidf_cosine_pairs"]}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst,
               CAST(round(cos_sim * 10000) AS BIGINT) AS w FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst,
               CAST(round(cos_sim * 10000) AS BIGINT) AS w FROM pairs
    ),
    outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
    trans AS MATERIALIZED (
        SELECT e.src, e.dst, e.w, o.out_w
        FROM edges e JOIN outw o USING (src)
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM trans),
    consts AS MATERIALIZED (
        SELECT {PR_SCALE} // count(*) AS init_r,
               {(PR_D_DEN - PR_D_NUM) * PR_SCALE}
                   // ({PR_D_DEN} * count(*)) AS base
        FROM nodes
    ),
    r0 AS (SELECT doc_id, (SELECT init_r FROM consts) AS r FROM nodes),
    {",".join(steps)}
    SELECT doc_id, r / {float(PR_SCALE)} AS rank
    FROM r{PAGERANK_ITERS}
    """


ORACLES["doc_pagerank"] = _pagerank_oracle()

# the UDTF twin shares doc_chunks' output contract, so it shares the
# oracle — any divergence between the Python tokenizer (str.isalpha)
# and the regex tokenizer (\p{L}) fails the gate
ORACLES["doc_chunks_udtf"] = ORACLES["doc_chunks"]

# composed from the lang_id oracle (one source of truth for the
# classifier being audited)
ORACLES["lang_confusion"] = f"""
    WITH preds AS ({ORACLES["lang_id"]}),
    cells AS (
        SELECT d.lang, p.pred_lang, count(*) AS n_docs
        FROM documents d JOIN preds p ON p.doc_id = d.doc_id
        GROUP BY d.lang, p.pred_lang
    )
    SELECT lang, pred_lang, n_docs,
           floor(n_docs / (sum(n_docs) OVER (PARTITION BY lang))::DOUBLE
                 * 10000) / 10000 AS row_share
    FROM cells
"""

# The capstone oracle composes the individual operators' oracle SQL as
# CTEs — one source of truth per sub-pipeline.
ORACLES["curation_summary"] = f"""
    WITH dq AS ({ORACLES["doc_quality"]}),
    lid AS ({ORACLES["lang_id"]}),
    ds AS ({ORACLES["doc_split"]}),
    survivors AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    )
    SELECT ds.split, lid.pred_lang,
           count(*) AS n_docs,
           CAST(sum(dq.n_tokens) AS BIGINT) AS total_tokens,
           min(dq.quality_score) AS min_quality,
           max(dq.quality_score) AS max_quality
    FROM survivors
    JOIN dq USING (doc_id)
    JOIN lid USING (doc_id)
    JOIN ds USING (doc_id)
    WHERE dq.quality_score >= {QUALITY_CUT}
    GROUP BY ds.split, lid.pred_lang
"""

ORACLES["similarity_triangles"] = f"""
        WITH pairs AS ({ORACLES["tfidf_cosine_pairs"]}),
        e AS (SELECT doc_a, doc_b FROM pairs)
        SELECT ab.doc_a, ab.doc_b, bc.doc_b AS doc_c
        FROM e ab
        JOIN e bc ON bc.doc_a = ab.doc_b
        JOIN e ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b
"""


BFS_MAX_HOPS = 4
BFS_SEED_MOD = 5


def doc_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the lexical similarity graph: hop distance
    from the nearest SEED document (doc_id % BFS_SEED_MOD == 0) for
    every graph node, capped at BFS_MAX_HOPS (unreached -> -1). The
    graph-traversal primitive next to doc_pagerank's power iteration —
    'how far is every document from a curated anchor set'.

    Pregel shape, frontier-only expansion: round i joins ONLY the nodes
    first reached in round i-1 against the (persisted, edge-partitioned)
    edge list, so each round shuffles the frontier, not the node set,
    and settled distances are never recomputed. Distances are exact
    integers and the round count is fixed, so the DuckDB oracle unrolls
    the same rounds as chained CTEs and hash-matches (the doc_pagerank
    pattern).
    """
    pairs = tfidf_cosine_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"),
                            F.col("doc_a").alias("dst")))
    )
    return bfs_hops(edges)


def bfs_hops(edges: DataFrame) -> DataFrame:
    """Frontier-only BFS over an undirected (src, dst) edge frame —
    shared by the gate query and the constructed-graph tests (the real
    similarity graph is dense enough that everything sits 1 hop from a
    seed, so multi-hop and unreached paths are pinned on hand-built
    chains)."""
    edges = edges.persist()
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    dist = nodes.select(
        "doc_id",
        F.when(F.col("doc_id") % BFS_SEED_MOD == 0, F.lit(0))
         .cast("int").alias("d")).localCheckpoint(eager=True)
    for i in range(1, BFS_MAX_HOPS + 1):
        frontier = dist.where(F.col("d") == i - 1) \
            .select(F.col("doc_id").alias("src"))
        msgs = (edges.join(frontier, "src")
                .select(F.col("dst").alias("doc_id"))
                .distinct()
                .withColumn("nd", F.lit(i).cast("int")))
        dist = (dist.join(msgs, "doc_id", "left")
                .select("doc_id",
                        F.coalesce("d", "nd").alias("d"))
                .localCheckpoint(eager=True))
    edges.unpersist()
    return dist.select(
        "doc_id", F.coalesce("d", F.lit(-1)).cast("bigint").alias("hops"))


QUERIES["doc_bfs"] = doc_bfs


def _bfs_oracle() -> str:
    steps = []
    for i in range(1, BFS_MAX_HOPS + 1):
        steps.append(f"""
    m{i} AS (
        SELECT DISTINCT e.dst AS doc_id, {i} AS nd
        FROM edges e JOIN d{i - 1} p
          ON p.doc_id = e.src AND p.d = {i - 1}
    ),
    d{i} AS (
        SELECT p.doc_id, coalesce(p.d, m.nd) AS d
        FROM d{i - 1} p LEFT JOIN m{i} m ON p.doc_id = m.doc_id
    )""")
    return f"""
    WITH pairs AS MATERIALIZED ({ORACLES["tfidf_cosine_pairs"]}),
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    d0 AS (
        SELECT doc_id,
               CASE WHEN doc_id % {BFS_SEED_MOD} = 0 THEN 0 END AS d
        FROM nodes
    ),
    {",".join(steps)}
    SELECT doc_id, CAST(coalesce(d, -1) AS BIGINT) AS hops
    FROM d{BFS_MAX_HOPS}
    """


ORACLES["doc_bfs"] = _bfs_oracle()
