"""Corpus-level analysis operators — the cross-document checks a
training-data pipeline runs before shipping a corpus (nothing in the
reference implements these; north-star extension surface like
operators/dedup.py).

- ``contamination_check``: train/test overlap audit — for every TEST
  document, how many of its word-3-gram shingles also occur anywhere in
  the TRAIN split (the standard benchmark-contamination screen).
- ``bigram_pmi``: collocation mining — pointwise-mutual-information
  ratio for frequent bigrams. The PMI is reported as the raw
  probability ratio p(xy)/(p(x)p(y)) rather than its log: log is
  monotone (identical ranking) and libm logs are not bit-identical
  across engines, while the ratio is a deterministic chain of IEEE
  mult/div on exact integer counts.

Scale design (100 TB):
- contamination joins on the 60-bit shingle hash (fixed-width ints,
  uniform), never on text; the train side is a distinct-hash set, the
  test side streams through one equi-join + one count-agg per doc.
- bigram counting is two hash-aggs (bigram, unigram) with map-side
  partial aggregation; the join of bigram counts to the two unigram
  count sides shuffles only the (already aggregated) vocabulary, not
  the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.functions.numeric import floor4
from mit_6_5840_mapreduce_spark.functions.text import tokenize
from mit_6_5840_mapreduce_spark.operators.dedup import (
    _DUCK_SHINGLES,
    _doc_shingles,
    SPAN_OCC_CAP,
    SPAN_TOKENS,
    cap_bucket_sql,
    span_wins_sql,
    token_rows_sql,
)
from mit_6_5840_mapreduce_spark.operators.textstats import (
    TRAIN_PCT,
    VAL_PCT,
    doc_split,
    split_bucket_sql,
    split_name,
)
from mit_6_5840_mapreduce_spark.sources.tables import fan_out, load_table


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per TEST-split document: total distinct shingles, how many occur
    in ANY train-split document, and the contaminated fraction. A test
    doc with a high fraction is (near-)duplicated in training data —
    exactly what eval-set hygiene must catch. Uses the same
    deterministic md5-bucket split as ``doc_split``."""
    # split attached as a ROW-LOCAL projection (r14, guide §2.4): the
    # old join against a second documents scan shuffled the shingle
    # table to attach a value md5(doc_id) already encodes
    sh = (_doc_shingles(spark, sf_dir)
          .withColumn("split", split_name())
          .cache())
    train_hs = (sh.where(F.col("split") == "train")
                .select("hs").distinct())
    test_sh = sh.where(F.col("split") == "test").select("doc_id", "hs")
    totals = test_sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"))
    shared = (test_sh.join(train_hs, "hs")
              .groupBy("doc_id").agg(F.count("*").alias("n_shared")))
    return (
        totals.join(shared, "doc_id", "left")
        .select(
            "doc_id", "n_shingles",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            floor4(F.coalesce("n_shared", F.lit(0))
                   / F.col("n_shingles")).alias("contaminated_frac"))
    )


def contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination evidence — WHERE the training split
    quotes the test split: for every (test doc, train doc) pair
    sharing a SPAN_TOKENS-token window, each maximal shared run with
    start offsets on BOTH sides. ``contamination_check`` scores the
    overlap (shingle fraction per test doc); this names the exact
    passages — the artifact an eval-hygiene audit reviews, and the
    input a cut-from-train pass needs (``dedup_span_scrub``'s rule
    applied across the split boundary instead of by doc id).

    Composition: the occurrence-capped shared-window frame
    (``_span_windows`` + ``cap_bucket_population``, the
    dedup_span_pairs doctrine — caps bound the join to <= cap^2 hits
    per window hash) tagged with ``doc_split``'s deterministic
    md5-bucket assignment; test-side windows equi-join train-side
    windows on the hash (splits are disjoint, so no doc_a < doc_b
    dance), maximal runs fall out of gaps-and-islands per
    (pair, diagonal) over partitions bounded by document length."""
    from mit_6_5840_mapreduce_spark.operators.dedup import (
        SPAN_OCC_CAP, SPAN_TOKENS, _span_windows, cap_bucket_population)
    from pyspark.sql.window import Window
    wins = cap_bucket_population(
        _span_windows(spark, sf_dir), ["hw"], SPAN_OCC_CAP)
    # split is row-local off doc_id (split_name, r14): no join against
    # a second documents scan to tag the window frame
    tagged = wins.withColumn("split", split_name())
    tw = tagged.where(F.col("split") == "test").alias("t")
    rw = tagged.where(F.col("split") == "train").alias("r")
    hits = (
        tw.join(rw, F.col("t.hw") == F.col("r.hw"))
        .select(F.col("t.doc_id").alias("test_doc_id"),
                F.col("r.doc_id").alias("train_doc_id"),
                F.col("t.pos").alias("pos_t"),
                F.col("r.pos").alias("pos_r"),
                (F.col("t.pos") - F.col("r.pos")).alias("diag"))
    )
    w = (Window.partitionBy("test_doc_id", "train_doc_id", "diag")
         .orderBy("pos_t"))
    return (
        hits.withColumn("grp", F.col("pos_t") - F.row_number().over(w))
        .groupBy("test_doc_id", "train_doc_id", "diag", "grp")
        .agg(F.min("pos_t").alias("start_test"),
             F.min("pos_r").alias("start_train"),
             (F.count("*") + (SPAN_TOKENS - 1)).alias("span_tokens"))
        .select("test_doc_id", "train_doc_id", "start_test",
                "start_train", "span_tokens")
    )


def decontaminate_span_scrub(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """The decontamination ACTION stage — cut the quoted test-set
    passages FROM the training split (detect: ``contamination_check``;
    attribute: ``contamination_spans``; cut: here). Per TRAIN-split
    document: token count, tokens cut, cut fraction, and the scrubbed
    text recomposed from the surviving tokens. The test split is
    NEVER modified — eval sets stay fixed; training data loses the
    quotes — and only positions inside a detected cross-split span
    are cut, unlike a drop-the-whole-doc filter
    (``decontaminate_split``), so a long train doc quoting one
    benchmark paragraph keeps everything else.

    Plumbing: ``contamination_spans``' train-side offsets explode to
    cut positions (bounded by |quoted spans| x span length), then the
    shared ``scrub_positions`` recompose stage (dedup.py) runs
    restricted to train docs — identical anti-join/recompose
    semantics as ``dedup_span_scrub`` by construction."""
    from mit_6_5840_mapreduce_spark.operators.dedup import scrub_positions
    spans = contamination_spans(spark, sf_dir)
    cuts = (
        spans.select(
            F.col("train_doc_id").alias("doc_id"),
            F.explode(F.sequence(
                F.col("start_train"),
                F.col("start_train") + F.col("span_tokens") - 1))
            .alias("pos"))
        .distinct()
    )
    # the train restriction is row-local off doc_id (split_name, r14):
    # a filter over the shared token-array frame, not a semi-join
    # against a second documents scan
    return scrub_positions(spark, sf_dir, cuts,
                           only=(split_name() == "train"))


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score (the Gopher/C4-style quality
    rule): fraction of a doc's word-3-gram shingles that are repeats of
    an earlier shingle in the SAME doc — high values flag boilerplate /
    template spam. One explode + hash-agg keyed by doc_id, scored as a
    single division of exact ints.

    Deliberately NOT the shuffle-free array form
    (size/array_distinct over a staged array): Catalyst's projection
    collapse re-inlines the shingle-construction expression once per
    array reference, tripling the dominant per-row cost — measured 8x
    slower than this explode+agg at sf0.1. The explode has exactly one
    consumer of the expression; docs too short for any shingle simply
    produce no rows (same contract as the array form's size > 0)."""
    from mit_6_5840_mapreduce_spark.operators.dedup import _shingles
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    staged = docs.select(
        "doc_id", tokenize(F.col("text")).alias("toks"))
    sh = staged.select("doc_id",
                       F.explode(_shingles(F.col("toks"))).alias("s"))
    total = F.count("*")
    distinct = F.count_distinct("s")
    return (
        sh.groupBy("doc_id")
        .agg(total.alias("n_shingles"),
             distinct.alias("n_distinct"),
             floor4((total - distinct) / total).alias("repetition_frac"))
    )


def decontaminate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-side decontamination — the enforcement direction of
    ``contamination_check``: every TRAIN-split document with the count
    of its shingles that also occur in ANY test-split document, and the
    keep/drop decision (kept = zero overlap). This is the filter a
    pipeline applies before training so the eval set stays untouched;
    train docs too short to produce a shingle carry no contamination
    evidence and are kept.

    Same scale shape as contamination_check mirrored: the TEST side
    collapses to a distinct-shingle-hash set (eval sets are tiny
    relative to the corpus — at 100 TB this side is broadcast-sized),
    the train side streams through one equi-join + one count-agg."""
    # split attached row-locally (split_name, r14) — same rationale as
    # contamination_check
    sh = (_doc_shingles(spark, sf_dir)
          .withColumn("split", split_name())
          .cache())
    test_hs = (sh.where(F.col("split") == "test")
               .select("hs").distinct())
    train_sh = sh.where(F.col("split") == "train").select("doc_id", "hs")
    shared = (train_sh.join(test_hs, "hs")
              .groupBy("doc_id").agg(F.count("*").alias("n_shared")))
    train_docs = (doc_split(spark, sf_dir)
                  .where(F.col("split") == "train").select("doc_id"))
    n_shared = F.coalesce("n_shared", F.lit(0)).cast("bigint")
    return (
        train_docs.join(shared, "doc_id", "left")
        .select("doc_id", n_shared.alias("n_shared"),
                (n_shared == 0).cast("int").alias("kept"))
    )


MIN_BIGRAM_COUNT = 5


def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ratio collocations over lowercased letter tokens: bigrams
    with count >= MIN_BIGRAM_COUNT scored by
    p(xy) / (p(x) p(y)) = (c_xy/N_bi) / ((c_x/N_uni)(c_y/N_uni)).
    The arithmetic is a fixed-order chain of IEEE double mult/div on
    exact BIGINT counts — both engines produce the identical double, so
    floor4 cannot diverge."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    # tokenize the corpus ONCE: the staged token arrays are persisted
    # (memory-and-disk, so the cache degrades gracefully at scale) and
    # BOTH n-gram orders read the materialized arrays — previously the
    # unigram pass re-ran the full scan + tokenize
    toks = docs.select(
        "doc_id", tokenize(F.lower(F.col("text"))).alias("toks")).persist()
    bigrams = (
        toks.where(F.size("toks") >= 2)
        .select(F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i).alias("w1"),
                F.element_at(F.col("toks"), i + 1).alias("w2")))).alias("b"))
        .select("b.w1", "b.w2")
    )
    uni = toks.select(F.explode("toks").alias("w"))
    # totals come from summing the ALREADY-AGGREGATED count tables (a
    # vocabulary-sized scan), not extra full-corpus count() passes —
    # one tokenize pass total, one cache read per n-gram order
    c_uni = uni.groupBy("w").agg(F.count("*").alias("c")).cache()
    c_bi_all = (bigrams.groupBy("w1", "w2")
                .agg(F.count("*").alias("c_xy")).cache())
    # BOTH scalar totals in ONE fused job (a cross join of two 1-row
    # aggregates): one collect instead of two sequential driver
    # round-trips — the single-DAG form of VERDICT r3 item 5. sum()
    # over an empty aggregate is NULL -> 0 (empty corpus yields zero
    # bigram rows, so the ratio below never evaluates).
    totals = (c_uni.agg(F.sum("c").alias("nu"))
              .crossJoin(c_bi_all.agg(F.sum("c_xy").alias("nb")))
              .collect()[0])
    n_uni = totals.nu or 0
    n_bi = totals.nb or 0
    # both count tables are materialized by the fused collect above; the
    # staged token arrays are no longer needed downstream
    toks.unpersist()
    c_bi = c_bi_all.where(F.col("c_xy") >= MIN_BIGRAM_COUNT)
    cx = c_uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    cy = c_uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    # fixed-order double chain: ((c_xy * nu) * nu) / ((nb * c_x) * c_y)
    ratio = ((F.col("c_xy").cast("double") * n_uni * n_uni)
             / (F.lit(float(n_bi)) * F.col("c_x") * F.col("c_y")))
    return (
        c_bi.join(cx, "w1").join(cy, "w2")
        .select("w1", "w2", "c_xy", "c_x", "c_y",
                floor4(ratio).alias("pmi_ratio"))
    )


LM_SCALE = 1_000_000    # fixed-point resolution for bigram probabilities


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram language-model score — the KenLM-style
    perplexity-filter proxy with a real corpus-trained model: each
    adjacent token pair (w1, w2) scores the MLE conditional probability
    P(w2 | w1) = c(w1 w2) / c(w1) in fixed point (c_xy * LM_SCALE div
    c_w1 — exact BIGINT), and the document's score is the mean over its
    bigram positions. Template/boilerplate text (high-probability
    transitions) scores high; incoherent or OOV-heavy text scores low —
    the signal perplexity filters threshold on, without libm log (which
    would not hash-match across engines).

    Scale shape (100 TB): one tokenize pass staged and reused for
    positions and counts (the bigram_pmi lesson), counts are two
    map-side-combined hash-aggs over the vocabulary, and the score join
    is keyed by the (already aggregated) bigram vocabulary."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", tokenize(F.lower(F.col("text"))).alias("toks")).persist()
    bg = (
        toks.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at(F.col("toks"), i).alias("w1"),
                F.element_at(F.col("toks"), i + 1).alias("w2")))).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )
    cu = (toks.select(F.explode("toks").alias("w1"))
          .groupBy("w1").agg(F.count("*").alias("c_w1")))
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    return (
        bg.join(cb, ["w1", "w2"]).join(cu, "w1")
        .groupBy("doc_id")
        # the c_xy * LM_SCALE product goes through DECIMAL(20,0) (r7):
        # BIGINT would overflow loudly once one bigram occurs ~9e12
        # times; div still returns BIGINT, so values and schema are
        # unchanged (the per-term quotient is <= LM_SCALE by c_xy <=
        # c_w1, and lm_sum <= n_bigrams * LM_SCALE fits BIGINT)
        .agg(F.count("*").alias("n_bigrams"),
             F.sum(F.expr(
                 f"(CAST(c_xy AS DECIMAL(20,0)) * {LM_SCALE}) div c_w1"))
             .alias("lm_sum"))
        .select("doc_id", "n_bigrams", "lm_sum",
                floor4(F.col("lm_sum")
                       / (F.col("n_bigrams") * LM_SCALE))
                .alias("avg_prob"))
    )


QUERIES = {
    "contamination_check": contamination_check,
    "decontaminate_split": decontaminate_split,
    "doc_repetition": doc_repetition,
    "bigram_pmi": bigram_pmi,
    "doc_lm_score": doc_lm_score,
    "contamination_spans": contamination_spans,
    "decontaminate_span_scrub": decontaminate_span_scrub,
}

# Named-split oracle fragment: composes textstats' single-sourced
# bucket rule (VERDICT r13 item 1 — a third rendering of the md5
# formula previously lived here)
_SPLIT_SQL = f"""
        SELECT doc_id,
               CASE WHEN b < {TRAIN_PCT} THEN 'train'
                    WHEN b < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, {split_bucket_sql()} AS b
              FROM documents)
"""

# Oracle for contamination_spans — also embedded verbatim by the
# decontaminate_span_scrub oracle (the cut stage consumes the quotes)
_CONTAM_SPANS_SQL = rf"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'),
                               t -> t <> '') AS toks
            FROM documents
        ),
        bands AS MATERIALIZED (
            {span_wins_sql("toks")}
        ){cap_bucket_sql("hw", "b.doc_id, b.pos, b.hw", SPAN_OCC_CAP)},
        split AS ({_SPLIT_SQL}),
        tw AS (SELECT k.doc_id, pos, hw FROM kb k
               JOIN split USING (doc_id) WHERE split = 'test'),
        rw AS (SELECT k.doc_id, pos, hw FROM kb k
               JOIN split USING (doc_id) WHERE split = 'train'),
        hits AS (
            SELECT tw.doc_id AS test_doc_id, rw.doc_id AS train_doc_id,
                   tw.pos AS pos_t, rw.pos AS pos_r,
                   tw.pos - rw.pos AS diag
            FROM tw JOIN rw ON tw.hw = rw.hw
        ),
        runs AS (
            SELECT test_doc_id, train_doc_id, diag, pos_t, pos_r,
                   pos_t - row_number() OVER (
                       PARTITION BY test_doc_id, train_doc_id, diag
                       ORDER BY pos_t) AS grp
            FROM hits
        )
        SELECT test_doc_id, train_doc_id,
               min(pos_t) AS start_test, min(pos_r) AS start_train,
               CAST(count(*) + {SPAN_TOKENS} - 1 AS BIGINT)
                   AS span_tokens
        FROM runs GROUP BY test_doc_id, train_doc_id, diag, grp
    """

ORACLES = {
    "contamination_spans": _CONTAM_SPANS_SQL,
    "decontaminate_span_scrub": rf"""
        WITH contam AS MATERIALIZED ({_CONTAM_SPANS_SQL}),
        cuts AS (
            SELECT DISTINCT train_doc_id AS doc_id,
                   unnest(range(start_train, start_train + span_tokens))
                       AS pos
            FROM contam
        ),
        split2 AS ({_SPLIT_SQL}),
        dtoks AS (
            SELECT d.doc_id,
                   list_filter(regexp_split_to_array(text, '[^\p{{L}}]+'),
                               t -> t <> '') AS toks
            FROM documents d JOIN split2 USING (doc_id)
            WHERE split = 'train'
        ),
        ptoks AS (
            {token_rows_sql("dtoks")}
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.word
            FROM ptoks t
            WHERE NOT EXISTS (SELECT 1 FROM cuts c
                              WHERE c.doc_id = t.doc_id
                                AND c.pos = t.pos)
        ),
        kept_agg AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(word, ' ' ORDER BY pos) AS scrubbed_text
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
               CAST(len(d.toks) - coalesce(n_kept, 0) AS BIGINT) AS n_cut,
               CASE WHEN len(d.toks) > 0
                    THEN floor((len(d.toks) - coalesce(n_kept, 0))
                               / len(d.toks)::DOUBLE * 10000) / 10000
                    ELSE 0.0 END AS cut_frac,
               coalesce(scrubbed_text, '') AS scrubbed_text
        FROM dtoks d LEFT JOIN kept_agg USING (doc_id)
    """,
    "doc_repetition": rf"""
        SELECT doc_id,
               len(sh) AS n_shingles,
               len(list_distinct(sh)) AS n_distinct,
               floor((len(sh) - len(list_distinct(sh)))
                     / len(sh)::DOUBLE * 10000) / 10000 AS repetition_frac
        FROM (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(
                                 range(1, len(toks) - 1),
                                 i -> concat_ws(' ', toks[i], toks[i+1],
                                                toks[i+2]))
                        ELSE [] END AS sh
            FROM (SELECT doc_id,
                         list_filter(
                             regexp_split_to_array(text, '[^\p{{L}}]+'),
                             t -> t <> '') AS toks
                  FROM documents)
        )
        WHERE len(sh) > 0
    """,
    "contamination_check": f"""
        WITH sh AS ({_DUCK_SHINGLES}),
        split AS ({_SPLIT_SQL}),
        tagged AS (SELECT sh.doc_id, sh.shingle, split.split
                   FROM sh JOIN split USING (doc_id)),
        train_sh AS (SELECT DISTINCT shingle FROM tagged
                     WHERE split = 'train'),
        test_sh AS (SELECT doc_id, shingle FROM tagged
                    WHERE split = 'test'),
        totals AS (SELECT doc_id, count(*) AS n_shingles
                   FROM test_sh GROUP BY doc_id),
        shared AS (SELECT doc_id, count(*) AS n_shared
                   FROM test_sh JOIN train_sh USING (shingle)
                   GROUP BY doc_id)
        SELECT doc_id, n_shingles,
               coalesce(n_shared, 0) AS n_shared,
               floor(coalesce(n_shared, 0) / n_shingles::DOUBLE * 10000)
                   / 10000 AS contaminated_frac
        FROM totals LEFT JOIN shared USING (doc_id)
    """,
    "decontaminate_split": f"""
        WITH sh AS ({_DUCK_SHINGLES}),
        split AS ({_SPLIT_SQL}),
        tagged AS (SELECT sh.doc_id, sh.shingle, split.split
                   FROM sh JOIN split USING (doc_id)),
        test_sh AS (SELECT DISTINCT shingle FROM tagged
                    WHERE split = 'test'),
        train_sh AS (SELECT doc_id, shingle FROM tagged
                     WHERE split = 'train'),
        shared AS (SELECT doc_id, count(*) AS n_shared
                   FROM train_sh JOIN test_sh USING (shingle)
                   GROUP BY doc_id)
        SELECT s.doc_id,
               coalesce(n_shared, 0) AS n_shared,
               CAST(coalesce(n_shared, 0) = 0 AS INT) AS kept
        FROM split s LEFT JOIN shared USING (doc_id)
        WHERE s.split = 'train'
    """,
    "bigram_pmi": rf"""
        WITH dtoks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^\p{{L}}]+'),
                               t -> t <> '') AS toks
            FROM documents
        ),
        tok AS ({token_rows_sql("dtoks")}),
        bi AS (
            SELECT a.word AS w1, b.word AS w2
            FROM tok a
            JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        ),
        c_uni AS (SELECT word AS w, count(*) AS c FROM tok GROUP BY word),
        n_uni AS (SELECT count(*) AS nu FROM tok),
        n_bi AS (SELECT count(*) AS nb FROM bi),
        c_bi AS (
            SELECT w1, w2, count(*) AS c_xy
            FROM bi GROUP BY w1, w2
            HAVING count(*) >= {MIN_BIGRAM_COUNT}
        )
        SELECT w1, w2, c_xy,
               CAST(cx.c AS BIGINT) AS c_x,
               CAST(cy.c AS BIGINT) AS c_y,
               floor(((c_xy::DOUBLE * nu) * nu)
                     / ((nb::DOUBLE * cx.c) * cy.c) * 10000) / 10000
                   AS pmi_ratio
        FROM c_bi
        JOIN c_uni cx ON cx.w = w1
        JOIN c_uni cy ON cy.w = w2
        CROSS JOIN n_uni CROSS JOIN n_bi
    """,
}

ORACLES["doc_lm_score"] = rf"""
        WITH staged AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text),
                                                     '[^\p{{L}}]+'),
                               t -> t <> '') AS toks
            FROM documents
        ),
        tok AS ({token_rows_sql("staged")}),
        bg AS (
            SELECT a.doc_id, a.word AS w1, b.word AS w2
            FROM tok a
            JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        ),
        cu AS (SELECT word AS w1, count(*) AS c_w1 FROM tok GROUP BY word),
        cb AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY w1, w2)
        SELECT doc_id, count(*) AS n_bigrams,
               CAST(sum((CAST(c_xy AS HUGEINT) * {LM_SCALE}) // c_w1)
                    AS BIGINT) AS lm_sum,
               floor(CAST(sum((CAST(c_xy AS HUGEINT) * {LM_SCALE}) // c_w1)
                          AS BIGINT)
                     / (count(*) * {LM_SCALE})::DOUBLE * 10000) / 10000
                   AS avg_prob
        FROM bg
        JOIN cb USING (w1, w2)
        JOIN cu USING (w1)
        GROUP BY doc_id
"""


# Count-min sketch shape: 4 independent md5-salted rows x 512 columns.
# Items are word BIGRAMS: the synthetic corpus has only ~31 distinct
# unigrams (collision-free in any reasonable sketch) but ~900 distinct
# bigrams, so the gate corpus produces REAL CMS collisions and the
# overestimate column carries signal instead of constant zeros.
CMS_ROWS = 4
CMS_WIDTH = 512
CMS_TOPK = 20


def _cms_col(r, item):
    """Column index of `item` in sketch row `r` — the md5-salted hash
    both engines compute bit-identically (functions/hashing.py)."""
    from mit_6_5840_mapreduce_spark.functions.hashing import md5_int32
    return md5_int32(
        F.concat(F.lit("cms"), r.cast("string"), F.lit(":"), item)
    ) % CMS_WIDTH


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through a count-min sketch, with exact error
    accounting: build a 4x512 CMS over the corpus word-bigram stream,
    then report — for the CMS_TOPK most frequent bigrams — the exact
    count, the CMS estimate (min over the 4 salted rows), and the
    guaranteed non-negative overestimate. Deterministic md5 row hashes
    make the sketch reproducible bit-for-bit in the DuckDB oracle, so
    the gate value-checks the sketch itself, not just the final
    ranking.

    Scale (100 TB): the only corpus-sized work is ONE bigram hash
    aggregate with map-side partial aggregation; the sketch here is
    built from the aggregated vocabulary because this gate needs the
    EXACT counts anyway for error accounting. When the item domain
    explodes (URLs, n-grams, user ids) and the exact table no longer
    fits, the sketch must be built WITHOUT it — that direct one-pass
    form (hash every occurrence straight into the cells) is
    ``heavy_hitters_cms_direct``, certified cell-identical to this
    build. Probing joins the 20 candidates to the broadcast sketch;
    nothing corpus-sized shuffles twice.
    """
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        tokenize(F.lower(F.col("text"))).alias("toks"))
    items = (
        toks.where(F.size("toks") >= 2)
        .select(F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i),
                F.element_at(F.col("toks"), i + 1)))).alias("item")))
    item_counts = items.groupBy("item").agg(
        F.count("*").alias("exact_count"))
    rows_ = F.explode(
        F.array(*[F.lit(r) for r in range(CMS_ROWS)])).alias("r")
    hashed = (
        item_counts.select("item", "exact_count", rows_)
        .withColumn("col", _cms_col(F.col("r"), F.col("item"))))
    sketch = hashed.groupBy("r", "col").agg(
        F.sum("exact_count").alias("cell"))
    top = (item_counts
           .orderBy(F.desc("exact_count"), F.asc("item"))
           .limit(CMS_TOPK))
    probe = (
        top.select("item", "exact_count", rows_)
        .withColumn("col", _cms_col(F.col("r"), F.col("item"))))
    est = (
        probe.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("item")
        .agg(F.max("exact_count").alias("exact_count"),
             F.min("cell").alias("cms_estimate")))
    return est.select(
        "item", "exact_count", "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count"))
            .alias("overestimate"))


QUERIES["heavy_hitters_cms"] = heavy_hitters_cms


def heavy_hitters_cms_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direct-build count-min sketch — the form that survives item-domain
    explosion: hash every bigram occurrence straight into the 4x512
    cells with ONE corpus-pass aggregate (map-side partial aggregation
    into at most 2,048 groups), never materializing an exact per-item
    count table. When the domain is URLs / n-grams / user ids at 100 TB,
    the exact table in ``heavy_hitters_cms`` no longer fits; this build
    costs the same single shuffle regardless of domain size.

    Returns the populated sketch cells (r, col, cell) so the gate
    certifies bit-equality of the ENTIRE sketch against the oracle —
    and, by summation associativity, against the vocabulary-built
    sketch in ``heavy_hitters_cms`` (pinned by tests/test_sketches.py).
    """
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        tokenize(F.lower(F.col("text"))).alias("toks"))
    items = (
        toks.where(F.size("toks") >= 2)
        .select(F.explode(F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("toks"), i),
                F.element_at(F.col("toks"), i + 1)))).alias("item")))
    rows_ = F.explode(
        F.array(*[F.lit(r) for r in range(CMS_ROWS)])).alias("r")
    return (
        items.select("item", rows_)
        .select("r", _cms_col(F.col("r"), F.col("item")).alias("col"))
        .groupBy("r", "col")
        .agg(F.count("*").alias("cell")))


QUERIES["heavy_hitters_cms_direct"] = heavy_hitters_cms_direct

ORACLES["heavy_hitters_cms_direct"] = rf"""
        WITH toks AS (
            SELECT list_filter(
                       regexp_split_to_array(lower(text), '[^\p{{L}}]+'),
                       x -> x <> '') AS ts
            FROM documents
        ),
        items AS (
            SELECT ts[i] || ' ' || ts[i + 1] AS item
            FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks)
        ),
        rows_ AS (SELECT unnest(range(0, {CMS_ROWS})) AS r)
        SELECT r,
               CAST(concat('0x', substring(md5(concat('cms',
                    CAST(r AS VARCHAR), ':', item)), 1, 8))
                    AS BIGINT) % {CMS_WIDTH} AS col,
               count(*) AS cell
        FROM items CROSS JOIN rows_
        GROUP BY 1, 2
"""

ORACLES["heavy_hitters_cms"] = rf"""
        WITH toks AS (
            SELECT list_filter(
                       regexp_split_to_array(lower(text), '[^\p{{L}}]+'),
                       x -> x <> '') AS ts
            FROM documents
        ),
        items AS (
            SELECT ts[i] || ' ' || ts[i + 1] AS item
            FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks)
        ),
        item_counts AS (
            SELECT item, count(*) AS exact_count FROM items GROUP BY item
        ),
        rows_ AS (SELECT unnest(range(0, {CMS_ROWS})) AS r),
        hashed AS (
            SELECT item, exact_count, r,
                   CAST(concat('0x', substring(md5(concat('cms',
                        CAST(r AS VARCHAR), ':', item)), 1, 8))
                        AS BIGINT) % {CMS_WIDTH} AS col
            FROM item_counts CROSS JOIN rows_
        ),
        sketch AS (
            SELECT r, col, sum(exact_count) AS cell
            FROM hashed GROUP BY r, col
        ),
        top AS (
            SELECT item, exact_count FROM item_counts
            ORDER BY exact_count DESC, item ASC LIMIT {CMS_TOPK}
        )
        SELECT t.item,
               max(t.exact_count) AS exact_count,
               CAST(min(s.cell) AS BIGINT) AS cms_estimate,
               CAST(min(s.cell) - max(t.exact_count) AS BIGINT)
                   AS overestimate
        FROM top t
        CROSS JOIN rows_
        JOIN sketch s
          ON s.r = rows_.r
         AND s.col = CAST(concat('0x', substring(md5(concat('cms',
                          CAST(rows_.r AS VARCHAR), ':', t.item)), 1, 8))
                          AS BIGINT) % {CMS_WIDTH}
        GROUP BY t.item
"""
