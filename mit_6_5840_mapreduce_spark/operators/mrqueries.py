"""DataFrame forms of the reference's four data queries (SURVEY.md §2.2).

The reference computes these as (Map, Reduce) plugin pairs over whole text
files; here each is a Catalyst plan over the ``documents`` table
(doc_id BIGINT, text STRING, lang, source, n_chars):

- ``mr_wc``       — word count            (``src/mrapps/wc.go:19-40``)
- ``mr_indexer``  — inverted index        (``src/mrapps/indexer.go:20-39``)
- ``mr_docmeta``  — per-key metadata agg  (``src/mrapps/nocrash.go:26-47``,
                    the crash/nocrash query with fault injection removed —
                    fault tolerance is Spark's scheduler, not the query)
- ``mr_doccount`` — per-document count    (``src/mrapps/early_exit.go:19-36``)

Scale notes (100 TB): all four are single-shuffle hash aggregations with
map-side partial aggregation — strictly better than the reference's
combiner-less sort-agg (``src/mr/worker.go:170-192``). The only state that
grows with a hot key is mr_indexer's/mr_docmeta's collect_set/collect_list;
at 100 TB those would be re-keyed (word, salt) first — documented in
operators/dedup.py where the same pattern recurs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.functions.text import tokens_df
from mit_6_5840_mapreduce_spark.sources.tables import fan_out, load_table


def mr_wc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count: token = maximal Unicode-letter run, case-sensitive."""
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    return (
        tokens_df(docs)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def mr_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: per word, #distinct docs + sorted doc list.

    The reference dedups (word, doc) pairs map-side with a set
    (``src/mrapps/indexer.go:21-25``) and sorts the doc list in Reduce
    (``indexer.go:37``); ``collect_set`` + ``sort_array`` reproduces both.

    ONE shuffle (r14, guide §2.4): ``collect_set`` dedups (word, doc)
    itself — partial sets map-side, merged reduce-side — so the
    pre-``distinct()`` this used to do was a second full exchange of
    the same pairs for nothing; ``doc_count`` is the set's size. This
    is exactly the reference's map-side-set shape.
    """
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    return (
        tokens_df(docs)
        .select("word", F.col("doc_id").cast("string").alias("doc"))
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("doc")).alias("doc_set"))
        .select(
            "word",
            F.size("doc_set").cast("bigint").alias("doc_count"),
            F.concat_ws(",", "doc_set").alias("docs"),
        )
    )


def mr_docmeta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crash/nocrash query: each doc emits 4 KV rows
    ("a", doc_id) ("b", len(doc_id)) ("c", len(text)) ("d", "xyzzy");
    per key, values sorted lexicographically and space-joined
    (``src/mrapps/nocrash.go:26-47``). Go ``len(string)`` is UTF-8
    BYTES — octet_length, not length, for non-ASCII parity.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("name"), "text")
    kv = docs.select(
        F.expr(
            "stack(4, "
            " 'a', name,"
            " 'b', cast(octet_length(name) as string),"
            " 'c', cast(octet_length(text) as string),"
            " 'd', 'xyzzy') as (key, value)"
        )
    )
    return (
        kv.groupBy("key")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_list("value")))
             .alias("joined_values"))
    )


def mr_doccount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """early_exit query: per-document record count (1 absent failures)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("doc_id").agg(F.count("*").alias("cnt"))


def mr_wc_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the MR-compat RDD layer itself (mr/api.mr_run):
    the reference's exact pipeline — flatMap mapf, FNV-hash shuffle,
    groupByKey, reducef — surfaced in the driver gate so the compat layer
    is oracle-checked, not just unit-tested. (Python row path by design;
    the DataFrame twin ``mr_wc`` is the scale path.)"""
    from mit_6_5840_mapreduce_spark.mr.api import mr_run
    from mit_6_5840_mapreduce_spark.mr.apps import wc_map, wc_reduce

    docs = load_table(spark, sf_dir, "documents") \
        .select(F.col("doc_id").cast("string"), "text")
    pairs = docs.rdd.map(lambda r: (r[0], r[1]))
    lines = mr_run(spark, wc_map, wc_reduce, pairs, n_reduce=10)
    parsed = lines.map(lambda line: line.rsplit(" ", 1)) \
                  .map(lambda kv: (kv[0], int(kv[1])))
    return spark.createDataFrame(parsed, "word STRING, cnt BIGINT")


def mr_wc_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the DECLARED-ASSOCIATIVE mr_run path (round
    8, VERDICT r7 item 8): same mapf, but the shuffle is
    reduceByKey(count_combine) with map-side combining — per-key
    executor state is O(1) partials at any corpus size, versus the
    groupByKey path's reduce-sees-all-values contract. Output is
    value-identical to ``mr_wc_rdd`` (pinned by
    tests/test_mr_associative.py) and shares ``mr_wc``'s oracle;
    registered one past the r8 50-entry window cutoff, it LEADS the
    r9 window so the driver gate certifies the combine path end to
    end (parity-green locally since r8)."""
    from mit_6_5840_mapreduce_spark.mr.api import mr_run
    from mit_6_5840_mapreduce_spark.mr.apps import count_combine, wc_map

    docs = load_table(spark, sf_dir, "documents") \
        .select(F.col("doc_id").cast("string"), "text")
    pairs = docs.rdd.map(lambda r: (r[0], r[1]))
    lines = mr_run(spark, wc_map, None, pairs, n_reduce=10,
                   combinef=count_combine)
    parsed = lines.map(lambda line: line.rsplit(" ", 1)) \
                  .map(lambda kv: (kv[0], int(kv[1])))
    return spark.createDataFrame(parsed, "word STRING, cnt BIGINT")


def mr_indexer_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index through the MR-compat RDD layer (second app
    certifying mr/api.mr_run end-to-end in the driver gate alongside
    ``mr_wc_rdd``): flatMap indexer_map, FNV-hash shuffle, groupByKey,
    indexer_reduce. Output line ``"word n doc1,doc2,..."`` parsed back
    into the same schema as the DataFrame twin ``mr_indexer``."""
    from mit_6_5840_mapreduce_spark.mr.api import mr_run
    from mit_6_5840_mapreduce_spark.mr.apps import (indexer_map,
                                                    indexer_reduce)

    docs = load_table(spark, sf_dir, "documents") \
        .select(F.col("doc_id").cast("string"), "text")
    pairs = docs.rdd.map(lambda r: (r[0], r[1]))
    lines = mr_run(spark, indexer_map, indexer_reduce, pairs, n_reduce=10)
    parsed = lines.map(lambda line: line.split(" ", 2)) \
                  .map(lambda p: (p[0], int(p[1]), p[2]))
    return spark.createDataFrame(
        parsed, "word STRING, doc_count BIGINT, docs STRING")


QUERIES = {
    "mr_wc": mr_wc,
    "mr_wc_rdd": mr_wc_rdd,
    "mr_wc_assoc": mr_wc_assoc,
    "mr_indexer": mr_indexer,
    "mr_indexer_rdd": mr_indexer_rdd,
    "mr_docmeta": mr_docmeta,
    "mr_doccount": mr_doccount,
}

_WC_ORACLE = r"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY word
"""

_INDEXER_ORACLE = r"""
        WITH tok AS (
            SELECT DISTINCT word, doc
            FROM (SELECT unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word,
                         CAST(doc_id AS VARCHAR) AS doc
                  FROM documents)
            WHERE word <> ''
        )
        SELECT word,
               count(doc) AS doc_count,
               array_to_string(list_sort(list(doc)), ',') AS docs
        FROM tok GROUP BY word
"""

ORACLES = {
    "mr_wc_rdd": _WC_ORACLE,
    "mr_wc_assoc": _WC_ORACLE,
    "mr_wc": _WC_ORACLE,
    "mr_indexer": _INDEXER_ORACLE,
    "mr_indexer_rdd": _INDEXER_ORACLE,
    "mr_docmeta": r"""
        WITH kv AS (
            SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
            UNION ALL
            SELECT 'b', CAST(strlen(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'c', CAST(strlen(text) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'd', 'xyzzy' FROM documents
        )
        SELECT key, string_agg(value, ' ' ORDER BY value) AS joined_values
        FROM kv GROUP BY key
    """,
    "mr_doccount": """
        SELECT doc_id, count(*) AS cnt FROM documents GROUP BY doc_id
    """,
}
