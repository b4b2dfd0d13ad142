"""Corpus scrubbing & audit operators for an LLM-data pipeline:
PII detection/redaction, URL/domain inventory, the curation funnel, and
token-length profiling.

All detection runs JVM-side (``regexp_count`` / ``regexp_extract_all`` /
``regexp_replace`` inside whole-stage codegen — no Python in the hot
path), with patterns restricted to the syntax subset where Java regex
and RE2 (DuckDB) agree, so every operator is value-checked against the
DuckDB oracle.

The synthetic corpus carries no organic PII, so the scrub operators run
over an AUGMENTED column: a deterministic doc_id-keyed suffix plants an
email on every ``doc_id % 3 == 0`` document and an IP + URL on every
``doc_id % 3 == 1`` document (the same construction-from-testdata
pattern the multimodal operators use for payloads). Detection logic is
applied to the full text either way, so organic matches would count too.

Scale: every operator here is a narrow projection + one hash-agg —
shuffle only on the (tiny) aggregate keys; redaction never leaves the
scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.sources.tables import load_table

# Patterns valid (and identical in meaning) in both Java regex and RE2.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
URL_RE = r"https?://[^\s]+"
DOMAIN_RE = r"https?://([^/\s]+)"


def _augmented_text() -> F.Column:
    """documents.text plus the deterministic planted-PII suffix."""
    did = F.col("doc_id")
    return (
        F.when(did % 3 == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        did.cast("string"), F.lit("@mail-"),
                        F.col("source"), F.lit(".example.com now")))
        .when(did % 3 == 1,
              F.concat(F.col("text"), F.lit(" from 10."),
                       (did % 200).cast("string"), F.lit("."),
                       (did % 250).cast("string"),
                       F.lit(".7 via https://"), F.col("source"),
                       F.lit(".example.org/p/"), did.cast("string")))
        .otherwise(F.col("text"))
    )


# exact SQL mirror of _augmented_text for the DuckDB oracles
_AUG_SQL = """
    CASE WHEN doc_id % 3 = 0
             THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail-' || source || '.example.com now'
         WHEN doc_id % 3 = 1
             THEN text || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                  || '.' || CAST(doc_id % 250 AS VARCHAR)
                  || '.7 via https://' || source || '.example.org/p/'
                  || CAST(doc_id AS VARCHAR)
         ELSE text END
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII audit + redaction: counts of emails / IPv4s /
    URLs found in the text and the length after replacing each class
    with a placeholder token (emails first, then URLs, then bare IPs —
    so an IP inside an already-redacted URL isn't double-counted)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = _augmented_text()
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"),
            URL_RE, "<URL>"),
        IPV4_RE, "<IP>")
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(EMAIL_RE)).cast("bigint")
        .alias("n_emails"),
        F.regexp_count(raw, F.lit(URL_RE)).cast("bigint").alias("n_urls"),
        F.regexp_count(raw, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        (F.regexp_count(raw, F.lit(EMAIL_RE))
         + F.regexp_count(raw, F.lit(URL_RE))
         + F.regexp_count(raw, F.lit(IPV4_RE)) == 0).cast("int")
        .alias("is_clean"),
    )


def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level URL inventory: explode every URL in the corpus,
    parse its host, and aggregate link count + distinct linking docs —
    the per-domain view a crawl-curation pipeline filters on."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(_augmented_text(),
                                       F.lit(URL_RE), 0)).alias("url"))
    return (
        urls.select("doc_id",
                    F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_urls"),
             F.countDistinct("doc_id").alias("n_docs"))
    )


MIN_CHARS = 100
MIN_QUALITY = 0.5
FUNNEL_STAGES = ("all", "min_length", "quality", "exact_dedup")


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-pipeline audit: survivor count after each successive
    filter stage (C4/Gopher-style), in one corpus pass — each stage is
    a conditional count over the previous stages' conjunction, and the
    dedup stage counts distinct content hashes among survivors."""
    from mit_6_5840_mapreduce_spark.operators.textstats import doc_quality
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dq = doc_quality(spark, sf_dir).select("doc_id", "n_chars",
                                           "quality_score")
    flags = docs.join(dq, "doc_id").select(
        (F.col("n_chars") >= MIN_CHARS).alias("c_len"),
        (F.col("quality_score") >= MIN_QUALITY).alias("c_q"),
        F.md5("text").alias("h"),
    )
    agg = flags.agg(
        F.count("*").alias("n0"),
        F.count_if(F.col("c_len")).alias("n1"),
        F.count_if(F.col("c_len") & F.col("c_q")).alias("n2"),
        F.count_distinct(
            F.when(F.col("c_len") & F.col("c_q"), F.col("h"))).alias("n3"),
    )
    return agg.selectExpr(
        f"stack(4, 0, '{FUNNEL_STAGES[0]}', n0, "
        f"1, '{FUNNEL_STAGES[1]}', n1, "
        f"2, '{FUNNEL_STAGES[2]}', n2, "
        f"3, '{FUNNEL_STAGES[3]}', n3) AS (stage_idx, stage, n_docs)")


def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two histogram of per-document token counts (the shape
    stat a pretraining mix is balanced on). Bucket = floor(log2(n)),
    exact for integer inputs away from the (exactly representable)
    power-of-two boundaries."""
    from mit_6_5840_mapreduce_spark.operators.textstats import doc_quality
    dq = doc_quality(spark, sf_dir).select("doc_id", "n_tokens")
    bucket = F.when(F.col("n_tokens") > 0,
                    F.floor(F.log2("n_tokens"))).otherwise(F.lit(-1)) \
        .cast("int")
    return (
        dq.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .select("bucket",
                F.expr("CAST(CASE WHEN bucket >= 0 "
                       "THEN shiftleft(1L, bucket) ELSE 0 END AS BIGINT)")
                .alias("bucket_lo"),
                F.expr("CAST(CASE WHEN bucket >= 0 "
                       "THEN shiftleft(1L, bucket + 1) - 1 ELSE 0 END "
                       "AS BIGINT)").alias("bucket_hi"),
                "n_docs")
    )


QUERIES = {
    "pii_scrub": pii_scrub,
    "url_domain_stats": url_domain_stats,
    "curation_funnel": curation_funnel,
    "token_length_histogram": token_length_histogram,
}


def _oracles() -> dict[str, str]:
    from mit_6_5840_mapreduce_spark.operators.textstats import (
        ORACLES as TS_ORACLES,
    )
    # RE2 string literals for the shared patterns ('' quoting only)
    email, url, ipv4, domain = (p.replace("'", "''")
                                for p in (EMAIL_RE, URL_RE, IPV4_RE,
                                          DOMAIN_RE))
    return {
        "pii_scrub": f"""
            SELECT doc_id,
                   len(regexp_extract_all(raw, '{email}'))::BIGINT
                       AS n_emails,
                   len(regexp_extract_all(raw, '{url}'))::BIGINT AS n_urls,
                   len(regexp_extract_all(raw, '{ipv4}'))::BIGINT AS n_ips,
                   length(regexp_replace(regexp_replace(regexp_replace(
                       raw, '{email}', '<EMAIL>', 'g'),
                       '{url}', '<URL>', 'g'),
                       '{ipv4}', '<IP>', 'g'))::BIGINT AS redacted_len,
                   CASE WHEN len(regexp_extract_all(raw, '{email}'))
                             + len(regexp_extract_all(raw, '{url}'))
                             + len(regexp_extract_all(raw, '{ipv4}')) = 0
                        THEN 1 ELSE 0 END AS is_clean
            FROM (SELECT doc_id, {_AUG_SQL} AS raw FROM documents)
        """,
        "url_domain_stats": f"""
            SELECT regexp_extract(url, '{domain}', 1) AS domain,
                   count(*) AS n_urls,
                   count(DISTINCT doc_id) AS n_docs
            FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(raw, '{url}')) AS url
                FROM (SELECT doc_id, {_AUG_SQL} AS raw FROM documents)
            )
            GROUP BY 1
        """,
        "curation_funnel": f"""
            WITH dq AS ({TS_ORACLES["doc_quality"]}),
            flags AS (
                SELECT d.doc_id,
                       dq.n_chars >= {MIN_CHARS} AS c_len,
                       dq.quality_score >= {MIN_QUALITY} AS c_q,
                       md5(d.text) AS h
                FROM documents d JOIN dq USING (doc_id)
            ),
            agg AS (
                SELECT count(*) AS n0,
                       count(*) FILTER (WHERE c_len) AS n1,
                       count(*) FILTER (WHERE c_len AND c_q) AS n2,
                       count(DISTINCT CASE WHEN c_len AND c_q THEN h END)
                           AS n3
                FROM flags
            )
            SELECT 0 AS stage_idx, '{FUNNEL_STAGES[0]}' AS stage,
                   n0 AS n_docs FROM agg
            UNION ALL SELECT 1, '{FUNNEL_STAGES[1]}', n1 FROM agg
            UNION ALL SELECT 2, '{FUNNEL_STAGES[2]}', n2 FROM agg
            UNION ALL SELECT 3, '{FUNNEL_STAGES[3]}', n3 FROM agg
        """,
        "token_length_histogram": f"""
            WITH dq AS ({TS_ORACLES["doc_quality"]}),
            b AS (
                SELECT CASE WHEN n_tokens > 0
                            THEN CAST(floor(log2(n_tokens)) AS INT)
                            ELSE -1 END AS bucket
                FROM dq
            )
            SELECT bucket,
                   CASE WHEN bucket >= 0 THEN (1::BIGINT << bucket)
                        ELSE 0 END AS bucket_lo,
                   CASE WHEN bucket >= 0
                        THEN (1::BIGINT << (bucket + 1)) - 1
                        ELSE 0 END AS bucket_hi,
                   count(*) AS n_docs
            FROM b
            GROUP BY bucket
        """,
    }


ORACLES = _oracles()
