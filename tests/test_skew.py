"""Salted aggregation must be result-identical to the direct form."""

from __future__ import annotations

from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.functions.skew import (
    salted_collect_set,
    salted_count_distinct,
    with_salt,
)
from mit_6_5840_mapreduce_spark.functions.text import tokens_df
from mit_6_5840_mapreduce_spark.sources.tables import load_table


def _tokens(spark, sf_dir):
    # word frequencies in the corpus are Zipfian -> naturally skewed keys
    return tokens_df(load_table(spark, sf_dir, "documents"))


def test_salted_count_distinct_matches_direct(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    direct = {r.word: r.n for r in toks.groupBy("word")
              .agg(F.countDistinct("doc_id").alias("n")).collect()}
    salted = {r.word: r.n_distinct for r in
              salted_count_distinct(
                  toks.select("word", F.col("doc_id").cast("string")
                              .alias("doc")),
                  "word", "doc").collect()}
    assert direct == salted


def test_salted_collect_set_matches_direct(spark, sf_dir):
    toks = _tokens(spark, sf_dir).select(
        "word", F.col("doc_id").cast("string").alias("doc"))
    direct = {r.word: sorted(set(r.vals)) for r in toks.groupBy("word")
              .agg(F.collect_list("doc").alias("vals")).collect()}
    salted = {r.word: list(r["values"]) for r in
              salted_collect_set(toks, "word", "doc").collect()}
    assert direct == salted


def test_salt_is_deterministic_across_runs(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").select("o_orderkey")
    a = with_salt(df).collect()
    b = with_salt(df).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_salts = {r._salt for r in a}
    assert len(n_salts) > 1   # actually spreads
