"""Epoch assembly — the capstone pipeline a training run actually
executes (VERDICT r11 item 3), composing the certified curation pieces
into the output the north star names: ordered, packed, decontaminated
token sequences. Nothing in the reference implements this; it is
LLM-pipeline extension surface like ``operators/mixture.py``.

One registered query, ONE declarative plan, no driver-side
materialization between stages:

1. **mixture → resample** (``temperature_resample``): per-source
   sqrt-temperature keep rates realized as a deterministic md5-bucket
   keep/drop — the corpus never shuffles, rates ride a broadcast dim.
2. **decontaminate** (``decontaminate_span_scrub``): the quoted
   test-set passages are cut from TRAIN-split documents (span-level
   scrub — a train doc quoting one benchmark paragraph keeps
   everything else). Joining the scrub output (train docs only, by
   construction) to the resample survivors restricts the epoch to the
   training split: val/test never enter training data.
3. **pack** (``pack_sequences``' rule over the SCRUBBED token
   counts): documents concatenate per source in doc_id order;
   sequence boundaries fall every PACK_BUDGET tokens; a doc belongs
   to the sequence its first surviving token lands in. Documents
   scrubbed to zero tokens pack nothing and are dropped.
4. **shuffle** (``training_shuffle``'s rule lifted to SEQUENCES):
   the dataloader consumes sequences, not documents, so the epoch
   order randomizes (source, seq_id) units — shard = md5 bucket of
   the salted sequence key, pos = rank of an independently salted
   md5 key within the shard. No RNG, reproducible on any engine,
   cluster size, or partition layout.

Output: one row per packed training sequence — (source, seq_id,
n_docs, seq_tokens, doc_ids in packing order, shard, pos).

Scale design (100 TB): the span scrub dominates and carries its own
design (occurrence-capped self-join, docs/SCALE.md); the resample
join is broadcast; packing is ``pack_assignment`` — one prefix-sum
window per source for small sources, the two-pass sub-sharded scan
AUTO-SELECTED past PACK_HOT_DOCS in the hottest source (r14;
value-identical; measured 1.28× faster at 23M hot docs with a
growing gap, and task-bounded memory where the window form must sort
the whole source in one task — docs/SCALE.md); the per-sequence
collect_list is bounded by
PACK_BUDGET members (every packed doc holds ≥ 1 token, so at most
PACK_BUDGET docs start inside one sequence — the bounded-group
class); the shuffle stage windows over the SEQUENCE table
(corpus_tokens / PACK_BUDGET rows, ~1/256 of token positions) sharded
SHUFFLE_SHARDS ways. All arithmetic is exact BIGINT / md5, so the
DuckDB oracle (the same five stages as an unrolled CTE chain) checks
values, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_6_5840_mapreduce_spark.operators.textstats import (
    pack_assignment,
    pack_sql,
    shuffle_assignment,
    shuffle_sql,
)


def epoch_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mixture → resample → decontaminate (span scrub) → pack →
    shuffle, as one Catalyst plan (module docstring)."""
    from mit_6_5840_mapreduce_spark.operators.corpus import (
        decontaminate_span_scrub,
    )
    from mit_6_5840_mapreduce_spark.operators.mixture import (
        temperature_resample,
    )
    surv = temperature_resample(spark, sf_dir).select("doc_id", "source")
    # scrub output is the TRAIN split only (decontaminate_span_scrub's
    # contract) — the inner join both attaches the post-scrub token
    # count and drops val/test survivors from the epoch
    scrub = decontaminate_span_scrub(spark, sf_dir).select(
        "doc_id",
        (F.col("n_tokens") - F.col("n_cut")).alias("kept_tokens"))
    kept = (surv.join(scrub, "doc_id")
            .where(F.col("kept_tokens") > 0))
    # pack_sequences' rule over the SCRUBBED counts — the single-sourced
    # pack_assignment (r13, VERDICT r12 item 3), so the capstone cannot
    # drift from the operator it composes
    packed = pack_assignment(kept, "kept_tokens").select(
        "doc_id", "source", "kept_tokens", "seq_id")
    seqs = (
        packed.groupBy("source", "seq_id")
        .agg(F.count("*").alias("n_docs"),
             F.sum("kept_tokens").alias("seq_tokens"),
             # packing order inside the sequence = doc_id order; the
             # array_sort makes the concat merge-order-proof (the
             # scrub_positions recompose rule)
             F.concat_ws(",", F.transform(
                 F.array_sort(F.collect_list("doc_id")),
                 lambda d: d.cast("string"))).alias("doc_ids"))
    )
    # training_shuffle's rule lifted to SEQUENCES — the single-sourced
    # shuffle_assignment with unit key source:seq_id
    skey = F.concat(F.col("source"), F.lit(":"),
                    F.col("seq_id").cast("string"))
    return shuffle_assignment(seqs, skey, "source", "seq_id").select(
        "source", "seq_id", "n_docs", "seq_tokens", "doc_ids",
        "shard", "pos")


QUERIES = {
    # the composed CTE oracle replays all five stages independently —
    # the curation_summary discipline extended to the epoch output
    "epoch_assembly": epoch_assembly,
}


def _epoch_oracle() -> str:
    from mit_6_5840_mapreduce_spark.operators.corpus import (
        ORACLES as CORPUS_ORACLES,
    )
    from mit_6_5840_mapreduce_spark.operators.mixture import (
        ORACLES as MIX_ORACLES,
    )
    # the pack and shuffle stages render through the SAME single-sourced
    # SQL fragments as pack_sequences'/training_shuffle's own oracles
    packed = pack_sql("SELECT doc_id, source, kept_tokens FROM kept",
                      "kept_tokens")
    shuffled = shuffle_sql(
        "SELECT * FROM seqs",
        "source || ':' || CAST(seq_id AS VARCHAR)",
        "source, seq_id")
    return f"""
        WITH scrub AS MATERIALIZED (
            {CORPUS_ORACLES["decontaminate_span_scrub"]}
        ),
        surv AS ({MIX_ORACLES["temperature_resample"]}),
        kept AS (
            SELECT s.doc_id, v.source,
                   CAST(s.n_tokens - s.n_cut AS BIGINT) AS kept_tokens
            FROM scrub s JOIN surv v USING (doc_id)
            WHERE s.n_tokens - s.n_cut > 0
        ),
        packed AS (
            SELECT doc_id, source, kept_tokens, seq_id FROM ({packed})
        ),
        seqs AS (
            SELECT source, seq_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(kept_tokens) AS BIGINT) AS seq_tokens,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS doc_ids
            FROM packed GROUP BY source, seq_id
        )
        SELECT source, seq_id, n_docs, seq_tokens, doc_ids, shard, pos
        FROM ({shuffled})
    """


ORACLES: dict[str, str] = {
    "epoch_assembly": _epoch_oracle(),
}
