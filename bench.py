"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full physical
execution, no driver-side result transfer skewing the number).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mit_6_5840_mapreduce_spark.operators import registry
from mit_6_5840_mapreduce_spark.session import get_spark

HEADLINE = (
    "mr_wc",
    "mr_indexer",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "top3_orders_per_customer",
    "user_event_pivot",
    "sessionize",
    "events_hourly",
    "asof_join_orders",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_groups",
    "embedding_topk",
    "embedding_neardup_lsh",
    "ivf_search",
    "doc_chunks",
    "lang_id",
    "tfidf_top_terms",
    "q7_nation_volume",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    queries, _ = registry()

    spark = get_spark("bench")
    # JVM/codegen warm-up so the first measured query isn't paying JIT
    # cost (a NON-headline query, so no measured entry gets extra warming)
    queries["q4_order_priority"](spark, sf_dir).write.mode(
        "overwrite").format("noop").save()

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(repeat):
            spark.catalog.clearCache()   # operators may cache() internally
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.mode("overwrite") \
                .format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
