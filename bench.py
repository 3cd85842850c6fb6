"""Benchmark harness: runs the headline query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed via the noop sink (computes every row,
no collect/serialization overhead), timed individually after a JVM
warm-up query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zikeiretsu_rs_spark import suite  # noqa: E402
from zikeiretsu_rs_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "ts_range_scan",
    "ts_head_limit",
    "ts_eq_day",
    "agg_time_bucket_1h",
    "sessionize_30m",
    "top_users_by_value",
    "tpch_q1",
    "tpch_q6",
    "revenue_by_nation",
    "semi_join_priority",
    "asof_purchase_click",
    "moving_avg_1h",
    "tpch_q3",
    "latest_event_per_user",
    "pivot_user_event_counts",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_scaled",  # the guarded 100 TB formulation
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
    "text_scrub",
    "doc_fingerprint",
    "multimodal_decode",
    "multimodal_png",
    "doc_repetition",
    "decontaminate_eval",
    "stratified_sample",
]
# embedding_neardup_lsh is deliberately NOT a headline query: the
# fixture corpus is near-uniform and the 0.40 mining threshold makes
# ~half of all pairs LSH candidates by construction (cos 0.4 = 66°,
# P(plane agrees) = 0.63) — a recall-stress case, not a throughput
# case. Its correctness/recall invariants run in the driver gate
# (embedding_neardup_lsh_check); on a real near-dup workload
# (threshold >= 0.9) the same operator prunes candidates massively.


def run_query(spark, name: str, sf_dir: str) -> float:
    df = suite.QUERIES[name](spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(app_name="zikeiretsu-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM/codegen/file-listing
    suite.load(spark, sf_dir, "lineitem").count()
    suite.events_ts_long(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run_query(spark, name, sf_dir), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
