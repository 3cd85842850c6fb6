"""The recurring-crawl dedup story, end to end: seed a corpus, build
the lake-resident prefix index ONCE, then dedup arriving crawl batches
against it three ways — one-shot batch, stored-index batch, and
per-micro-batch streaming — all three produce byte-identical verdicts
because every candidate generator is complete (prefix-filter theorem)
and the re-score is exact Jaccard.

Run:  python examples/incremental_crawl_dedup.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zikeiretsu_rs_spark.operators import dedup, urls
from zikeiretsu_rs_spark.session import get_spark
from zikeiretsu_rs_spark.streaming.neardup import IncrementalDedupIndex


def main() -> None:
    spark = get_spark(app_name="incremental-crawl-dedup", cpus=4,
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spark writes sorted parquet blocks into the lake"),
            (3, "an unrelated seed document about nothing at all"),
        ],
        ["doc_id", "text"],
    )
    crawl1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),   # dup of 1
            (11, "entirely fresh content from the first crawl"),
            (12, "entirely fresh content from the first crawl"),   # dup of 11
        ],
        ["doc_id", "text"],
    )
    crawl2 = spark.createDataFrame(
        [
            (20, "spark writes sorted parquet blocks into the lake"),  # dup of 2
            (21, "entirely fresh content from the first crawl"),       # dup of 11
            (22, "second-crawl content sharing nothing with anyone"),
        ],
        ["doc_id", "text"],
    )

    # --- 1. one-shot batch rule (everything in memory) ------------------
    union = (
        corpus.withColumn("is_new", F.lit(False))
        .unionByName(crawl1.withColumn("is_new", F.lit(True)))
        .unionByName(crawl2.withColumn("is_new", F.lit(True)))
    )
    print("one-shot incremental_dedup:")
    dedup.incremental_dedup(
        union, "doc_id", "text", "is_new", n=3, threshold=0.5
    ).orderBy("doc_id").show()

    with tempfile.TemporaryDirectory() as tmp:
        # --- 2. stored-index batch (build once, probe per crawl) -------
        index_path = os.path.join(tmp, "prefix_index")
        dedup.write_prefix_index(
            corpus, index_path, "doc_id", "text", n=3, threshold=0.5
        )
        flagged = union  # same fixture; corpus side read from the index
        print("incremental_dedup_lake (corpus side = stored index):")
        dedup.incremental_dedup_lake(
            spark, index_path, flagged, "doc_id", "text", "is_new",
            n=3, threshold=0.5,
        ).orderBy("doc_id").show()

        # --- 3. streaming: one verdict per micro-batch ------------------
        idx = IncrementalDedupIndex(
            spark, os.path.join(tmp, "stream_index"), n=3, threshold=0.5
        )
        idx.build(corpus)
        for i, batch in enumerate((crawl1, crawl2), start=1):
            print(f"micro-batch {i} verdicts:")
            idx.add_batch(batch).orderBy("doc_id").show()

    # --- bonus: domain-level anti-dominance on the kept docs ------------
    kept = union.where(F.col("doc_id") < 100)
    print("domain_cap over a synthetic multi-domain URL column:")
    urls.domain_cap(
        urls.synthesize_multihost_urls(kept, "doc_id"), "doc_id", "url", cap=2
    ).orderBy("doc_id").show()

    spark.stop()


if __name__ == "__main__":
    main()
