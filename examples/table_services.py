"""Table services walkthrough: time travel, merge, sketches, provenance.

    python examples/table_services.py [sf_dir]

The ingest-side services around the curation pipeline (default data
/root/testdata/sf0.001):

1. versioned parquet table: write -> merge -> time travel -> history
2. mergeable HLL sketch store: two appends, one merged cardinality read
3. curation provenance: per-doc drop-stage labels in one action
"""

from __future__ import annotations

import os
import sys
import tempfile

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from legend_community_delta_spark.operators.curation import (
        curate_provenance)
    from legend_community_delta_spark.operators.sketches import (
        read_sketch_estimates, write_sketch_store)
    from legend_community_delta_spark.sources.versioned import VersionedTable

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scratch = tempfile.mkdtemp(prefix="legend_table_services_")

    # 1. versioned table: snapshot isolation + row-level merge, no Delta
    print("== versioned table ==")
    tbl = VersionedTable(spark, f"{scratch}/docs_tbl")
    tbl.write(docs.select("doc_id", "text", "source"))
    fixes = docs.where("doc_id < 3").select(
        "doc_id", F.upper("text").alias("text"), "source")
    tbl.merge(fixes, keys=["doc_id"])
    print("latest version:", tbl.latest_version())
    before = tbl.read(0).where("doc_id = 0").first()["text"][:40]
    after = tbl.read().where("doc_id = 0").first()["text"][:40]
    print("v0 text:", before)
    print("v1 text:", after)
    tbl.history().show(truncate=False)

    # 2. sketch store: cardinality via kilobyte merges, no rescan
    print("== sketch store ==")
    store = f"{scratch}/sketches"
    write_sketch_store(docs.where("doc_id % 2 = 0"), store, "text",
                       ["source"], shard_col=F.lit("batch_even"))
    write_sketch_store(docs.where("doc_id % 2 = 1"), store, "text",
                       ["source"], shard_col=F.lit("batch_odd"))
    read_sketch_estimates(spark, store, ["source"]) \
        .orderBy("source").show(5)

    # 3. provenance: why each doc survived or died, in one action
    print("== curation provenance ==")
    prov = curate_provenance(docs, min_quality=0.3, near_dup_threshold=0.2,
                             max_tokens=2_000)
    prov.groupBy("drop_stage").count().orderBy("drop_stage").show()

    spark.stop()


if __name__ == "__main__":
    main()
