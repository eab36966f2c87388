"""Round-7 verification tool: run the md5-portable MinHash / SimHash /
embedding-LSH contract entries on Spark AND their demo.ORACLES DuckDB
twins at a given SF dir, compare exact row sets.  Usage:
    python tools/exp_portable.py /root/testdata/sf0.01
"""

import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
NAMES = ["minhash_pairs", "simhash_pairs", "embedding_dedup_pairs"]


def main():
    from pyspark.sql import SparkSession
    from legend_community_delta_spark import demo

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in demo._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    ok = True
    for name in NAMES:
        srows = sorted(map(tuple, demo.QUERIES[name](spark, SF).collect()))
        orows = sorted(map(tuple,
                           con.execute(demo.ORACLES[name]).fetchall()))
        match = srows == orows
        ok &= match
        print(f"{name}: spark={len(srows)} duck={len(orows)} MATCH={match}")
        if not match:
            sset, oset = set(srows), set(orows)
            print("  only-spark:", list(sset - oset)[:5])
            print("  only-duck:", list(oset - sset)[:5])
    print("ALL MATCH" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
