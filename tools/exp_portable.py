"""Round-7 experiment: verify the md5-portable MinHash / SimHash /
embedding-LSH pair sets match DuckDB exactly before wiring the oracles
into demo.py."""

import random
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

NUM_HASHES, BANDS, SHINGLE_K, MH_THRESH, MAX_BUCKET = 16, 8, 5, 0.3, 200
R = NUM_HASHES // BANDS


def minhash_oracle() -> str:
    mins = ",\n    ".join(
        f"min(substr(md5('mh{i}:' || s), 1, 16)) AS m{i}"
        for i in range(NUM_HASHES))
    banded = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(f"m{b * R + j}" for j in range(R))
        + ") AS bucket FROM sig"
        for b in range(BANDS))
    est = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(NUM_HASHES))
    return f"""
WITH docs AS (SELECT doc_id, lower(text) AS t FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(t) >= {SHINGLE_K}
         THEN list_transform(generate_series(1, len(t) - {SHINGLE_K - 1}),
                             i -> substr(t, i, {SHINGLE_K}))
         ELSE [] END)) AS s
  FROM docs),
sig AS (
  SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id),
banded AS (
  {banded}),
sizes AS (SELECT band, bucket, count(*) AS n FROM banded GROUP BY 1, 2),
cool AS (SELECT b.doc_id, b.band, b.bucket
         FROM banded b JOIN sizes s USING (band, bucket)
         WHERE s.n <= {MAX_BUCKET}),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM cool a JOIN cool b USING (band, bucket)
          WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b,
       CAST({est} AS DOUBLE) / {NUM_HASHES} AS est_jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.id_a
JOIN sig sb ON sb.doc_id = p.id_b
WHERE CAST({est} AS DOUBLE) / {NUM_HASHES} >= {MH_THRESH}
"""


SH_BITS, SH_HAMMING, SH_CHUNK_BITS = 60, 12, 15


def simhash_oracle() -> str:
    votes = ",\n    ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SH_BITS))
    sim = " + ".join(
        f"CASE WHEN v{b} > 0 THEN (1::BIGINT << {b}) ELSE 0::BIGINT END"
        for b in range(SH_BITS))
    chunks = "\n  UNION ALL ".join(
        f"SELECT doc_id, {c} AS chunk, (sim >> {c * SH_CHUNK_BITS}) & "
        f"{(1 << SH_CHUNK_BITS) - 1} AS val FROM sig"
        for c in range(4))
    return rf"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(ts) >= 2
         THEN list_transform(generate_series(1, len(ts) - 1),
                             i -> ts[i] || ' ' || ts[i + 1])
         ELSE [] END) AS g
  FROM toks),
h AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
      FROM grams),
votes AS (
  SELECT doc_id,
    {votes}
  FROM h GROUP BY doc_id),
sig AS (SELECT doc_id, {sim} AS sim FROM votes),
chunks AS (
  {chunks}),
sizes AS (SELECT chunk, val, count(*) AS n FROM chunks GROUP BY 1, 2),
cool AS (SELECT c.doc_id, c.chunk, c.val
         FROM chunks c JOIN sizes s USING (chunk, val)
         WHERE s.n <= {MAX_BUCKET}),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM cool a JOIN cool b USING (chunk, val)
          WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b,
       CAST(bit_count(xor(sa.sim, sb.sim)) AS INT) AS hamming
FROM pairs p
JOIN sig sa ON sa.doc_id = p.id_a
JOIN sig sb ON sb.doc_id = p.id_b
WHERE bit_count(xor(sa.sim, sb.sim)) <= {SH_HAMMING}
"""


EMB_THRESH, N_PLANES, DIMS, EMB_SEED = 0.3, 4, 64, 42


def embedding_oracle() -> str:
    rng = random.Random(EMB_SEED)
    planes = [[rng.gauss(0, 1) for _ in range(DIMS)]
              for _ in range(N_PLANES)]
    def lit(p):
        return "[" + ", ".join(repr(x) for x in p) + "]"
    bucket = " + ".join(
        f"(CASE WHEN list_sum(list_transform(list_zip(embedding, {lit(p)}),"
        f" p -> CAST(p[1] AS DOUBLE) * p[2])) >= 0"
        f" THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes))
    return f"""
WITH v AS (SELECT vec_id, embedding FROM embeddings
           WHERE len(embedding) = {DIMS}),
sig AS (SELECT vec_id, embedding, {bucket} AS bucket FROM v),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(list_zip(a.embedding, b.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS d,
    sqrt(list_sum(list_transform(a.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(b.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
  FROM sig a JOIN sig b USING (bucket)
  WHERE a.vec_id < b.vec_id),
scored AS (
  SELECT id_a, id_b,
         CASE WHEN na > 0 AND nb > 0 THEN d / (na * nb) ELSE 0.0 END AS c
  FROM cand)
SELECT id_a, id_b, round(c, 6) AS cosine
FROM scored WHERE c >= {EMB_THRESH}
"""


def main():
    from pyspark.sql import SparkSession, functions as F
    from legend_community_delta_spark.operators import dedup as DD

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")

    def cmp(name, sdf, sql):
        srows = sorted(map(tuple, sdf.collect()))
        orows = sorted(map(tuple, con.execute(sql).fetchall()))
        match = srows == orows
        print(f"{name}: spark={len(srows)} duck={len(orows)} MATCH={match}")
        if not match:
            sset, oset = set(srows), set(orows)
            print("  only-spark:", list(sset - oset)[:5])
            print("  only-duck:", list(oset - sset)[:5])
        return match

    ok = True
    ok &= cmp("minhash_md5",
              DD.minhash_dedup(docs, num_hashes=NUM_HASHES, bands=BANDS,
                               shingle_k=SHINGLE_K, threshold=MH_THRESH,
                               max_bucket=MAX_BUCKET, method="md5"),
              minhash_oracle())
    ok &= cmp("simhash_md5",
              DD.simhash_dedup(docs, max_hamming=SH_HAMMING,
                               max_bucket=MAX_BUCKET, hash="md5"),
              simhash_oracle())
    ok &= cmp("embedding_lsh",
              DD.embedding_dedup(emb, threshold=EMB_THRESH,
                                 n_planes=N_PLANES, dims=DIMS,
                                 seed=EMB_SEED)
              .select("id_a", "id_b",
                      F.round("cosine", 6).alias("cosine")),
              embedding_oracle())
    print("ALL MATCH" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
