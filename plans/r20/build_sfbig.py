"""Build a measurement-only scaled dataset at /tmp/sfbig (never read by
bench.py or the oracle): each table is N shifted copies of the sf0.1
fixture, written as multi-file parquet so scans carry real parallelism.
Deterministic (pure column arithmetic on the fixed fixture)."""
import os, sys, shutil
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from bravo_spark.session import get_spark
from pyspark.sql import functions as F

OUT = "/tmp/sfbig"
COPIES = {  # table -> (n_copies, id columns to shift)
    "events": (16, ["event_id", "user_id"]),
    "documents": (16, ["doc_id"]),
    "embeddings": (8, ["vec_id"]),
    "lineitem": (4, ["l_orderkey"]),
    "orders": (4, ["o_orderkey", "o_custkey"]),
    "customer": (4, ["c_custkey"]),
    "supplier": (1, []),
    "part": (1, []),
    "region": (1, []),
    "nation": (1, []),
}
OFFSET = 10_000_000

spark = get_spark(app_name="sfbig_build", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
shutil.rmtree(OUT, ignore_errors=True)
os.makedirs(OUT)
for name, (n, idcols) in COPIES.items():
    df = spark.read.parquet(f"/root/testdata/sf0.1/{name}.parquet")
    parts = []
    for k in range(n):
        c = df
        for col in idcols:
            c = c.withColumn(col, F.col(col) + F.lit(k * OFFSET))
        if name == "documents" and k:
            # rotate 10 letters by k so every copy's token stream is
            # distinct -> shingle doc-frequency keeps its fixture shape
            alpha = "abcdefghij"
            rot = alpha[k % 10:] + alpha[:k % 10]
            c = c.withColumn("text", F.translate(F.col("text"), alpha, rot))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    nfiles = max(1, min(32, n * 2))
    out.repartition(nfiles).write.mode("overwrite").parquet(
        os.path.join(OUT, f"{name}.parquet"))
    print(name, "x", n, "->", nfiles, "files")
spark.stop()
print("done")
