"""Heavy-family scaling measurement on the /tmp/sfbig dataset.
Usage: SPARK_GRAFT_CPUS=N python /tmp/time_sfbig.py"""
import os, sys, time
sys.path.insert(0, "/root/repo")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
from bravo_spark.session import get_spark
import __spark_entry__ as entry
spark = get_spark(app_name=f"sfbig_c{cpus}", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
names = [
    "dedup_ngram_jaccard", "dedup_semantic_clusters", "ann_ivf_index_search",
    "text_hash_features_classify",
    "multimodal_jpeg_roundtrip", "image_phash_dedup",
    "text_lm_perplexity_filter", "tpch_q1",
    "spark_state_rewrite", "spark_state_diff", "rocksdb_state_rewrite",
    "streaming_stateful_counts",
]
sf = "/tmp/sfbig"
qs["p1_value_kv"](spark, sf).count()
res = {}
for n in names:
    t0 = time.perf_counter()
    qs[n](spark, sf).write.format("noop").mode("overwrite").save()  # warm (full exec)
    warm = time.perf_counter() - t0
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        qs[n](spark, sf).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    res[n] = min(runs)
    print(f"# {n}: min={res[n]:.3f} warm={warm:.3f} load={os.getloadavg()[0]:.2f}",
          file=sys.stderr, flush=True)
import json
print(json.dumps({"cpus": cpus, "rows": res}))
spark.stop()
