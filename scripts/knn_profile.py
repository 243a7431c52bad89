"""Ad-hoc profiling harness for the kNN strategies (not part of bench).

Reads the entities table the last bench run left in data/bench_work and
times knn_join end-to-end plus the pieces bench's stage lambda touches.
Env: KNN_PROBES (default 2000), KNN_STRATEGY (oneshot|ladder), KNN_RES.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dxf_postgis_converter_spark.operators.knn import knn_join
from dxf_postgis_converter_spark.session import get_spark

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name="knn_profile", master=f"local[{CPUS}]")
ents = spark.read.parquet("/root/repo/data/bench_work/entities")
pts = ents.filter(F.col("geom_type") == "POINT").select(
    "doc_id", "handle", F.col("xmin").alias("x"), F.col("ymin").alias("y"))
all_pts = pts.select(F.col("handle").alias("target_id"), "x", "y")
n_probes = int(os.environ.get("KNN_PROBES", "2000"))
probes = pts.limit(n_probes).select(F.col("handle").alias("probe_id"), "x", "y")
strategy = os.environ.get("KNN_STRATEGY", "oneshot")
res = int(os.environ.get("KNN_RES", "7"))

for rep in range(int(os.environ.get("KNN_REPEATS", "2"))):
    t0 = time.time()
    out = knn_join(probes, all_pts, k=5, res=res, strategy=strategy)
    t1 = time.time()
    out.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    print(f"run {rep}: build+internal {t1 - t0:.2f}s  force {t2 - t1:.2f}s  "
          f"total {t2 - t0:.2f}s", flush=True)
spark.stop()
