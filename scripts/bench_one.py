#!/usr/bin/env python
"""Time one registry query standalone: best + all samples of N runs
(cache cleared between runs). Usage: bench_one.py qname [runs]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

name = sys.argv[1]
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from datapipeline_scraping_spark.queries import REGISTRY
from datapipeline_scraping_spark.session import build_spark

spark = build_spark(app_name="bench-one")
spark.range(1).count()
spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
    spark.sparkContext.defaultParallelism
).mapInPandas(lambda it: it, schema="id long").count()

fn = REGISTRY[name].fn
samples = []
for _ in range(runs):
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    samples.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
print(f"{name}: best={min(samples):.3f}s rows={n} samples="
      + ",".join(f"{s:.3f}" for s in samples))
spark.stop()
