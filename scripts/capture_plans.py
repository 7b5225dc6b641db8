#!/usr/bin/env python
"""Capture .explain('formatted') for registry queries without running
them (plans only — no noop timing). Usage:

    PYTHONPATH=<tree> python capture_plans.py <out_dir> <tag> q1 q2 ...

Writes <out_dir>/<name>_<tag>.txt. The engine tree on PYTHONPATH
decides WHICH code version's plans are captured.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

if not os.environ.get("PYTHONPATH"):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

out_dir, tag = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(out_dir, exist_ok=True)

from datapipeline_scraping_spark.queries import REGISTRY  # noqa: E402
from datapipeline_scraping_spark.session import build_spark  # noqa: E402

spark = build_spark(app_name=f"plans-{tag}")
for name in names:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {name}_{tag}.txt", flush=True)
spark.stop()
