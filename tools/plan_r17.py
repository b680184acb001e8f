#!/usr/bin/env python
"""Capture .explain("formatted") output for named catalog entries into
plans/r17/<query>_<suffix>.txt (the optimization round's before/after
evidence files).

    python tools/plan_r17.py before q1_pricing_summary graph_pagerank_bipartite ...
    python tools/plan_r17.py after  graph_pagerank_bipartite
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from currency_etl_spark.catalog import load_catalog
from currency_etl_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-r17", cpus=8)
    catalog = load_catalog()
    jvm = spark._jvm
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = catalog[name].spark_fn(spark, sf_dir)
        plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n\n")
            f.write(plan.rstrip() + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
