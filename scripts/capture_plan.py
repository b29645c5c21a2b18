"""Capture .explain('formatted') for registry queries to plans/<round>/.

Usage: python scripts/capture_plan.py <suffix> <query> [<query> ...]
Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (default r18).
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18")
    )
    os.makedirs(out_dir, exist_ok=True)

    from data_framework_spark.registry import QUERIES
    from data_framework_spark.session import get_spark

    spark = get_spark("capture_plan")
    from data_framework_spark.operators.bucketed import bucketed_tables

    bucketed_tables(spark, sf_dir)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
