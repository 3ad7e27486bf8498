"""Dump .explain('formatted') for named queries to plans/r16/<q>_<tag>.txt.

Usage: python tools/dump_r16_plans.py <tag> <query> [query ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hippo_claim_crossover_spark.plans import ALL_SPECS  # noqa: E402
from hippo_claim_crossover_spark.session import get_spark  # noqa: E402

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_r16_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = ALL_SPECS[n].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        with open(os.path.join(out_dir, f"{n}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(n, "->", f"{n}_{tag}.txt")

if __name__ == "__main__":
    main()
