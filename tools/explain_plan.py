"""Capture .explain('formatted') for declared queries into plans/<round>/.

Usage: python tools/explain_plan.py <suffix> <query> [query ...]
       python tools/explain_plan.py before corpus_curation dedup_survivors

Writes plans/<round>/<query>_<suffix>.txt (round from $SPARK_GRAFT_PLAN_DIR,
default r13). Uses the same session factory as bench.py so plan shapes
match what the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from rat_strain_loader_pipeline_spark.session import get_spark

    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
