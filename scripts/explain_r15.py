"""Capture .explain("formatted") for named queries into plans/r15/.

Usage: python scripts/explain_r14.py [--suffix before|after] name1 name2 ...

Writes plans/r15/<name>_<suffix>.txt. The query fn is invoked (fixture
side effects included) but the plan is captured WITHOUT materializing
the result, so plan text reflects the declared query's own tree.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argodb_mapreduce_spark import registry  # noqa: E402
from argodb_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    suffix = "before"
    sf_dir = "/root/testdata/sf0.1"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    spark = get_spark("explain-r15")
    qs = registry.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in args:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
