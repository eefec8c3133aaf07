"""Strict oracle check for NAMED registry queries (driver_sim twin).

Usage: python scripts/check_queries.py name1 name2 ... [--sf DIR]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from argodb_mapreduce_spark import registry  # noqa: E402
from argodb_mapreduce_spark.session import get_spark  # noqa: E402
from scripts.driver_sim import _hash  # noqa: E402
from tests.compare import duck_connection  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    spark = get_spark("check-queries", cpus=8)
    all_q = registry.all_queries()
    bad = 0
    for name in args:
        q = all_q[name]
        try:
            spk = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                print(f"NOORACLE {name} rows={len(spk)}")
                continue
            con = duck_connection(sf_dir)
            try:
                duck = con.execute(q.oracle).df()
            finally:
                con.close()
            ok = (
                len(spk) == len(duck)
                and sorted(spk.columns) == sorted(duck.columns)
                and _hash(spk) == _hash(duck)
            )
            print(("PASS" if ok else "FAIL") + f"     {name} rows={len(spk)}")
            bad += 0 if ok else 1
        except Exception:
            import traceback

            bad += 1
            print(f"ERR      {name}")
            traceback.print_exc(limit=3)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
