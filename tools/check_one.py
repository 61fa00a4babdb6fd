#!/usr/bin/env python
"""Contract-check a SUBSET of driver queries by name (same compare as
check_contract.py, minus the smoke test) — the fast loop for adding a
new queries()/oracle_sql() pair. Usage:

    python tools/check_one.py zorder_prune_documents [more ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.check_contract import TABLES, value_hash


def main(*names: str) -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entrymod
    from cpp_parquet_spark.session import get_spark
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows")
            continue
        orow = con.execute(oracles[name])
        ocols = [d[0] for d in orow.description]
        orows = orow.fetchall()
        ok_schema = sorted(c.lower() for c in scols) == \
            sorted(c.lower() for c in ocols)
        sh = value_hash(scols, [tuple(r) for r in srows])
        oh = value_hash(ocols, orows)
        ok = ok_schema and len(srows) == len(orows) and sh == oh
        mark = "OK " if ok else "FAIL"
        print(f"  [{mark}] {name}: spark={len(srows)} oracle={len(orows)} "
              f"schema={ok_schema} hash={'OK' if sh == oh else 'MISMATCH'}")
        if not ok:
            failed.append(name)
            print("    spark cols:", scols, "oracle cols:", ocols)
            for a, b in list(zip(sorted(map(str, srows)),
                                 sorted(map(str, orows))))[:5]:
                print("      S:", a[:200])
                print("      O:", b[:200])
    print(json.dumps({"failed": failed, "n": len(names)}))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
