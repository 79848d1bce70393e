"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
against the matching ``oracle_sql()`` via DuckDB: row count, column names,
and order-insensitive values (columns sorted by name, rows sorted, values
canonicalized).  Usage: python tools/check_entry.py [name ...]
"""

from __future__ import annotations

import sys
import time
from decimal import Decimal

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Type-level canonicalization ONLY — float values are compared exactly
    (bit-level), because the driver's value-hash will not round for us."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return int(v)
    return v


# Spark simpleString dtype -> the DuckDB logical type the driver's typed
# value-hash pairs with it. Anything else (HUGEINT from sum(BIGINT), DECIMAL
# from round(DECIMAL), INTEGER vs BIGINT width drift) hashes differently on
# the driver even when Python-side values compare equal — the exact trap that
# cost groupby_host_counts in round 1 (ADVICE.md).
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}  # width drift hashes fine
_TYPE_PAIRS = {
    # round-1 evidence: int-width drift (spark int vs duckdb BIGINT in
    # token_count_docs) hash-matched on the driver; HUGEINT did not (it
    # floatifies). So ints accept any <=64-bit int, never HUGEINT/DECIMAL.
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "binary": {"BLOB"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP WITH TIME ZONE", "TIMESTAMPTZ"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def type_mismatches(sdf_schema, dcols, dtypes):
    """Pair Spark fields with DuckDB result columns by name; return the
    pairs whose types the driver's hash would treat as different."""
    duck = {c: str(t) for c, t in zip(dcols, dtypes)}
    bad = []
    for f in sdf_schema.fields:
        if f.name not in duck:
            continue
        want = _TYPE_PAIRS.get(f.dataType.simpleString())
        if want is None:
            continue  # arrays/structs: values compare element-wise below
        if duck[f.name] not in want:
            bad.append(f"{f.name}: spark {f.dataType.simpleString()} "
                       f"vs duckdb {duck[f.name]}")
    return bad


def frame_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    import duckdb

    import __spark_entry__ as E
    from crawler_spark.session import build_session

    args = [a for a in sys.argv[1:] if a != "--extended"]
    extended = "--extended" in sys.argv[1:]
    only = set(args)
    spark = build_session(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = dict(E.queries())
    oracles = dict(E.oracle_sql())
    if extended or (only and not only <= set(qs)):
        # --extended (or naming a rotated-out entry) adds the board entries
        # the driver no longer records, so the full contract stays checkable
        qs.update(E.queries_extended())
        oracles.update(E.oracle_sql_extended())
    unknown = only - set(qs)
    if unknown:
        # a typo'd (or imaginary-flag) filter must fail loudly — a filter
        # matching nothing would otherwise "pass" without running a gate
        print(f"unknown gate name(s): {sorted(unknown)}")
        sys.exit(2)
    failures = []

    t0 = time.time()
    df = E.entry(spark)
    n = df.count()
    print(f"entry: {n} rows, schema={[f.name for f in df.schema.fields]} "
          f"({time.time()-t0:.1f}s)")
    assert n >= 0

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtypes = rel.types
            drows = rel.fetchall()
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error: {ex}")
            continue

        sc, sr = frame_to_rows(scols, srows)
        dc, dr = frame_to_rows(dcols, drows)
        status = type_mismatches(sdf.schema, dcols, dtypes)
        if len(sr) != len(dr):
            status.append(f"rowcount {len(sr)} vs {len(dr)}")
        if sc != dc:
            status.append(f"schema {sc} vs {dc}")
        if not status and sr != dr:
            bad = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            diffs = "; ".join(f"{sr[i]} != {dr[i]}" for i in bad)
            status.append(f"values differ, e.g. {diffs}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: {len(sr)} rows match oracle "
                  f"({time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n_, s in failures:
            print(f"  {n_}: {s}")
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
