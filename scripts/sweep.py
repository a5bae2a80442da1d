"""Window correctness sweep — the in-repo twin of the driver's
CORRECTNESS gate.

Runs every (or the first N) ``queries()`` entry side-by-side with its
``oracle_sql()`` DuckDB twin over the same parquet tables, canon-sorts
columns by name and rows by all columns, and compares rows / schema /
values BIT-level (float64 compared through ``.view(uint64)`` so −0.0,
NaN payloads and last-ulp drift all count — the round-3 comparator).

Usage::

    python scripts/sweep.py /root/testdata/sf0.01 [ncpus] [--window N]
        [--only name1,name2] [--json out.json]

Prints one line per query (OK / RED / rows-only) and a final tally;
exit code 1 if any RED.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(t: pa.Table):
    """Canonical (column order, sorted dataframe) for the bit-level
    compare — timestamps normalized to ns-epoch int64 first."""
    import datetime

    cols = sorted(t.column_names)
    df = t.select(cols).to_pandas()
    for c in cols:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[ns]").astype(np.int64)
        elif s.dtype == object and len(s):
            probe = s.dropna()
            if len(probe) and isinstance(
                    probe.iloc[0],
                    (pd.Timestamp, np.datetime64, datetime.date)):
                df[c] = pd.to_datetime(s).astype("datetime64[ns]"
                                                 ).astype(np.int64)
            elif len(probe) and isinstance(probe.iloc[0],
                                           __import__("decimal").Decimal):
                df[c] = s.astype(np.float64)
    if len(df):
        df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    return tuple(cols), df


def _col_equal(gv: np.ndarray, wv: np.ndarray) -> bool:
    """Bit-level column compare with NUMERIC DTYPE UNIFICATION: an
    integer column on one side vs DOUBLE on the other (DuckDB SUM /
    window aggregates surface as DOUBLE) compares by exact float64
    value (int64→float64 is exact below 2^53 — the driver's compare
    canonicalizes the same way); float-float compares by bits."""
    g_f = np.issubdtype(gv.dtype, np.floating)
    w_f = np.issubdtype(wv.dtype, np.floating)
    g_i = np.issubdtype(gv.dtype, np.integer) or gv.dtype == bool
    w_i = np.issubdtype(wv.dtype, np.integer) or wv.dtype == bool
    if g_f and w_f:
        return bool((gv.astype(np.float64).view(np.uint64)
                     == wv.astype(np.float64).view(np.uint64)).all())
    if (g_f and w_i) or (g_i and w_f):
        iv = (gv if g_i else wv).astype(np.int64)
        fv = (wv if g_i else gv).astype(np.float64)
        big = np.abs(iv) > (1 << 53)
        if big.any():
            # above 2^53 the float64 cast of the int side loses bits —
            # two DIFFERENT totals could round to the same double, so
            # require the float side to be integral and compare exact
            # integer values there (no silent tolerance loosening)
            fb = fv[big]
            if not bool(np.isfinite(fb).all()) or \
                    not bool((fb == np.trunc(fb)).all()):
                return False
            if any(int(f) != int(i) for f, i in zip(fb, iv[big])):
                return False
            small = ~big
            return bool((iv[small].astype(np.float64).view(np.uint64)
                         == fv[small].view(np.uint64)).all())
        return bool((iv.astype(np.float64).view(np.uint64)
                     == fv.view(np.uint64)).all())
    if g_i and w_i:
        return bool((gv.astype(np.int64) == wv.astype(np.int64)).all())
    return bool(np.array_equal(
        np.asarray(["\x00N" if x is None else str(x) for x in gv]),
        np.asarray(["\x00N" if x is None else str(x) for x in wv])))


def compare(a: pa.Table, b: pa.Table):
    sa, da = canon(a)
    sb, db = canon(b)
    rows = len(da) == len(db)
    schema = sa == sb
    values = rows and schema and all(
        _col_equal(da[c].to_numpy(), db[c].to_numpy()) for c in sa)
    return rows, schema, bool(values)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("ncpus", nargs="?", type=int, default=16)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--only", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="gb.config override, e.g. --set "
                         "join_mode=streaming")
    args = ap.parse_args()

    if args.set:
        from python_graphblas_ray import config

        for kv in args.set:
            k, _, v = kv.partition("=")
            config[k] = int(v) if v.lstrip("-").isdigit() else v
        print(f"config overrides: {args.set}")

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.ncpus,
                 include_dashboard=False, ignore_reinit_error=True)

    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)[:args.window] if args.window else list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results, n_ok = {}, 0
    for name in names:
        t0 = time.time()
        try:
            got = entry._as_table(qs[name](args.sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"RED  {name}: engine raised {e!r}")
            results[name] = {"err": f"engine: {e}"}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({got.num_rows} rows, "
                  f"{time.time() - t0:.1f}s)")
            results[name] = {"rows": got.num_rows, "oracle": None}
            n_ok += 1
            continue
        try:
            want = con.execute(
                entry._normalize_sql_round(sql)).fetch_arrow_table()
        except Exception as e:  # noqa: BLE001
            print(f"RED  {name}: oracle raised {e!r}")
            results[name] = {"err": f"oracle: {e}"}
            continue
        rows, schema, values = compare(got, want)
        ok = rows and schema and values
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": values,
                         "spark_rows": got.num_rows,
                         "oracle_rows": want.num_rows}
        tag = "OK  " if ok else "RED "
        if ok:
            n_ok += 1
        print(f"{tag} {name}: rows={got.num_rows}/{want.num_rows} "
              f"schema={schema} values={values} "
              f"({time.time() - t0:.1f}s)")
        sys.stdout.flush()

    n_red = len(names) - n_ok
    print(f"\nTOTAL {n_ok} OK / {n_red} RED of {len(names)}")
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=1))
    ray.shutdown()
    sys.exit(1 if n_red else 0)


if __name__ == "__main__":
    main()
