#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate — HASH-FAITHFUL.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against
the parquet fixtures in <sfDir>, reads the engine result from
<verifyOutDir>/<name>/ parquet, sorts columns by name, and compares.

Why this is stricter than numeric ==:  the driver canonicalizes the two
sides ASYMMETRICALLY — the oracle result goes through DuckDB's pandas
conversion (DECIMAL -> float64), while the engine parquet is read such that
DECIMAL columns surface as Python Decimal objects — and then hashes the
RENDERED values.  Under Python ==, Decimal('1.0000') == 1.0 == 1, so a
value-identical engine-side DECIMAL column passes here yet hash-fails at
the driver (that is exactly how CORRECTNESS_r05 shipped 6 red rows:
q92/q94/q96/q105/q107/q109).  This gate therefore:

  1. coerces the ORACLE side through .df() (decimal -> float64, the
     driver's pandas path) and the ENGINE side through pyarrow to_pandas
     (decimal stays Decimal) — the same asymmetry the driver has;
  2. compares canonical RENDERED strings, not ==;
  3. asserts arrow-level type parity per column (normalized classes:
     int width matters, string/large_string and timestamp units don't);
  4. HARD-FAILS any engine output column of decimal type — the registry
     convention is "fold in DECIMAL for exactness, cast the final column
     to DOUBLE on both sides" (q02/q103/q68/q75), and an engine-side
     DECIMAL final column can never hash-green at the driver.

Exit 0 iff every checked query passes all four.
"""
import json
import math
import sys
import datetime
import decimal

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_class(t, oracle_side=False):
    """Normalized arrow-type class for parity checks.

    Int width is significant (the driver burned a round on DuckDB BIGINT vs
    Spark row_number INT); string largeness and timestamp unit are
    representation details that render identically.  An ORACLE-side decimal
    normalizes to double — the driver's pandas path coerces it to float64,
    which is exactly why oracle-decimal/engine-DOUBLE pairs (q68/q75) are
    green at the driver while engine-side decimals can never be.
    """
    if pa.types.is_decimal(t):
        if oracle_side:
            return "double"
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return str(t)  # int32 vs int64 matters
    if pa.types.is_floating(t):
        return str(t)
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def is_nested(t):
    """Arrow types pandas sort_values cannot canonicalize (unhashable cells)."""
    return (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t) or pa.types.is_map(t)
            or pa.types.is_struct(t))


def render(v):
    """Canonical rendered form of one cell — the hashed representation."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # rendered AS a Decimal on purpose: this is what the driver sees for
        # an engine-side decimal column, and why such columns can't match a
        # float64-coerced oracle.
        return f"Decimal({v})"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def col_values(df, c, arrow_type):
    """Cell list via pandas tolist() — numpy scalars become Python values,
    Decimal/object columns stay as-is (mirrors the driver's render path).

    pandas promotes arrow date32 to Timestamp-at-midnight on the DuckDB
    .df() path; the driver treats those as equal to the engine's date
    objects (q46/q49 are green), so when the arrow type is DATE we
    canonicalize any datetime back to its date.
    """
    is_date = arrow_type is not None and pa.types.is_date(arrow_type)
    vals = df[c].tolist()
    out = []
    for v in vals:
        # pandas NaT / NA scalars
        if v is None or (isinstance(v, float) and math.isnan(v)):
            out.append(None)
        elif v.__class__.__name__ in ("NaTType", "NAType"):
            out.append(None)
        elif is_date and isinstance(v, datetime.datetime):
            out.append(v.date())
        else:
            out.append(v)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    # Verify writes a sentinel naming queries that crashed instead of
    # dumping parquet — surface those as explicit FAILs here (mirroring the
    # driver's err rows) rather than as "engine result unreadable"
    try:
        with open(f"{out_dir}/_failed.json") as f:
            crashed = json.load(f)
    except FileNotFoundError:
        crashed = {}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if name in crashed:
            print(f"FAIL {name}: engine query crashed in Verify: {crashed[name]}")
            failures += 1
            continue
        sql = oracle[name]
        try:
            res = con.execute(sql)
            oarrow = res.fetch_arrow_table()
            # re-execute for the pandas path (fetch consumes the result)
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            earrow = pq.read_table(f"{out_dir}/{name}")
            edf = earrow.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: engine result unreadable: {e}")
            failures += 1
            continue

        ocols = sorted(oarrow.column_names)
        ecols = sorted(earrow.column_names)
        if ocols != ecols:
            print(f"FAIL {name}: columns differ oracle={ocols} engine={ecols}")
            failures += 1
            continue

        # 4. no-DecimalType lint on the ENGINE side (convention violation,
        #    fails even if the compare below would pass)
        dec_cols = [c for c in ecols
                    if pa.types.is_decimal(earrow.schema.field(c).type)]
        if dec_cols:
            print(f"FAIL {name}: engine emits DECIMAL column(s) {dec_cols} — "
                  f"forbidden; cast the final column to DOUBLE on both sides")
            failures += 1
            continue

        # 5. no-nested-type lint on the ENGINE side: the driver's pandas
        #    sort_values canonicalization raises `TypeError: unhashable
        #    type: numpy.ndarray` on list/map/struct cells (the r14 q215
        #    incident) — fail BEFORE the sort so the message names the fix
        nested_cols = [c for c in ecols
                       if is_nested(earrow.schema.field(c).type)]
        if nested_cols:
            print(f"FAIL {name}: engine emits nested column(s) {nested_cols}"
                  f" — the driver's pandas sort_values cannot canonicalize "
                  f"ARRAY/MAP/STRUCT cells; array_join/to_json the final "
                  f"column on both sides")
            failures += 1
            continue

        # 6. driver-faithful canonicalization PROBE: the driver sorts both
        #    frames with pandas sort_values before hashing — if that errors
        #    here it errors at the driver (q215's failure mode; the nested
        #    lint above should catch it first, but this reproduces anything
        #    the lint misses). The sorted frames are DISCARDED: the value
        #    compare below runs in ORIGINAL query-output order, which is
        #    STRICTER than the driver (it catches an engine ORDER BY bug
        #    that the driver's canonicalization would mask — dropping that
        #    strictness was a review finding on the first cut of this step)
        try:
            odf.sort_values(by=ocols, kind="mergesort")
            edf.sort_values(by=ecols, kind="mergesort")
        except TypeError as e:
            print(f"FAIL {name}: driver sort_values canonicalization "
                  f"errors: {e}")
            failures += 1
            continue

        # 3. arrow-level type parity (normalized; oracle decimals coerce
        #    to double per the driver's pandas path)
        tmism = [(c, type_class(oarrow.schema.field(c).type, oracle_side=True),
                  type_class(earrow.schema.field(c).type))
                 for c in ocols
                 if type_class(oarrow.schema.field(c).type, oracle_side=True)
                 != type_class(earrow.schema.field(c).type)]
        if tmism:
            c, ot, et = tmism[0]
            print(f"FAIL {name}: col {c} arrow type differs "
                  f"oracle={ot} engine={et}")
            failures += 1
            continue

        if oarrow.num_rows != earrow.num_rows:
            print(f"FAIL {name}: rows differ oracle={oarrow.num_rows} "
                  f"engine={earrow.num_rows}")
            failures += 1
            continue

        # 1+2. asymmetric canonicalization + rendered-string compare
        bad = None
        for c in ocols:
            ot = oarrow.schema.field(c).type
            ov = col_values(odf, c, ot)
            ev = col_values(edf, c, ot)
            for i, (a, b) in enumerate(zip(ov, ev)):
                ra, rb = render(a), render(b)
                if ra != rb:
                    bad = (c, i, ra, rb)
                    break
            if bad:
                break
        if bad:
            c, i, ra, rb = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={ra} engine={rb}")
            failures += 1
        else:
            print(f"OK   {name} ({oarrow.num_rows} rows)")

    # crashed queries with no oracle entry (rows-only checks) would
    # otherwise be invisible locally
    for name in sorted(crashed):
        if name not in oracle and (not only or name in only):
            print(f"FAIL {name}: engine query crashed in Verify "
                  f"(no oracle): {crashed[name]}")
            failures += 1

    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
