"""Local replica of the driver's DuckDB-oracle comparison.

For each judged query: run the Spark callable and the oracle SQL on the same
parquet fixtures, sort columns by name, sort rows, and require exact value
equality (floats compared bit-exact — this emulates the driver's value-hash,
so any mismatch here would fail the real gate too).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from reflex_spark.tables import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # dates / Decimals → canonical strings
            df[c] = s.map(lambda v: None if v is None else str(v))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_family(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "integral"
    if pd.api.types.is_float_dtype(s):
        return "floating"
    return "object"


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    spdf = _normalize(spark_df.toPandas())
    opdf = _normalize(oracle_pdf)
    if list(spdf.columns) != list(opdf.columns):
        return [f"{name}: columns differ spark={list(spdf.columns)} oracle={list(opdf.columns)}"]
    if len(spdf) != len(opdf):
        return [f"{name}: row count spark={len(spdf)} oracle={len(opdf)}"]
    for c in spdf.columns:
        a, b = spdf[c], opdf[c]
        fam = _dtype_family(a), _dtype_family(b)
        if fam[0] != fam[1] and {"integral", "floating", "bool"} & set(fam):
            # The driver's value-hash is dtype-sensitive (1 vs 1.0 hash
            # differently): an Int64-vs-float64 column pair MUST fail here
            # too, or a HUGEINT-emitting oracle sails through the local gate
            # and dies at the driver (round-5 text_sequence_packing).
            # Non-numeric cross-family pairs (Spark date → object vs DuckDB
            # date → datetime64) are driver-hash-equal and stay allowed.
            errs.append(
                f"{name}.{c}: dtype family mismatch spark={fam[0]}({a.dtype}) "
                f"oracle={fam[1]}({b.dtype})"
            )
            continue
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            ok = [
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(a.fillna(float("nan")), b.fillna(float("nan")))
            ]
            if not all(ok):
                bad = ok.index(False)
                errs.append(
                    f"{name}.{c}: float mismatch at row {bad}: "
                    f"spark={a.iloc[bad]!r} oracle={b.iloc[bad]!r}"
                )
        else:
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                bad = int(eq.idxmin())
                errs.append(
                    f"{name}.{c}: mismatch at row {bad}: "
                    f"spark={a.iloc[bad]!r} oracle={b.iloc[bad]!r}"
                )
    return errs
