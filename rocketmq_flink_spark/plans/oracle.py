"""Local DuckDB-oracle compare harness.

Mimics the driver's correctness gate: run the Spark query and the oracle
SQL side by side, sort columns by name, canonicalize rows, compare
order-insensitively and bit-exactly. Queries are designed (decimal
intermediates, explicit rounding, stable tie-breaks) so that exact
comparison is achievable across engines.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import pandas as pd

from rocketmq_flink_spark.session import TABLE_NAMES


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly -> bit-exact comparison
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


@dataclass
class CompareReport:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list = field(default_factory=list)

    def __str__(self):
        status = "OK " if self.ok else "FAIL"
        extra = "" if self.ok else f" mismatches={self.mismatches[:3]}"
        return (
            f"[{status}] {self.name}: spark={self.spark_rows} "
            f"oracle={self.oracle_rows}{extra}"
        )


def compare_frames(name: str, spark_pdf, duck_pdf) -> CompareReport:
    cols_s = sorted(spark_pdf.columns)
    cols_d = sorted(duck_pdf.columns)
    if cols_s != cols_d:
        return CompareReport(
            name, False, len(spark_pdf), len(duck_pdf),
            [f"columns differ: spark={cols_s} oracle={cols_d}"],
        )
    rows_s = canon_rows(spark_pdf)
    rows_d = canon_rows(duck_pdf)
    if len(rows_s) != len(rows_d):
        return CompareReport(
            name, False, len(rows_s), len(rows_d), ["row count differs"]
        )
    mismatches = []
    for i, (a, b) in enumerate(zip(rows_s, rows_d)):
        if a != b:
            mismatches.append(f"row {i}: spark={a} oracle={b}")
            if len(mismatches) >= 5:
                break
    return CompareReport(name, not mismatches, len(rows_s), len(rows_d), mismatches)


def check_query(spark, name: str, sf_dir: str, con=None) -> CompareReport:
    """Run one registry query against its oracle and compare."""
    from rocketmq_flink_spark.plans.catalog import REGISTRY

    qd = REGISTRY[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        return CompareReport(name, True, len(spark_pdf), -1, ["rows-only (no oracle)"])
    own_con = con is None
    if own_con:
        con = duck_connect(sf_dir)
    try:
        duck_pdf = con.execute(qd.oracle).df()
    finally:
        if own_con:
            con.close()
    return compare_frames(name, spark_pdf, duck_pdf)
