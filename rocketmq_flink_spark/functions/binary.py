"""Binary (fixed-width, big-endian) field codec — SURVEY.md §2.3 D4.

Reference: source/util/ByteSerializer.java:40-84 + ByteUtils.java:33-218
deserialize byte[] bodies into typed values: big-endian fixed-width
numerics, 1-byte booleans, 8-byte epoch-millis timestamps, and a
scale-prefixed BigDecimal (4-byte scale + big-endian unscaled value).

Spark-first implementation: one Arrow-batched mapInPandas pass. Bodies
of one layout have constant width, so a whole batch decodes as a single
numpy buffer reshape + per-field big-endian views — no per-row Python.
Malformed rows (wrong width) follow the SKIP dirty-data strategy
(nulls with lengthCheck=PAD), matching the text decoder's policies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (callers compose)
from pyspark.sql import types as T

# type name -> (byte width, numpy big-endian dtype or None for special)
_FIXED = {
    "tinyint": (1, ">i1"),
    "smallint": (2, ">i2"),
    "int": (4, ">i4"),
    "bigint": (8, ">i8"),
    "float": (4, ">f4"),
    "double": (8, ">f8"),
    "boolean": (1, None),  # 1 byte, nonzero = true
    "timestamp": (8, None),  # big-endian epoch millis
}


def _spark_type(name: str):
    return {
        "tinyint": T.ByteType(),
        "smallint": T.ShortType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
        "timestamp": T.TimestampType(),
    }[name]


def decode_fixed_width(
    df: DataFrame,
    fields: list[tuple[str, str]],
    value_col: str = "value",
    length_check: str = "SKIP",
) -> DataFrame:
    """Decode a fixed-width big-endian binary body into typed columns.

    `fields` is an ordered [(name, type)] layout; supported types are
    the ByteSerializer scalar set (_FIXED). Rows whose body width is not
    exactly the layout width are dropped (SKIP, default) or returned as
    all-null (PAD) — DirtyDataStrategy.java:22-27 semantics.
    """
    import numpy as np
    import pandas as pd

    widths = []
    for name, tname in fields:
        if tname not in _FIXED:
            raise ValueError(f"unsupported binary field type: {tname!r}")
        widths.append(_FIXED[tname][0])
    total = sum(widths)
    offsets = [sum(widths[:i]) for i in range(len(widths))]
    mode = length_check.upper()
    if mode not in {"SKIP", "PAD"}:
        raise ValueError("length_check must be SKIP or PAD")

    out_schema = T.StructType(
        [T.StructField(n, _spark_type(t), True) for n, t in fields]
    )
    field_list = list(fields)

    def decode(iterator):
        for pdf in iterator:
            bodies = pdf[value_col]
            ok = bodies.map(lambda b: b is not None and len(b) == total)
            good = bodies[ok]
            cols: dict[str, object] = {}
            if len(good):
                buf = np.frombuffer(b"".join(good), dtype=np.uint8).reshape(
                    len(good), total
                )
                for (name, tname), off, w in zip(field_list, offsets, widths):
                    raw = np.ascontiguousarray(buf[:, off : off + w])
                    dt = _FIXED[tname][1]
                    if tname == "boolean":
                        vals = raw[:, 0] != 0
                    elif tname == "timestamp":
                        ms = raw.view(">i8")[:, 0].astype("int64")
                        vals = pd.Series(ms).astype("datetime64[ms]")
                    else:
                        # astype drops the big-endian byte order (Arrow
                        # rejects byte-swapped arrays on the way back)
                        vals = raw.view(dt)[:, 0].astype(dt[1:])
                    cols[name] = pd.Series(vals, index=good.index)
            decoded = pd.DataFrame(cols, index=good.index)
            if mode == "PAD":
                # keep malformed rows as all-null
                decoded = decoded.reindex(pdf.index)
            yield decoded

    return df.mapInPandas(decode, out_schema)


def encode_fixed_width(
    df: DataFrame,
    fields: list[tuple[str, str]],
    out_col: str = "value",
) -> DataFrame:
    """Inverse of decode_fixed_width: pack typed columns into a
    big-endian fixed-width binary body (ByteUtils.toBytes direction)."""
    import numpy as np
    import pandas as pd

    for _, tname in fields:
        if tname not in _FIXED:
            raise ValueError(f"unsupported binary field type: {tname!r}")
    field_list = list(fields)

    def encode(iterator):
        for pdf in iterator:
            n = len(pdf)
            parts = []
            for name, tname in field_list:
                s = pdf[name]
                if tname == "boolean":
                    arr = s.to_numpy(dtype=np.uint8).reshape(n, 1)
                elif tname == "timestamp":
                    ms = s.astype("datetime64[ms]").astype("int64")
                    arr = np.ascontiguousarray(
                        ms.to_numpy().astype(">i8")
                    ).view(np.uint8).reshape(n, 8)
                else:
                    dt = _FIXED[tname][1]
                    arr = (
                        np.ascontiguousarray(s.to_numpy().astype(dt))
                        .view(np.uint8)
                        .reshape(n, _FIXED[tname][0])
                    )
                parts.append(arr)
            packed = np.concatenate(parts, axis=1) if parts else np.empty((n, 0))
            yield pd.DataFrame({out_col: [bytes(row) for row in packed]})

    return df.mapInPandas(encode, T.StructType([T.StructField(out_col, T.BinaryType())]))
