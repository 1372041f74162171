"""Nested dotted-path get/set/remove with array indexing.

The reference addresses event fields by path — `a.b[0].c`, negative
indices count from the end (reference config/logevent/pathvalue.go:
29-73 GetValue, 150-192 SetValue/RemoveValue). Columnar analog:

- get  -> a Column expression (getField / element_at)
- set  -> struct rebuild via Column.withField; array elements rebuilt
          with a positional transform (only the addressed index changes)
- remove -> Column.dropFields; array index removal filters by position

All pure column expressions — Catalyst sees one projection, no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STEP_RX = re.compile(r"([^.\[\]]+)|\[(-?\d+)\]")

Step = tuple[str, object]  # ("field", name) | ("index", int)


def parse_path(path: str) -> list[Step]:
    """'a.b[0].c' -> [(field,a),(field,b),(index,0),(field,c)];
    negative indices count from the end."""
    steps: list[Step] = []
    for m in _STEP_RX.finditer(path):
        if m.group(1) is not None:
            steps.append(("field", m.group(1)))
        else:
            steps.append(("index", int(m.group(2))))
    if not steps:
        raise ValueError("empty path %r" % path)
    return steps


def _idx_get(col: Column, i: int) -> Column:
    # element_at is 1-based and supports negatives from the end —
    # matching the reference's negative indexing
    return F.element_at(col, i + 1 if i >= 0 else i)


def _get(col: Column, steps: list[Step]) -> Column:
    for kind, v in steps:
        col = col.getField(v) if kind == "field" else _idx_get(col, v)
    return col


def get_path(df: DataFrame, path: str) -> Column:
    steps = parse_path(path)
    kind, name = steps[0]
    if kind != "field":
        raise ValueError("path must start with a field name: %r" % path)
    return _get(F.col(name), steps[1:])


def _pos_pred(i: int, col: Column):
    """0-based positional predicate for transform/filter lambdas."""
    if i >= 0:
        return lambda j: j == F.lit(i)
    return lambda j: j == F.size(col) + F.lit(i)


def _set(col: Column, steps: list[Step], value: Column) -> Column:
    if not steps:
        return value
    kind, v = steps[0]
    if kind == "field":
        return col.withField(v, _set(col.getField(v), steps[1:], value))
    pred = _pos_pred(v, col)
    return F.transform(
        col, lambda x, j: F.when(pred(j), _set(x, steps[1:], value)).otherwise(x)
    )


def set_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Set a (possibly nested) path to a Column value. A bare top-level
    name is a plain withColumn; nested paths rebuild only the addressed
    branch."""
    steps = parse_path(path)
    kind, name = steps[0]
    if kind != "field":
        raise ValueError("path must start with a field name: %r" % path)
    if len(steps) == 1:
        return df.withColumn(name, value)
    return df.withColumn(name, _set(F.col(name), steps[1:], value))


def _remove(col: Column, steps: list[Step]) -> Column:
    kind, v = steps[0]
    if len(steps) == 1:
        if kind == "field":
            return col.dropFields(v)
        pred = _pos_pred(v, col)
        # drop the addressed element: keep every other position
        return F.filter(col, lambda x, j: ~pred(j))
    if kind == "field":
        return col.withField(v, _remove(col.getField(v), steps[1:]))
    pred = _pos_pred(v, col)
    return F.transform(
        col, lambda x, j: F.when(pred(j), _remove(x, steps[1:])).otherwise(x)
    )


def _dtype_at(dtype, steps: list[Step]):
    for kind, v in steps:
        dtype = dtype[v].dataType if kind == "field" else dtype.elementType
    return dtype


def remove_path(df: DataFrame, path: str) -> DataFrame:
    """Remove a nested field / array element. A bare top-level name
    drops the column. Removing a struct's ONLY field nulls the parent
    struct (Spark cannot represent a zero-field struct)."""
    from pyspark.sql.types import StructType

    steps = parse_path(path)
    kind, name = steps[0]
    if kind != "field":
        raise ValueError("path must start with a field name: %r" % path)
    if len(steps) == 1:
        return df.drop(name)
    if steps[-1][0] == "field":
        parent_steps = steps[1:-1]
        parent_type = _dtype_at(df.schema[name].dataType, parent_steps)
        if isinstance(parent_type, StructType) and len(parent_type.fields) == 1:
            null_parent = F.lit(None).cast(parent_type)
            if not parent_steps:
                return df.withColumn(name, null_parent)
            return df.withColumn(name, _set(F.col(name), parent_steps, null_parent))
    return df.withColumn(name, _remove(F.col(name), steps[1:]))
