"""Nested dotted-path get/set/remove with array indexing.

The reference addresses event fields by path — `a.b[0].c`, negative
indices count from the end (reference config/logevent/pathvalue.go:
29-73 GetValue, 150-192 SetValue/RemoveValue). Columnar analog:

- get  -> a Column expression (bracket access / element_at)
- set  -> struct rebuild via Column.withField; array elements rebuilt
          with a positional transform (only the addressed index
          changes); MAP parents set via map_filter + map_concat;
          missing struct fields (and a missing root column) are
          CREATED like the reference's SetValue
- remove -> Column.dropFields / map_filter; array index removal
          filters by position; removing a struct's only field nulls
          the parent (Spark cannot represent a zero-field struct)

All pure column expressions — Catalyst sees one projection, no UDFs.
Traversal is schema-aware so struct vs map parents dispatch correctly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

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


def _get(col: Column, dtype: DataType | None, steps: list[Step]) -> Column:
    """Schema-aware get: a missing struct field resolves to a typed null
    instead of an AnalysisException (map keys and array indices already
    null at runtime when absent)."""
    for kind, v in steps:
        if kind == "field":
            if isinstance(dtype, StructType):
                if v not in dtype.fieldNames():
                    return F.lit(None).cast("string")
                dtype = dtype[v].dataType
            elif isinstance(dtype, MapType):
                dtype = dtype.valueType
            else:
                dtype = None
            col = col[v]
        else:
            dtype = dtype.elementType if isinstance(dtype, ArrayType) else None
            col = _idx_get(col, v)
    return col


def get_path(df: DataFrame, path: str) -> Column:
    steps = parse_path(path)
    kind, name = steps[0]
    if kind != "field":
        raise ValueError("path must start with a field name: %r" % path)
    if name not in df.columns:
        return F.lit(None).cast("string")
    return _get(F.col(name), df.schema[name].dataType, steps[1:])


def _pos_pred(i: int, col: Column):
    """0-based positional predicate for transform/filter lambdas."""
    if i >= 0:
        return lambda j: j == F.lit(i)
    return lambda j: j == F.size(col) + F.lit(i)


def _build(steps: list[Step], value: Column) -> Column:
    """Create the remaining path as fresh nested structs (the
    reference's SetValue creates intermediate containers)."""
    for kind, v in reversed(steps):
        if kind != "field":
            raise ValueError("cannot create array elements for a missing path")
        value = F.struct(value.alias(v))
    return value


def _set(
    col: Column, dtype: DataType, steps: list[Step], value: Column, create: bool = True
) -> Column:
    if not steps:
        return value
    kind, v = steps[0]
    if kind == "field":
        if isinstance(dtype, MapType):
            if steps[1:]:
                raise ValueError("cannot set below a map value (path %r)" % (v,))
            kept = F.map_filter(col, lambda k, _: k != F.lit(v))
            entry = F.create_map(F.lit(v), value.cast(dtype.valueType))
            return F.map_concat(
                F.when(col.isNull(), F.create_map().cast(dtype)).otherwise(kept), entry
            )
        if not isinstance(dtype, StructType):
            raise ValueError("cannot set field %r under non-struct %s" % (v, dtype))
        base = col
        if create and dtype.fields:
            # withField on a NULL struct returns null (the set would be
            # swallowed): materialize an all-null struct first so
            # CREATION semantics hold on null parents. Removal-driven
            # writes (create=False) must NOT resurrect null ancestors.
            null_struct = F.struct(*[
                F.lit(None).cast(f.dataType).alias(f.name) for f in dtype.fields
            ])
            base = F.coalesce(col, null_struct)
        if v not in dtype.fieldNames():
            return base.withField(v, _build(steps[1:], value))
        return base.withField(
            v, _set(base[v], dtype[v].dataType, steps[1:], value, create)
        )
    if not isinstance(dtype, ArrayType):
        raise ValueError("cannot index into non-array %s" % dtype)
    pred = _pos_pred(v, col)
    return F.transform(
        col,
        lambda x, j: F.when(
            pred(j), _set(x, dtype.elementType, steps[1:], value, create)
        ).otherwise(x),
    )


def set_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Set a (possibly nested) path to a Column value. A bare top-level
    name is a plain withColumn; missing struct fields — and a missing
    root column — are created."""
    steps = parse_path(path)
    kind, name = steps[0]
    if kind != "field":
        raise ValueError("path must start with a field name: %r" % path)
    if len(steps) == 1:
        return df.withColumn(name, value)
    if name not in df.columns:
        return df.withColumn(name, _build(steps[1:], value))
    return df.withColumn(
        name, _set(F.col(name), df.schema[name].dataType, steps[1:], value)
    )


def _remove(col: Column, dtype: DataType, steps: list[Step]) -> Column:
    kind, v = steps[0]
    if len(steps) == 1:
        if kind == "field":
            if isinstance(dtype, MapType):
                return F.map_filter(col, lambda k, _: k != F.lit(v))
            if isinstance(dtype, StructType) and v not in dtype.fieldNames():
                return col  # missing field: no-op like the reference
            return col.dropFields(v)
        pred = _pos_pred(v, col)
        # drop the addressed element: keep every other position
        return F.filter(col, lambda x, j: ~pred(j))
    if kind == "field":
        if isinstance(dtype, MapType):
            raise ValueError("cannot remove below a map value")
        if v not in dtype.fieldNames():
            return col  # missing intermediate: no-op
        return col.withField(v, _remove(col[v], dtype[v].dataType, steps[1:]))
    pred = _pos_pred(v, col)
    return F.transform(
        col,
        lambda x, j: F.when(pred(j), _remove(x, dtype.elementType, steps[1:])).otherwise(x),
    )


def _dtype_at(dtype: DataType, steps: list[Step]) -> DataType | None:
    """Resolve the type at a path, None when any element is missing."""
    for kind, v in steps:
        if kind == "field":
            if isinstance(dtype, MapType):
                dtype = dtype.valueType
            elif isinstance(dtype, StructType) and v in dtype.fieldNames():
                dtype = dtype[v].dataType
            else:
                return None
        elif isinstance(dtype, ArrayType):
            dtype = dtype.elementType
        else:
            return None
    return dtype


def remove_path(df: DataFrame, path: str) -> DataFrame:
    """Remove a nested field / array element / map key. A bare
    top-level name drops the column. Removing a struct's ONLY field
    nulls the parent struct (Spark cannot represent a zero-field
    struct); removing a missing column/path is a no-op like the
    reference."""
    steps = parse_path(path)
    kind, name = steps[0]
    if kind != "field":
        raise ValueError("path must start with a field name: %r" % path)
    if name not in df.columns:
        return df
    if len(steps) == 1:
        return df.drop(name)
    root_type = df.schema[name].dataType
    if _dtype_at(root_type, steps[1:]) is None and steps[-1][0] == "field":
        # tolerate a missing LEAF (struct no-op handled in _remove); a
        # missing intermediate makes the whole removal a no-op
        if _dtype_at(root_type, steps[1:-1]) is None:
            return df
    if steps[-1][0] == "field":
        parent_steps = steps[1:-1]
        parent_type = _dtype_at(root_type, parent_steps)
        if (
            isinstance(parent_type, StructType)
            and len(parent_type.fields) == 1
            and steps[-1][1] == parent_type.fields[0].name
        ):
            null_parent = F.lit(None).cast(parent_type)
            if not parent_steps:
                return df.withColumn(name, null_parent)
            # create=False: removal must not materialize null ancestors
            return df.withColumn(
                name, _set(F.col(name), root_type, parent_steps, null_parent, create=False)
            )
    return df.withColumn(name, _remove(F.col(name), root_type, steps[1:]))
