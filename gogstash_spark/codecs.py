"""Codecs: de/serializers attached to sources and sinks
(reference config/codec.go:23-36).

- default: bytes/line -> text column (identity)           codec.go:123-192
- json:    event <-> JSON string                          codec/json/codecjson.go:37-138
- azureeventhubjson: envelope with a `records` array that explodes
  into N events                                           codec/azureeventhubjson/codecazureeventhubjson.go:37-91
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gogstash_spark import logevent


def decode_default(df: DataFrame, source: str = "value") -> DataFrame:
    """Raw line -> text (the `default` codec)."""
    return df.withColumn(logevent.TEXT, F.col(source).cast("string"))


def _parse_rfc3339(col: Column) -> Column:
    """RFC3339(Nano) -> timestamp: ISO cast handles fractional seconds
    (nanos truncate to micros, matching Go time round-tripped at micro
    precision in parquet)."""
    return F.coalesce(F.try_to_timestamp(col), col.try_cast("timestamp"))


def decode_json(df: DataFrame, source: str = "value", schema: str | None = None) -> DataFrame:
    """JSON line -> typed columns; the reserved fields lift into the
    event struct (reference codec/json/codecjson.go:111-138):
    `message` -> text, `@timestamp` (RFC3339Nano) -> ts, `tags` merges
    into the event tags. Everything else becomes its own column (typed
    mode) or stays in the `extra` map (schemaless mode)."""
    sch = schema or "map<string,string>"
    parsed = F.from_json(F.col(source).cast("string"), sch)
    df = df.withColumn("__c", parsed)
    if schema:
        inner = df.select(F.col("__c.*")).columns
        cols: dict[str, Column] = {}
        for c in inner:
            v = F.col("__c")[c]
            if c == "@timestamp":
                cols[logevent.TS] = _parse_rfc3339(v.cast("string"))
            elif c == "message":
                cols[logevent.TEXT] = v.cast("string")
            elif c == logevent.TAGS and logevent.TAGS in df.columns:
                cols[logevent.TAGS] = F.array_union(
                    logevent.tags_col(df), F.coalesce(v, F.array().cast("array<string>"))
                )
            else:
                cols[c] = v
        df = df.withColumns(cols)
    else:
        m = F.col("__c")
        df = df.withColumn(
            "extra", F.map_filter(m, lambda k, v: ~k.isin("message", "@timestamp"))
        )
        df = df.withColumn(
            logevent.TEXT,
            F.coalesce(
                m["message"],
                F.col(logevent.TEXT) if logevent.TEXT in df.columns
                else F.lit(None).cast("string"),
            ),
        )
        df = df.withColumn(
            logevent.TS,
            F.coalesce(
                _parse_rfc3339(m["@timestamp"]),
                F.col(logevent.TS) if logevent.TS in df.columns
                else F.lit(None).cast("timestamp"),
            ),
        )
    return df.drop("__c")


def encode_json(
    df: DataFrame,
    exclude: list[str] | None = None,
    sort_map_keys: bool = False,
    remove_field: list[str] | None = None,
) -> DataFrame:
    """Event -> JSON string column `encoded`, matching the reference
    marshal (config/logevent/logevent.go:22-28,120-143):

    - @timestamp: UTC, Go layout `2006-01-02T15:04:05.999999999Z` —
      the fractional part TRIMS trailing zeros (and the dot when the
      fraction is zero); Spark timestamps are micros so the fraction
      is at most 6 digits
    - empty message and empty tags are OMITTED (Go omitempty / the
      explicit `if t.Message != ""` guard)
    - remove_field: fields dropped at marshal time — top-level columns,
      or `map_col.key` entries inside a map column (the reference's
      removePathValue walks nested maps)
    - sort_map_keys: serialize fields in sorted-by-name order (the
      json-iterator SortMapKeys knob; field order is the struct order
      here, so sorting the struct sorts the output)
    """
    from pyspark.sql.types import MapType, StructType

    # remove_field entries use MARSHAL names (the reference's
    # removePathValue walks the serialized map) — translate the reserved
    # names to this engine's column names
    _marshal_alias = {"message": logevent.TEXT, "@timestamp": logevent.TS}
    remove = {_marshal_alias.get(f, f) for f in (remove_field or [])}
    nested: dict[str, set[str]] = {}
    for f in list(remove):
        if "." in f:
            root, sub = f.split(".", 1)
            nested.setdefault(root, set()).add(sub)
            remove.discard(f)
    cols = [c for c in df.columns if c not in (exclude or []) and c not in remove]
    named: list[tuple[str, Column]] = []
    # date_format renders in the SESSION timezone; shift the instant so
    # the rendered wall time is UTC regardless of session tz (the 'Z' we
    # append must be true — get_spark pins UTC, but a plain session may not)
    sess_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    for c in cols:
        if c == logevent.TS:
            ts_utc = (
                F.col(c)
                if sess_tz in ("UTC", "Etc/UTC", "GMT")
                else F.to_utc_timestamp(F.col(c).cast("timestamp"), sess_tz)
            )
            iso = F.date_format(ts_utc, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
            named.append((
                "@timestamp",
                F.concat(F.regexp_replace(iso, r"\.?0+$", ""), F.lit("Z")),
            ))
        elif c == logevent.TEXT:
            # omit-empty: to_json drops null fields
            named.append(("message", F.nullif(F.col(c), F.lit(""))))
        elif c == logevent.TAGS:
            named.append((c, F.when(F.size(F.col(c)) > 0, F.col(c))))
        elif c in nested and isinstance(df.schema[c].dataType, MapType):
            gone = F.array(*[F.lit(k) for k in sorted(nested[c])])
            named.append((
                c, F.map_filter(F.col(c), lambda k, _v: ~F.array_contains(gone, k)),
            ))
        elif c in nested and isinstance(df.schema[c].dataType, StructType):
            # struct root: recursive removal mirroring the reference's
            # removePathValue walk (config/pathvalue.go:150-192) —
            # handles nested structs (a level whose EVERY field is
            # removed drops the parent field; an empty struct can't be
            # expressed), maps nested under structs (single-level key
            # removal via map_filter), and silently no-ops on missing
            # nested names like the reference. A fully-emptied ROOT is
            # omitted (omit-empty rendering).
            newc = _remove_nested(F.col(c), df.schema[c].dataType, nested[c])
            named.append((c, newc if newc is not None else F.lit(None)))
        else:
            named.append((c, F.col(c)))
    # a nested remove_field whose root is missing or not a container
    # must fail loudly, not serialize the field anyway (the reference
    # walks and silently no-ops only on MISSING paths; a scalar root is
    # always a config bug)
    for root, subs in nested.items():
        if root in (exclude or []) or root in remove:
            continue
        if root not in df.columns:
            raise ValueError(
                "encode_json remove_field: nested root %r is not a column "
                "(have: %s)" % (root, sorted(df.columns))
            )
        dt = df.schema[root].dataType
        if not isinstance(dt, (MapType, StructType)):
            raise ValueError(
                "encode_json remove_field: nested root %r is %s, not a "
                "map/struct" % (root, dt.simpleString())
            )
        if isinstance(dt, MapType) and any("." in s for s in subs):
            # map_filter only matches TOP-LEVEL keys; a deeper dotted
            # path under a map root would silently serialize the field
            # the config says to scrub — fail loudly instead
            raise ValueError(
                "encode_json remove_field: deeper nested removal under "
                "map column %r is not supported (got %s); only "
                "'%s.<key>' single-level keys work on maps"
                % (root, sorted(s for s in subs if "." in s), root)
            )
    if sort_map_keys:
        named.sort(key=lambda nc: nc[0])
    return df.withColumn(
        "encoded", F.to_json(F.struct(*[col.alias(n) for n, col in named]))
    )


def _remove_nested(col: Column, dtype, subs) -> Column | None:
    """`col` (a struct) minus the dotted removal paths; None when every
    field is removed (an empty struct is inexpressible — the caller
    drops the parent field / omits the column instead). Missing nested
    names silently no-op (the reference's removePathValue walk); a path
    descending through a scalar, or more than one level under a MAP
    (map keys are opaque strings, not paths), raises."""
    from pyspark.sql.types import MapType, StructType

    by_head: dict[str, set[str]] = {}
    for s in subs:
        head, _, rest = s.partition(".")
        by_head.setdefault(head, set())
        if rest:
            by_head[head].add(rest)
    fields = {f.name: f.dataType for f in dtype.fields}
    whole: set[str] = set()
    out = col
    for head, rests in by_head.items():
        if head not in fields:
            continue
        if not rests:
            whole.add(head)
            continue
        ft = fields[head]
        if isinstance(ft, StructType):
            child = _remove_nested(col[head], ft, rests)
            if child is None:
                whole.add(head)
            else:
                out = out.withField(head, child)
        elif isinstance(ft, MapType):
            deep = sorted(r for r in rests if "." in r)
            if deep:
                raise ValueError(
                    "encode_json remove_field: deeper nested removal "
                    "under map field %r is not supported (got %s)"
                    % (head, deep)
                )
            gone = F.array(*[F.lit(k) for k in sorted(rests)])
            out = out.withField(
                head,
                F.map_filter(col[head], lambda k, _v: ~F.array_contains(gone, k)),
            )
        else:
            raise ValueError(
                "encode_json remove_field: %r is %s, not a map/struct"
                % (head, ft.simpleString())
            )
    if set(fields) <= whole:
        return None
    if whole:
        out = out.dropFields(*sorted(whole))
    return out


def decode_azureeventhubjson(
    df: DataFrame, source: str = "value", record_schema: str = "map<string,string>"
) -> DataFrame:
    """Event Hub envelope: {"records": [e1, e2, ...]} -> one row per
    record (reference codec/azureeventhubjson explodes the array)."""
    env = F.from_json(
        F.col(source).cast("string"), "struct<records:array<%s>>" % record_schema
    )
    return (
        df.withColumn("__rec", F.explode(env["records"]))
        .withColumn("record", F.col("__rec"))
        .drop("__rec")
    )
