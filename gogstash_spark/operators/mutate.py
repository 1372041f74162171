"""Mutate-family filters: mutate, typeconv, convert, add_field,
remove_field, drop, hash, ratelimit — all native column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gogstash_spark import logevent
from gogstash_spark.functions.conds import cond_to_sql
from gogstash_spark.functions.hof import staged
from gogstash_spark.operators import Context, Stage, apply_common, register


@register("mutate")
def compile_mutate(cfg: dict, ctx: Context) -> Stage:
    """Per-field ops: uppercase/lowercase/split/replace/merge/rename
    (reference filter/mutate/filtermutate.go:68-119).
    """
    ops: list[dict] = []
    for f in cfg.get("uppercase") or []:
        ops.append({"op": "uppercase", "field": f})
    for f in cfg.get("lowercase") or []:
        ops.append({"op": "lowercase", "field": f})
    if cfg.get("split"):
        ops.append({"op": "split", **cfg["split"]})
    if cfg.get("replace"):
        ops.append({"op": "replace", **cfg["replace"]})
    if cfg.get("merge"):
        ops.append({"op": "merge", **cfg["merge"]})
    if cfg.get("rename"):
        ops.append({"op": "rename", **cfg["rename"]})

    def apply(df: DataFrame) -> DataFrame:
        for o in ops:
            op = o["op"]
            if op == "uppercase":
                df = df.withColumn(o["field"], F.upper(F.col(o["field"])))
            elif op == "lowercase":
                df = df.withColumn(o["field"], F.lower(F.col(o["field"])))
            elif op == "split":
                # literal separator (the reference splits on a literal)
                df = df.withColumn(
                    o["field"],
                    F.split(F.col(o["field"]), o["sep"], -1) if o.get("regex")
                    else F.split(F.col(o["field"]), _rx_escape(o["sep"]), -1),
                )
            elif op == "replace":
                # literal old -> new, new supports %{} templates; escape
                # '$'/'\' in the rendered replacement (Java regex group
                # refs) so the contract stays literal old -> new
                new = F.regexp_replace(
                    logevent.format_expr(df, str(o["new"])), r"([\\$])", r"\\$1"
                )
                df = df.withColumn(
                    o["field"],
                    F.regexp_replace(
                        F.col(o["field"]).cast("string"),
                        _rx_escape(str(o["old"])),
                        new,
                    ),
                )
            elif op == "merge":
                # merge value into a string-array field
                # (reference filter/mutate/filtermutate.go:95-119)
                tgt, val = o["field"], str(o["value"])
                base = (
                    F.when(F.col(tgt).isNull(), F.array())
                    .otherwise(F.col(tgt))
                    if tgt in df.columns
                    else F.array()
                )
                df = df.withColumn(
                    tgt, F.array_union(base.cast("array<string>"), F.array(logevent.format_expr(df, val)))
                )
            elif op == "rename":
                df = df.withColumnRenamed(o["from"], o["to"])
        return apply_common(df, cfg, None)

    return apply


def _rx_escape(s: str) -> str:
    import re

    return re.escape(s)


@register("sql")
def compile_sql(cfg: dict, ctx: Context) -> Stage:
    """Declarative escape hatch: {target_column: sql_expression}.

    The reference's extension point is registering a new Go filter
    (config/filter.go:63-72); ours is a native SQL expression per
    column — still fully inside Catalyst/codegen.
    """
    exprs: dict[str, str] = cfg.get("expr") or {}

    def apply(df: DataFrame) -> DataFrame:
        for target, sql in exprs.items():
            df = df.withColumn(target, F.expr(sql))
        return apply_common(df, cfg, None)

    return apply


@register("typeconv")
def compile_typeconv(cfg: dict, ctx: Context) -> Stage:
    """Cast fields to string/int64/float64 with string-parse fallbacks;
    int-via-float fallback per reference filter/typeconv/filtertypeconv.go:84-114.
    """
    fields = cfg.get("fields") or []
    typ = cfg.get("conv_type", "string")

    def conv(col: Column) -> Column:
        if typ in ("int64", "int", "long"):
            return F.coalesce(
                col.try_cast("long"),
                col.try_cast("double").cast("long"),
            )
        if typ in ("float64", "float", "double"):
            return col.try_cast("double")
        return col.cast("string")

    def apply(df: DataFrame) -> DataFrame:
        for f in fields:
            if f in df.columns:
                df = df.withColumn(f, conv(F.col(f)))
        return apply_common(df, cfg, None)

    return apply


@register("convert")
def compile_convert(cfg: dict, ctx: Context) -> Stage:
    """to_int / to_float with optional multiply factor
    (reference filter/convert/filterconvert.go:63-85).
    """
    fields = cfg.get("fields") or []
    mode = cfg.get("mode", "to_float")
    factor = cfg.get("factor", 1)

    def apply(df: DataFrame) -> DataFrame:
        for f in fields:
            col = F.col(f).try_cast("double") * F.lit(factor)
            if mode == "to_int":
                col = col.cast("long")
            df = df.withColumn(f, col)
        return apply_common(df, cfg, None)

    return apply


@register("add_field")
def compile_add_field(cfg: dict, ctx: Context) -> Stage:
    """Set key to a %{}-formatted value, optional no-overwrite guard
    (reference filter/addfield/filteraddfield.go:47-56).
    """
    key = cfg["key"]
    value = str(cfg["value"])
    overwrite = cfg.get("overwrite", True)
    nested = "." in key or "[" in key  # pathvalue.go path syntax

    def apply(df: DataFrame) -> DataFrame:
        from gogstash_spark.functions.pathvalue import get_path, set_path

        val = logevent.format_expr(df, value)
        if nested:
            cur = get_path(df, key)
            if not overwrite:
                val = F.when(cur.isNull() | (cur.cast("string") == ""), val).otherwise(cur)
            return apply_common(set_path(df, key, val), cfg, None)
        if not overwrite and key in df.columns:
            val = F.when(
                F.col(key).isNull() | (F.col(key).cast("string") == ""), val
            ).otherwise(F.col(key))
        return apply_common(df.withColumn(key, val), cfg, None)

    return apply


@register("remove_field")
def compile_remove_field(cfg: dict, ctx: Context) -> Stage:
    """Remove listed fields; blank message optional
    (reference filter/removefield/filterremovefield.go:56-71).
    """
    fields = cfg.get("fields") or []
    # reference key: remove_message (filterremovefield.go config)
    blank_message = cfg.get("blank_message", cfg.get("remove_message", False))

    def apply(df: DataFrame) -> DataFrame:
        from gogstash_spark.functions.pathvalue import remove_path

        for f in fields:
            if "." in f or "[" in f:  # nested path (pathvalue.go:150-192)
                df = remove_path(df, f)
            elif f in df.columns:
                df = df.drop(f)
        if blank_message:
            df = df.withColumn(logevent.TEXT, F.lit(""))
        return apply_common(df, cfg, None)

    return apply


@register("drop")
def compile_drop(cfg: dict, ctx: Context) -> Stage:
    """Tombstone events (reference filter/drop/filterdrop.go:43-46;
    Drop short-circuits the chain, config/filter.go:132-137).

    In a DataFrame plan a dropped row simply never materializes:
    `condition` limits the drop (the reference nests drop under cond
    for the same effect); no condition drops everything.
    """
    condition = cfg.get("condition")
    guard = ctx.guard

    def apply(df: DataFrame) -> DataFrame:
        drop_pred = cond_to_sql(condition) if condition else "true"
        if guard is not None:
            # inside a cond branch: rows outside the guard always survive;
            # in-guard rows keep the unguarded null semantics (null -> drop)
            return df.filter(
                "(NOT coalesce(%s, false)) OR (NOT (%s))" % (guard, drop_pred)
            )
        if condition:
            return df.filter("NOT (%s)" % drop_pred)
        return df.limit(0)

    return apply


_HASH_ALGOS = {"md5", "sha1", "sha256", "crc32", "xxhash64", "fnv32a", "adler32"}
# digest algorithms the reference supports that have NO faithful
# column-arithmetic mapping here: fail loudly, never silently remap
# (migrating workloads use digests as stable document ids)
_UNSUPPORTED_ALGOS = {"fnv64a", "fnv128a", "murmur3_128"}


def _utf8_bytes(col: Column) -> Column:
    """array<long> of the UTF-8 bytes of a string column (via hex pairs —
    stays entirely in native expressions, no UDF). The hex string is
    STAGED so it is built once per row, not once per byte (the O(n²)
    HOF-inlining trap functions/hof.py documents)."""
    return staged(
        F.hex(F.encode(col, "UTF-8")),
        lambda hx: F.when(
            F.length(hx) > 0,
            F.transform(
                F.sequence(F.lit(1), (F.length(hx) / 2).cast("int")),
                lambda i: F.conv(F.substr(hx, i * 2 - 1, F.lit(2)), 16, 10).cast("long"),
            ),
        ).otherwise(F.array().cast("array<long>")),
    )


def _fnv32a(col: Column) -> Column:
    """FNV-1a 32-bit (reference filter/hash/filterhash.go:73-82 uses
    hash/fnv): h = (h XOR byte) * 16777619 mod 2^32, h0 = 2166136261.
    Pure column arithmetic — products stay under 2^57, no overflow."""
    return F.aggregate(
        _utf8_bytes(col),
        F.lit(2166136261).cast("long"),
        lambda acc, b: F.pmod(acc.bitwiseXOR(b) * F.lit(16777619), F.lit(4294967296)),
    )


def _adler32(col: Column) -> Column:
    """Adler-32 via the closed-form weighted sum: a = 1 + sum(bytes),
    b = n + sum((n-i)*byte_i) [0-based], result = (b mod 65521)*65536 +
    (a mod 65521). Exact for inputs < ~250 MB (sum fits in a long)."""
    def body(bs: Column) -> Column:
        # bs is a staged lambda variable: size() on it is O(1), and the
        # byte array is decoded once per row (not per byte — the O(n²)
        # HOF-inlining trap functions/hof.py documents)
        n = F.size(bs)
        a = F.pmod(
            F.lit(1) + F.aggregate(bs, F.lit(0).cast("long"), lambda x, y: x + y),
            F.lit(65521),
        )
        weighted = F.when(n > 0, F.aggregate(
            F.zip_with(bs, F.sequence(F.lit(0), n - 1), lambda b, i: b * (n.cast("long") - i)),
            F.lit(0).cast("long"),
            lambda x, y: x + y,
        )).otherwise(F.lit(0).cast("long"))
        b = F.pmod(n.cast("long") + weighted, F.lit(65521))
        return b * F.lit(65536) + a

    return staged(_utf8_bytes(col), body)


@register("hash")
def compile_hash(cfg: dict, ctx: Context) -> Stage:
    """Concat source fields, hash, format hex/base64/bigint
    (reference filter/hash/filterhash.go:72-162). fnv32a/adler32 are
    bit-exact column arithmetic; fnv64a/fnv128a/murmur3_128 raise (no
    silent digest remap).
    """
    sources = cfg.get("source") or [logevent.TEXT]
    if isinstance(sources, str):
        sources = [sources]
    algo = cfg.get("algo") or cfg.get("kind", "sha1")  # reference key: kind
    fmt = cfg.get("format", "hex")
    target = cfg.get("target", "hash")
    if algo in _UNSUPPORTED_ALGOS:
        raise ValueError(
            "hash algo %r is not supported (no native mapping); "
            "use one of %s" % (algo, sorted(_HASH_ALGOS))
        )
    if algo not in _HASH_ALGOS:
        raise ValueError("unsupported hash algo %r" % algo)

    def apply(df: DataFrame) -> DataFrame:
        joined = F.concat_ws("", *[F.col(s).cast("string") for s in sources])
        if algo == "md5":
            h = F.md5(joined)
        elif algo == "sha1":
            h = F.sha1(joined)
        elif algo == "sha256":
            h = F.sha2(joined, 256)
        elif algo == "crc32":
            h = F.crc32(joined).cast("string")
        elif algo == "fnv32a":
            v = _fnv32a(joined)
            h = F.lpad(F.lower(F.hex(v)), 8, "0") if fmt == "hex" else v.cast("string")
        elif algo == "adler32":
            v = _adler32(joined)
            h = F.lpad(F.lower(F.hex(v)), 8, "0") if fmt == "hex" else v.cast("string")
        else:
            h = F.xxhash64(joined).cast("string")
        if fmt == "base64" and algo in ("md5", "sha1", "sha256"):
            h = F.base64(F.unhex(h))
        elif fmt == "bigint" and algo in ("md5", "sha1", "sha256"):
            # low 60 bits of the digest as a positive bigint
            h = F.conv(F.substring(h, -15, 15), 16, 10).cast("long")
        return apply_common(df.withColumn(target, h), cfg, None)

    return apply


@register("ratelimit")
@register("rate_limit")  # reference ModuleName (filter/ratelimit)
def compile_ratelimit(cfg: dict, ctx: Context) -> Stage:
    """Batch analog of the token-bucket throttle
    (reference filter/ratelimit/filterratelimit.go:53-88): deterministic
    keyed sampling — keep `keep_num`/`keep_den` of rows by a multiplicative
    hash of `key`, so the sample is stable across engines and retries.
    In streaming the real knob is maxFilesPerTrigger/maxOffsetsPerTrigger.
    """
    key = cfg.get("key", "turn_idx")
    keep_num = int(cfg.get("keep_num", 1))
    keep_den = int(cfg.get("keep_den", 10))
    guard = ctx.guard

    def apply(df: DataFrame) -> DataFrame:
        bucket = F.pmod(
            F.pmod(F.col(key).cast("long") * F.lit(2654435761), F.lit(2**31 - 1)),
            F.lit(keep_den),
        )
        keep = bucket < F.lit(keep_num)
        if guard is not None:
            # inside a cond branch: throttle only the rows the branch owns
            keep = keep | ~F.coalesce(F.expr(guard), F.lit(False))
        return df.filter(keep)

    return apply
