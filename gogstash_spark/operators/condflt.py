"""The cond filter: predicate -> nested filter list, else -> else_filter
(reference filter/cond/filtercond.go:112-178).

Spark-first realization: split the frame on the predicate, run each
branch's compiled chain on its slice, unionByName back (rows are
unordered until the sink pins (conv_id, turn_idx), so a union is
semantically exact). Catalyst sees two filtered scans of the same
subtree and prunes each branch's plan independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gogstash_spark.functions.conds import cond_to_sql
from gogstash_spark.operators import Context, Stage, apply_common, register


@register("cond")
def compile_cond(cfg: dict, ctx: Context) -> Stage:
    from gogstash_spark.operators import compile_chain  # cycle-safe

    pred_sql = cond_to_sql(cfg["condition"])
    then_chain = compile_chain(cfg.get("filter") or [], ctx)
    else_chain = compile_chain(cfg.get("else_filter") or [], ctx)
    has_else = bool(cfg.get("else_filter"))

    def apply(df: DataFrame) -> DataFrame:
        t = then_chain(df.filter(pred_sql))
        f = df.filter("NOT coalesce(%s, false)" % pred_sql)
        if has_else:
            f = else_chain(f)
        out = t.unionByName(f, allowMissingColumns=True)
        return apply_common(out, cfg, None)

    return apply
