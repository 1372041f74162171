"""gogstash_spark — a PySpark-native log/transcript pipeline engine.

A brand-new engine with the capabilities of tsaikd/gogstash (a Go
Logstash clone: inputs -> filters -> outputs wired from a config file),
re-expressed Spark-first: the pipeline spec compiles to a single lazy
DataFrame DAG, Catalyst plans it, and routing fans out to per-sink
tables with one scan.

Layout:
  logevent    -- event schema + %{} format-string mini-language
  functions/  -- grok translator, cond-expression translator, date formats
  operators/  -- filter compilers (grok, date, json, kv, mutate, ...)
  plans/      -- pipeline spec + compiler (spec -> DataFrame -> DataFrame)
  sources/    -- transcripts generator, readers, lookup tables
  runner      -- end-to-end batch runner: read -> filter -> route -> sinks -> aggs
  streaming/  -- Structured Streaming variant
  mlops/      -- large-scale training-data ops (dedup, ANN, text quality)
"""

__version__ = "0.1.0"
