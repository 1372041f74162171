"""Pipeline spec: the engine's "query language".

The reference's query IS its config file — `Config{InputRaw, FilterRaw,
OutputRaw}` (reference config/config.go:33-37), JSON or YAML with
comment stripping (config/util.go:88-106). Our spec mirrors that shape
and compiles to one DataFrame DAG.

    input:
      type: parquet | table
      path: ...
    filter:
      - {type: grok, match: [...], ...}
      - {type: date, source: timestamp, format: [...]}
    output:
      - {type: table, name: sink_errors, condition: "status >= 500"}
      - type: cond
        condition: "role == 'tool'"
        output: [{type: table, name: sink_tool_calls}]
        else_output: [{type: table, name: sink_rest}]
    aggregate:
      - {name: counts, group_by: [tool], time_bucket: hour}
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any


@dataclass
class PipelineSpec:
    input: dict[str, Any] = field(default_factory=dict)
    filter: list[dict[str, Any]] = field(default_factory=list)
    output: list[dict[str, Any]] = field(default_factory=list)
    aggregate: list[dict[str, Any]] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineSpec":
        return cls(
            input=d.get("input") or {},
            filter=list(d.get("filter") or []),
            output=list(d.get("output") or []),
            aggregate=list(d.get("aggregate") or []),
        )

    @classmethod
    def load(cls, path: str) -> "PipelineSpec":
        with open(path) as f:
            raw = f.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml  # type: ignore

                return cls.from_dict(yaml.safe_load(raw))
            except ImportError as e:
                raise RuntimeError("yaml not available; use JSON spec") from e
        # strip // and # comment lines, as the reference does
        # (reference config/util.go:88-106)
        cleaned = re.sub(r"^\s*(//|#).*$", "", raw, flags=re.M)
        return cls.from_dict(json.loads(cleaned))
