"""Date/time layout translation.

The reference accepts Go reference-time layouts ("2006-01-02 15:04:05")
and joda-time layouts (reference filter/date/filterdate.go:65-69,75-144).
Spark uses java.time DateTimeFormatter patterns, which are a superset of
joda — joda passes through; Go layouts are translated token by token.
"""

from __future__ import annotations

# Ordered: longest tokens first so e.g. "01" does not eat "2006-01".
_GO_TOKENS: list[tuple[str, str]] = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    (".999999999", ".SSSSSSSSS"),
    (".999999", ".SSSSSS"),
    (".999", ".SSS"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("MST", "zzz"),
    ("PM", "a"),
]


def go_layout_to_spark(layout: str) -> str:
    """Translate a Go reference-time layout to a Spark datetime pattern."""
    out: list[str] = []
    i = 0
    n = len(layout)
    while i < n:
        for tok, rep in _GO_TOKENS:
            if layout.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            ch = layout[i]
            # escape letters that would be interpreted as pattern chars
            out.append("'%s'" % ch if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def to_spark_pattern(fmt: str, joda: bool = False) -> str:
    """joda layouts pass through (java.time-compatible); Go gets translated."""
    return fmt if joda else go_layout_to_spark(fmt)
