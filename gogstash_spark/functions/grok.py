"""Grok pattern library + %{NAME:field:type} -> regex translation.

Semantics follow the reference grok filter
(reference filter/grok/filtergrok.go:60-117): patterns are compiled at
plan time, matched in order (first hit wins), named captures become
fields, ':int'/':float' suffixes type the capture, and a no-match adds
an error tag.

The translator emits dialect-neutral regexes (no backrefs, no
lookaround) so the same pattern text works in Python `re` (pandas UDF
path), Java regex (native Spark regexp_extract path) and RE2 (DuckDB
oracle). Named-group syntax differs per dialect, so we return the
capture list and splice in the requested group syntax.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Core pattern library (subset of the standard grok base patterns the
# reference ships via vjeantet/grok; each kept RE2-compatible).
BASE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"[+-]?\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"%{BASE10NUM}",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"\"[^\"]*\"|'[^']*'",
    "QS": r"%{QUOTEDSTRING}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"%{IPV4}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "MONTH": r"Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"\d{4}",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:[:.,]\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "ISO8601_TIMEZONE": r"Z|[+-]%{HOUR}(?::?%{MINUTE})",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{HTTPTZ}",
    "HTTPTZ": r"[+-]\d{4}",
    "LOGLEVEL": r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?",
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{NOTSPACE:ident} %{NOTSPACE:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NUMBER:response:int} (?:%{NUMBER:bytes:int}|-)"
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    # --- numbers / ids ---
    "POSINT": r"\b[1-9]\d*\b",
    "NONNEGINT": r"\b\d+\b",
    "BOOL": r"true|false",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "BASE16NUM": r"(?:0[xX])?[0-9A-Fa-f]+",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    # simplified, RE2-safe IPv6 (full+compressed forms, no zone index)
    "IPV6": r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:)*:(?:[0-9A-Fa-f]{1,4}:)*[0-9A-Fa-f]{1,4}|::",
    # --- paths / uris ---
    "UNIXPATH": r"(?:/[\w.+$%-]+)+/?",
    "WINPATH": r"(?:[A-Za-z]:)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_&-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    # --- dates / times ---
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATESTAMP": r"(?:%{DATE_US}|%{DATE_EU})[- ]%{TIME}",
    "DAY": r"Mon|Tue|Wed|Thu|Fri|Sat|Sun",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    # --- syslog ---
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid:int}\])?",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility:int}.%{NONNEGINT:priority:int}>",
    "SYSLOGLINE": r"%{SYSLOGBASE} %{GREEDYDATA:message}",
    # --- misc ---
    "WORD_BOUNDARY": r"\b",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w\[\]\.@]+))?(?::(\w+))?\}")


@dataclass
class CompiledGrok:
    """A grok pattern translated to a plain regex with positional captures."""

    source: str
    regex: str                       # capture groups are plain (...)
    captures: list[str] = field(default_factory=list)   # group i+1 -> field name
    types: dict[str, str] = field(default_factory=dict)  # field -> int|float

    def named(self, style: str = "python") -> str:
        """Regex with named groups: style 'python' (?P<n>..) or 'java' (?<n>..)."""
        out = self.regex
        for i, name in enumerate(self.captures):
            tag = "(?P<%s>" % name if style == "python" else "(?<%s>" % name
            out = out.replace("(?:__CAP%d__" % i, tag, 1)
        return out

    def positional(self) -> str:
        out = self.regex
        for i in range(len(self.captures)):
            out = out.replace("(?:__CAP%d__" % i, "(", 1)
        return out

    def group_index(self, name: str) -> int:
        return self.captures.index(name) + 1


def compile_grok(pattern: str, extra_patterns: dict[str, str] | None = None) -> CompiledGrok:
    """Expand %{NAME[:field[:type]]} references into one flat regex.

    Unnamed references expand to non-capturing groups; named references
    become capture groups recorded in order. Duplicate field names keep
    the first occurrence (later dups become non-capturing).
    """
    lib = dict(BASE_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)

    captures: list[str] = []
    types: dict[str, str] = {}

    def expand(pat: str, depth: int = 0) -> str:
        if depth > 20:
            raise ValueError("grok pattern recursion too deep: %r" % pattern)

        def sub(m: re.Match) -> str:
            name, fld, typ = m.group(1), m.group(2), m.group(3)
            if name not in lib:
                raise KeyError("unknown grok pattern %%{%s}" % name)
            if fld:
                safe = re.sub(r"\W", "_", fld)
                if typ:
                    types[safe] = typ
                if safe in captures:
                    return "(?:%s)" % expand(lib[name], depth + 1)
                # reserve the capture slot BEFORE expanding, so positional
                # group order == textual open-paren order even when the
                # referenced pattern itself contains named captures
                captures.append(safe)
                idx = len(captures) - 1
                inner = expand(lib[name], depth + 1)
                # placeholder spliced into dialect syntax later; written as
                # a valid group opener so nesting stays balanced
                return "(?:__CAP%d__%s))" % (idx, "(?:" + inner)
            return "(?:%s)" % expand(lib[name], depth + 1)

        return _GROK_REF.sub(sub, pat)

    expanded = expand(pattern)
    return CompiledGrok(source=pattern, regex=expanded, captures=captures, types=types)
