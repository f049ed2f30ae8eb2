"""Grok pattern compiler: `%{PATTERN:field}` log-parse expressions → plain
regexes executable by Spark (Java regex) AND DuckDB (RE2).

Grok is the lingua franca of log parsing (Logstash/Elastic's pattern
dictionary); the north-star pipeline names "a vectorized grok/regex
claim-and-tool-call parser" as its parse stage. This module is the grok half:
a pattern dictionary + compiler that expands nested `%{NAME}` references into
one anonymous-group regex plus the ordered field list, so a caller renders
`regexp_extract(line, rx, i)` per field — all JVM-side, no UDF.

Only the regex subset common to Java and RE2 is allowed in the dictionary
(no backrefs, no lookbehind), which is also the subset that vectorizes well.
"""

from __future__ import annotations

import re

# Base dictionary — the common Logstash names, restricted to the shared
# Java/RE2 syntax. Nested %{...} references are allowed.
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "QUOTEDSTRING": r'"[^"]*"',
}

_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class GrokError(ValueError):
    pass


def compile_grok(
    expr: str, patterns: dict[str, str] | None = None, max_depth: int = 10
) -> tuple[str, list[str]]:
    """Compile a grok expression to (regex, ordered_field_names).

    Named refs `%{IP:client}` become capture groups in field order; bare refs
    `%{INT}` match without capturing. Everything outside %{...} is taken
    literally (regex-escaped), as grok does."""
    pats = {**BASE_PATTERNS, **(patterns or {})}
    fields: list[str] = []

    def expand(s: str, depth: int) -> str:
        # depth 0 is the user's expression: its plain text is LITERAL (grok
        # semantics) and gets escaped. Dictionary bodies (depth > 0) are
        # already regex and must pass through untouched.
        if depth > max_depth:
            raise GrokError("grok recursion too deep (circular pattern?)")
        lit = re.escape if depth == 0 else (lambda x: x)
        out, last = [], 0
        for m in _REF.finditer(s):
            out.append(lit(s[last : m.start()]))
            name, field = m.group(1), m.group(2)
            if name not in pats:
                raise GrokError(f"unknown grok pattern %{{{name}}}")
            body = expand(pats[name], depth + 1)
            if field:
                fields.append(field)
                out.append(f"({body})")
            else:
                out.append(f"(?:{body})")
            last = m.end()
        out.append(lit(s[last:]))
        return "".join(out)

    rx = expand(expr, 0)
    # capture-group order must equal field order for regexp_extract(_, rx, i):
    # bare refs and dictionary bodies only emit non-capturing groups, so group
    # i IS fields[i-1]. Verify the invariant at compile time.
    n_caps = re.compile(rx).groups
    if n_caps != len(fields):
        raise GrokError(f"capture/field mismatch: {n_caps} groups, {len(fields)} fields")
    return rx, fields


def grok_select_sql(line_col: str, expr: str, dialect: str,
                    patterns: dict[str, str] | None = None) -> list[str]:
    """Render one `regexp_extract(...) AS field` projection per grok field,
    plus a `grok_matched` boolean — rows failing the pattern carry NULL/''
    fields and matched=false (the dead-letter-route predicate).

    Spark string literals eat one backslash level; DuckDB does not. The
    pattern is rendered inside a single-quoted SQL literal, so embedded single
    quotes (a grok matching apostrophes in log text) are ''-doubled — the
    escape both grammars share — and field names must be plain identifiers
    (they become AS aliases verbatim; anything else is an injection vector)."""
    rx, fields = compile_grok(expr, patterns)
    for f in fields:
        if not _IDENT.fullmatch(f):
            raise GrokError(f"grok field name {f!r} is not a valid SQL identifier")
    lit = rx.replace("\\", "\\\\") if dialect == "spark" else rx
    lit = lit.replace("'", "''")
    anchored = f"^{lit}$"
    cols = [
        f"regexp_extract({line_col}, '{anchored}', {i + 1}) AS {f}"
        for i, f in enumerate(fields)
    ]
    if dialect == "spark":
        cols.append(f"({line_col} rlike '{anchored}') AS grok_matched")
    else:
        cols.append(f"regexp_matches({line_col}, '{anchored}') AS grok_matched")
    return cols
