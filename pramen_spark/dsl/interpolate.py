"""String interpolation of date expressions into SQL / filter templates.

Supported template forms (behavioral parity with the reference's
``StringUtils.replaceFormattedDateExpression``,
pramen/core/.../utils/StringUtils.scala:246-363):

- ``@var``              -> value of variable, ISO for dates
- ``@var%pattern%``     -> date variable formatted with a java-style pattern
- ``@{expr}``           -> evaluated date expression, ISO / int
- ``@{expr}%pattern%``  -> evaluated date expression, formatted
- unknown ``@name``     -> left verbatim in the output

Used by filter rendering and JDBC query templating, e.g.::

    replace_formatted_date_expression(
        "SELECT * FROM t WHERE snap = date'@{@infoDate - 1}'", ev)
"""

from __future__ import annotations

import datetime as _dt
import re

from pramen_spark.dsl.dateexpr import DateExprEvaluator, DateExprException

_IDENT = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_"

# java DateTimeFormatter pattern subset -> python strftime pieces
_JAVA_TOKENS = [
    ("yyyy", "%Y"),
    ("yy", "%y"),
    ("MMMM", "%B"),
    ("MMM", "%b"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("EEEE", "%A"),
    ("EEE", "%a"),
    ("DDD", "%j"),
]


def format_date_java(d: _dt.date, pattern: str) -> str:
    """Format a date with a subset of java DateTimeFormatter patterns
    (yyyy, yy, MM, M, dd, d, MMM, MMMM, EEE, EEEE, DDD + literals)."""
    out = []
    i = 0
    while i < len(pattern):
        for tok, py in _JAVA_TOKENS:
            if pattern.startswith(tok, i):
                out.append(d.strftime(py))
                i += len(tok)
                break
        else:
            c = pattern[i]
            if c == "M":
                out.append(str(d.month))
            elif c == "d":
                out.append(str(d.day))
            elif c == "y":
                out.append(str(d.year))
            elif c == "'":
                # quoted literal section
                j = pattern.find("'", i + 1)
                if j == -1:
                    raise ValueError(f"Unterminated quote in pattern '{pattern}'")
                out.append(pattern[i + 1 : j] if j > i + 1 else "'")
                i = j
            else:
                out.append(c)
            i += 1
    return "".join(out)


def _render(value, pattern: str | None, template: str) -> str:
    if pattern is None:
        return str(value)
    if not isinstance(value, _dt.date):
        raise ValueError(f"Cannot format non-date value {value!r} in template '{template}'.")
    return format_date_java(value, pattern)


def replace_formatted_date_expression(template: str, evaluator: DateExprEvaluator) -> str:
    """Replace ``@var``, ``@var%fmt%``, ``@{expr}`` and ``@{expr}%fmt%``
    occurrences in *template* using *evaluator*'s variables."""
    out = []
    i = 0
    n = len(template)
    while i < n:
        c = template[i]
        if c != "@":
            out.append(c)
            i += 1
            continue
        # @{expr} form
        if i + 1 < n and template[i + 1] == "{":
            j = template.find("}", i + 2)
            if j == -1:
                raise ValueError(f"No matching '}}' in the date expression: {template}")
            expr = template[i + 2 : j]
            i = j + 1
            pattern = None
            if i < n and template[i] == "%":
                k = template.find("%", i + 1)
                if k == -1:
                    raise ValueError(
                        f"No matching '%' in the formatted date expression: {template}"
                    )
                pattern = template[i + 1 : k]
                i = k + 1
            try:
                value = evaluator.eval(expr)
            except DateExprException as e:
                raise ValueError(f"Syntax error in SQL expression: {template}") from e
            out.append(_render(value, pattern, template))
            continue
        # @var form
        j = i + 1
        while j < n and template[j] in _IDENT:
            j += 1
        name = template[i + 1 : j]
        if not name or name not in evaluator.variables:
            # unknown variable: copy verbatim (reference leaves it untouched)
            out.append(template[i:j])
            i = j
            continue
        i = j
        pattern = None
        if i < n and template[i] == "%":
            k = template.find("%", i + 1)
            if k == -1:
                raise ValueError(f"No matching '%' in the formatted date expression: {template}")
            pattern = template[i + 1 : k]
            i = k + 1
        out.append(_render(evaluator.variables[name], pattern, template))
    return "".join(out)
