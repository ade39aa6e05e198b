"""Date-expression DSL.

The reference's only custom language: expressions over two value types
(date, int) with ``@variables``, date literals ``yyyy-MM-dd``, ``+``/``-``
(date +/- days, int arithmetic), and a fixed set of calendar functions.

Behavioral parity target (function set and semantics):
  reference: pramen/core/.../expr/parser/DateExpressionEvaluator.scala:94-230
  reference: pramen/core/.../expr/lexer/Token.scala:24-64

This implementation is an independent tokenizer + recursive-descent parser
(the reference uses a builder-callback evaluator); only the language's
observable behavior is matched.

Examples::

    eval_date_expr("@runDate - 1", runDate=date(2022, 1, 10))
    eval_date_expr("beginOfMonth(minusMonths(@runDate, 1))", ...)
    eval_date_expr("lastSunday(@runDate)", ...)
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import Dict, List, Union

Value = Union[_dt.date, int, str]


class DateExprException(ValueError):
    """Raised on any syntax or type error in a date expression."""


# --- lexer -----------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<date>\d{4}-\d{2}-\d{2})
  | (?P<num>\d+)
  | (?P<var>@[A-Za-z_][A-Za-z0-9_]*)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>[+\-(),])
  | (?P<ws>\s+)
  | (?P<quote>['"])
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str
    pos: int


def _tokenize(expr: str) -> List[_Tok]:
    toks: List[_Tok] = []
    i = 0
    while i < len(expr):
        m = _TOKEN_RE.match(expr, i)
        if not m:
            raise DateExprException(f"Unexpected character {expr[i]!r} at {i} in '{expr}'.")
        kind = m.lastgroup or ""
        if kind == "quote":
            # quotes around date literals are tolerated: '2022-01-01'
            i = m.end()
            continue
        if kind != "ws":
            toks.append(_Tok(kind, m.group(), m.start()))
        i = m.end()
    return toks


# --- calendar helpers ------------------------------------------------------


def _last_weekday(d: _dt.date, iso_weekday: int) -> _dt.date:
    """Most recent date on or before *d* falling on the given ISO weekday
    (1=Monday .. 7=Sunday). Mirrors getLastWeekDay
    (DateExpressionEvaluator.scala:225-231)."""
    delta = (d.isoweekday() - iso_weekday) % 7
    return d - _dt.timedelta(days=delta)


def _last_day_of_month(d: _dt.date, day_of_month: int) -> _dt.date:
    """Most recent date on or before *d* whose day-of-month equals
    *day_of_month* (DateExpressionEvaluator.scala:233-239)."""
    if not 1 <= day_of_month <= 31:
        raise DateExprException(f"Invalid day of month: {day_of_month}.")
    r = d
    guard = 0
    while r.day != day_of_month:
        r -= _dt.timedelta(days=1)
        guard += 1
        if guard > 62:
            raise DateExprException(f"No day {day_of_month} found before {d}.")
    return r


def _plus_months(d: _dt.date, n: int) -> _dt.date:
    """java.time ``LocalDate.plusMonths`` semantics: clamp day to month length."""
    month_index = d.year * 12 + (d.month - 1) + n
    y, m = divmod(month_index, 12)
    m += 1
    if m == 12:
        nxt_first = _dt.date(y + 1, 1, 1)
    else:
        nxt_first = _dt.date(y, m + 1, 1)
    last_day = (nxt_first - _dt.timedelta(days=1)).day
    return _dt.date(y, m, min(d.day, last_day))


def _need_date(v: Value, expr: str) -> _dt.date:
    if isinstance(v, _dt.date):
        return v
    raise DateExprException(f"Expected a date, got {v!r} in '{expr}'.")


def _need_int(v: Value, expr: str) -> int:
    if isinstance(v, int) and not isinstance(v, bool):
        return v
    raise DateExprException(f"Expected a number, got {v!r} in '{expr}'.")


# --- parser / evaluator ----------------------------------------------------


class DateExprEvaluator:
    """Evaluate date expressions against a set of variables.

    Variables are date or int valued; ``@name`` references them. The result
    is a ``datetime.date``, ``int``, or ``str`` (only ``yearMonthOf``
    produces strings).
    """

    def __init__(self, variables: Dict[str, Value] | None = None):
        self.variables: Dict[str, Value] = dict(variables or {})

    def set_var(self, name: str, value: Value) -> None:
        self.variables[name] = value

    def eval(self, expr: str) -> Value:
        toks = _tokenize(expr)
        if not toks:
            raise DateExprException(f"Empty expressions are not supported in '{expr}'.")
        parser = _Parser(toks, self.variables, expr)
        result = parser.parse_expr()
        parser.expect_end()
        return result

    def eval_date(self, expr: str) -> _dt.date:
        v = self.eval(expr)
        return _need_date(v, expr)

    def eval_int(self, expr: str) -> int:
        v = self.eval(expr)
        return _need_int(v, expr)


class _Parser:
    """Recursive-descent: expr := term (('+'|'-') term)* ;
    term := date | num | @var | name '(' expr (',' expr)* ')' | '(' expr ')'"""

    def __init__(self, toks: List[_Tok], variables: Dict[str, Value], expr: str):
        self.toks = toks
        self.i = 0
        self.vars = variables
        self.expr = expr

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise DateExprException(f"Unexpected end of expression in '{self.expr}'.")
        self.i += 1
        return t

    def expect_end(self) -> None:
        if self.i != len(self.toks):
            t = self.toks[self.i]
            raise DateExprException(
                f"Malformed expression: unexpected '{t.text}' at {t.pos} in '{self.expr}'."
            )

    def parse_expr(self) -> Value:
        value = self.parse_term()
        while True:
            t = self._peek()
            if t is None or t.text not in ("+", "-"):
                return value
            self._next()
            rhs = self.parse_term()
            value = self._apply_binop(t.text, value, rhs)

    def _apply_binop(self, op: str, a: Value, b: Value) -> Value:
        # +/-: int+int arithmetic; date+int / int+date = days offset; two
        # dates are an error (DateExpressionEvaluator.scala:100-121).
        a_int = isinstance(a, int) and not isinstance(a, bool)
        b_int = isinstance(b, int) and not isinstance(b, bool)
        if a_int and b_int:
            return a + b if op == "+" else a - b  # type: ignore[operator]
        if isinstance(a, _dt.date) and b_int:
            days = b if op == "+" else -b  # type: ignore[operator]
            return a + _dt.timedelta(days=days)
        if a_int and isinstance(b, _dt.date):
            # int + date => date plus days; int - date => date minus days
            days = a if op == "+" else -a
            return b + _dt.timedelta(days=days) if op == "+" else b - _dt.timedelta(days=a)  # type: ignore[arg-type]
        if isinstance(a, _dt.date) and isinstance(b, _dt.date):
            raise DateExprException(
                f"Cannot {'add' if op == '+' else 'subtract'} 2 dates in '{self.expr}'."
            )
        raise DateExprException(f"Unexpected operand types for '{op}' in '{self.expr}'.")

    def parse_term(self) -> Value:
        t = self._next()
        if t.kind == "date":
            try:
                return _dt.date.fromisoformat(t.text)
            except ValueError as e:
                raise DateExprException(f"Invalid date literal '{t.text}' in '{self.expr}': {e}")
        if t.kind == "num":
            return int(t.text)
        if t.kind == "var":
            name = t.text[1:]
            if name not in self.vars:
                raise DateExprException(f"Unset variable '{name}' used in '{self.expr}'.")
            return self.vars[name]
        if t.kind == "op" and t.text == "(":
            v = self.parse_expr()
            self._expect(")")
            return v
        if t.kind == "name":
            return self._parse_call(t)
        raise DateExprException(f"Unexpected token '{t.text}' at {t.pos} in '{self.expr}'.")

    def _expect(self, text: str) -> None:
        t = self._peek()
        if t is None or t.text != text:
            got = t.text if t else "end of expression"
            raise DateExprException(f"Expected '{text}', got '{got}' in '{self.expr}'.")
        self._next()

    def _parse_call(self, name_tok: _Tok) -> Value:
        name = name_tok.text
        if name not in _FUNCTIONS:
            raise DateExprException(f"Unsupported function '{name}' in '{self.expr}'.")
        self._expect("(")
        args: List[Value] = [self.parse_expr()]
        while True:
            t = self._peek()
            if t is not None and t.text == ",":
                self._next()
                args.append(self.parse_expr())
            else:
                break
        self._expect(")")
        n_args, fn = _FUNCTIONS[name]
        if len(args) != n_args:
            raise DateExprException(
                f"Function '{name}' expects {n_args} argument(s), got {len(args)} in '{self.expr}'."
            )
        return fn(self, args)


def _f(n_args, fn):
    return (n_args, fn)


_FUNCTIONS: Dict[str, tuple] = {
    # DSL arg order preserved; validation per reference semantics.
    "monthOf": _f(1, lambda p, a: _need_date(a[0], p.expr).month),
    "yearOf": _f(1, lambda p, a: _need_date(a[0], p.expr).year),
    "yearMonthOf": _f(
        1, lambda p, a: f"{_need_date(a[0], p.expr).year:04d}-{_need_date(a[0], p.expr).month:02d}"
    ),
    "dayOfMonth": _f(1, lambda p, a: _need_date(a[0], p.expr).day),
    "dayOfWeek": _f(1, lambda p, a: _need_date(a[0], p.expr).isoweekday()),
    "plusDays": _f(
        2, lambda p, a: _need_date(a[0], p.expr) + _dt.timedelta(days=_need_int(a[1], p.expr))
    ),
    "minusDays": _f(
        2, lambda p, a: _need_date(a[0], p.expr) - _dt.timedelta(days=_need_int(a[1], p.expr))
    ),
    "plusWeeks": _f(
        2, lambda p, a: _need_date(a[0], p.expr) + _dt.timedelta(weeks=_need_int(a[1], p.expr))
    ),
    "minusWeeks": _f(
        2, lambda p, a: _need_date(a[0], p.expr) - _dt.timedelta(weeks=_need_int(a[1], p.expr))
    ),
    "plusMonths": _f(
        2, lambda p, a: _plus_months(_need_date(a[0], p.expr), _need_int(a[1], p.expr))
    ),
    "minusMonths": _f(
        2, lambda p, a: _plus_months(_need_date(a[0], p.expr), -_need_int(a[1], p.expr))
    ),
    "beginOfMonth": _f(1, lambda p, a: _need_date(a[0], p.expr).replace(day=1)),
    "endOfMonth": _f(
        1,
        lambda p, a: _plus_months(_need_date(a[0], p.expr), 1).replace(day=1)
        - _dt.timedelta(days=1),
    ),
    "lastDayOfMonth": _f(
        2, lambda p, a: _last_day_of_month(_need_date(a[0], p.expr), _need_int(a[1], p.expr))
    ),
    "lastMonday": _f(1, lambda p, a: _last_weekday(_need_date(a[0], p.expr), 1)),
    "lastTuesday": _f(1, lambda p, a: _last_weekday(_need_date(a[0], p.expr), 2)),
    "lastWednesday": _f(1, lambda p, a: _last_weekday(_need_date(a[0], p.expr), 3)),
    "lastThursday": _f(1, lambda p, a: _last_weekday(_need_date(a[0], p.expr), 4)),
    "lastFriday": _f(1, lambda p, a: _last_weekday(_need_date(a[0], p.expr), 5)),
    "lastSaturday": _f(1, lambda p, a: _last_weekday(_need_date(a[0], p.expr), 6)),
    "lastSunday": _f(1, lambda p, a: _last_weekday(_need_date(a[0], p.expr), 7)),
}


def eval_date_expr(expr: str, **variables: Value) -> Value:
    """Convenience one-shot evaluation: ``eval_date_expr("@runDate - 1",
    runDate=date(2022, 1, 10))``."""
    return DateExprEvaluator(variables).eval(expr)
