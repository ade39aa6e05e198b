"""Minimal HOCON-subset parser (no external dependency).

Pramen workflows are HOCON files (README.md: `pramen.operations`,
`pramen.metastore.tables`, ...). The container has no pyhocon, so this
implements the subset those workflow files actually use:

- ``key = value`` and ``key: value`` (``=``/``:`` optional before ``{``)
- nested objects ``{...}``, dotted keys (``a.b.c = 1`` -> nesting)
- arrays ``[...]`` of scalars/objects, comma or newline separated
- quoted strings (double), unquoted strings, ints, floats, booleans, null
- ``//`` and ``#`` comments
- later duplicate object keys merge into earlier ones (HOCON object merge)
- ``include file("x.conf")`` / ``include "x.conf"`` / ``include
  required(file("x.conf"))`` (round 12, for the reference's multi-file
  example layouts — e.g. pramen/examples/jdbc_sourcing/
  daily_ingestion.conf:14-17): the included file's root object merges at
  the include point, paths resolve relative to the INCLUDING file,
  cycles are detected, and a missing non-``required`` include is
  silently skipped per the HOCON spec. File-based loads only —
  ``loads`` on a bare string has no directory to resolve against.
- ``${path}`` / ``${?path}`` substitutions in value position, including
  adjacent-token string concatenation (``"MyEnv "${pramen.run.type}``,
  the reference examples' common.conf:16 shape). Lookups resolve
  against the FINAL merged root (after includes and ``overrides``);
  an unresolved ``${path}`` raises, an unresolved ``${?path}`` drops
  the key (or contributes "" inside a concatenation). ``overrides`` to
  :func:`load`/:func:`loads` is the ``-Dkey=value`` system-property
  equivalent the JVM reference resolves ``pramen.run.type`` from.
- triple-quoted multi-line strings (round 12; verbatim content, spec
  excess-quote closing rule — the reference's Hive DDL templates in
  examples/enceladus_single_config use them).

NOT supported (rejected loudly rather than misparsed): ``url()``/
``classpath()`` includes, ``+=``, ``$`` inside unquoted scalars. When
pyhocon IS available it is preferred (full spec) unless ``overrides``
are passed (pyhocon has no system-property hook).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple


class HoconError(ValueError):
    pass


class _Subst:
    """A ``${path}`` marker, resolved against the final merged root."""

    __slots__ = ("path", "optional")

    def __init__(self, path: str, optional: bool):
        self.path = path
        self.optional = optional


class _Concat(list):
    """Adjacent value tokens on one line, joined as strings at resolve
    time (HOCON value concatenation)."""


_MISSING = object()


def loads(
    text: str,
    base_dir: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    if base_dir is None and not overrides:
        try:  # full parser when available
            import pyhocon  # type: ignore

            return pyhocon.ConfigFactory.parse_string(text).as_plain_ordered_dict()
        except ImportError:
            pass
    p = _Parser(text, base_dir=base_dir)
    obj = p.parse_root()
    _apply_overrides(obj, overrides)
    _resolve_tree(obj)
    return obj


def load(path: str, overrides: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = os.path.abspath(path)
    if not overrides:
        try:
            import pyhocon  # type: ignore

            return pyhocon.ConfigFactory.parse_file(path).as_plain_ordered_dict()
        except ImportError:
            pass
    with open(path) as f:
        text = f.read()
    p = _Parser(text, base_dir=os.path.dirname(path), seen=frozenset({path}))
    obj = p.parse_root()
    _apply_overrides(obj, overrides)
    _resolve_tree(obj)
    return obj


def _apply_overrides(obj: Dict[str, Any], overrides: Optional[Dict[str, Any]]) -> None:
    for k, v in (overrides or {}).items():
        _assign(obj, str(k).split("."), v)


class _Parser:
    def __init__(
        self,
        text: str,
        base_dir: Optional[str] = None,
        seen: frozenset = frozenset(),
    ):
        self.text = text
        self.pos = 0
        self.n = len(text)
        self.base_dir = base_dir
        self.seen = seen  # absolute include paths on the current chain

    # --- low-level ---

    def _err(self, msg: str) -> HoconError:
        line = self.text.count("\n", 0, self.pos) + 1
        return HoconError(f"{msg} at line {line}")

    def _peek(self) -> str:
        return self.text[self.pos] if self.pos < self.n else ""

    def _skip_ws_and_comments(self, skip_newlines: bool = True) -> None:
        while self.pos < self.n:
            c = self.text[self.pos]
            if c in " \t\r" or (skip_newlines and c == "\n"):
                self.pos += 1
            elif c == "#" or self.text.startswith("//", self.pos):
                while self.pos < self.n and self.text[self.pos] != "\n":
                    self.pos += 1
            else:
                break

    # --- grammar ---

    def parse_root(self) -> Dict[str, Any]:
        self._skip_ws_and_comments()
        if self._peek() == "{":
            obj = self.parse_object()
        else:
            obj = self.parse_object_body(root=True)
        self._skip_ws_and_comments()
        if self.pos < self.n:
            raise self._err(f"Unexpected trailing content {self.text[self.pos:self.pos+20]!r}")
        return obj

    def parse_object(self) -> Dict[str, Any]:
        assert self._peek() == "{"
        self.pos += 1
        obj = self.parse_object_body(root=False)
        if self._peek() != "}":
            raise self._err("Expected '}'")
        self.pos += 1
        return obj

    def parse_object_body(self, root: bool) -> Dict[str, Any]:
        obj: Dict[str, Any] = {}
        while True:
            self._skip_ws_and_comments()
            if self.pos >= self.n:
                if not root:
                    raise self._err("Unexpected end of input in object")
                return obj
            if self._peek() == "}":
                if root:
                    raise self._err("Unexpected '}'")
                return obj
            if self._peek() == ",":
                self.pos += 1
                continue
            key = self.parse_key()
            if key == "include":
                self._handle_include(obj)
                continue
            self._skip_ws_and_comments(skip_newlines=False)
            if self.text.startswith("+=", self.pos):
                raise self._err("HOCON '+=' is not supported by the built-in parser")
            if self._peek() in "=:":
                self.pos += 1
                self._skip_ws_and_comments(skip_newlines=False)
                value = self.parse_value()
            elif self._peek() == "{":
                value = self.parse_object()
            else:
                raise self._err(f"Expected '=', ':' or '{{' after key {key!r}")
            _assign(obj, key.split("."), value)

    def _handle_include(self, obj: Dict[str, Any]) -> None:
        """``include file("x")`` / ``include "x"`` / ``include
        required(file("x"))``: parse the target, load it relative to the
        including file, and merge its root object at this point."""
        self._skip_ws_and_comments(skip_newlines=False)
        required = False
        closing = 0
        if self.text.startswith("required(", self.pos):
            required = True
            closing += 1
            self.pos += len("required(")
            self._skip_ws_and_comments(skip_newlines=False)
        if self.text.startswith(("url(", "classpath("), self.pos):
            raise self._err(
                "only file() includes are supported by the built-in parser"
            )
        if self.text.startswith("file(", self.pos):
            closing += 1
            self.pos += len("file(")
            self._skip_ws_and_comments(skip_newlines=False)
        if self._peek() != '"':
            raise self._err("Expected a quoted path after 'include'")
        rel = self.parse_quoted()
        for _ in range(closing):
            self._skip_ws_and_comments(skip_newlines=False)
            if self._peek() != ")":
                raise self._err("Expected ')' in include")
            self.pos += 1
        if self.base_dir is None:
            raise self._err(
                "include requires a file-based load (loads() has no "
                "directory to resolve against)"
            )
        path = os.path.abspath(os.path.join(self.base_dir, rel))
        if path in self.seen:
            raise self._err(f"include cycle via {rel!r}")
        if not os.path.exists(path):
            if required:
                raise self._err(f"required include not found: {rel!r}")
            return  # HOCON spec: a missing plain include is skipped
        with open(path) as f:
            text = f.read()
        sub = _Parser(
            text,
            base_dir=os.path.dirname(path),
            seen=self.seen | {path},
        )
        included = sub.parse_root()
        for k, v in included.items():
            _assign(obj, [k], v)

    def parse_key(self) -> str:
        self._skip_ws_and_comments()
        if self._peek() == '"':
            return self.parse_quoted()
        start = self.pos
        while self.pos < self.n and self.text[self.pos] not in " \t\r\n=:{}[],#":
            self.pos += 1
        if start == self.pos:
            raise self._err("Expected a key")
        return self.text[start : self.pos]

    def parse_value(self) -> Any:
        self._skip_ws_and_comments(skip_newlines=False)
        c = self._peek()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_array()
        # scalar position: a sequence of immediately-adjacent tokens
        # (quoted string / ${subst} / unquoted chunk) concatenates into
        # one string value — the `"MyEnv "${pramen.run.type}` shape
        tokens: List[Tuple[str, Any]] = []  # (kind q|u|s, value)
        while True:
            c = self._peek()
            if c == '"':
                if self.text.startswith('"""', self.pos):
                    tokens.append(("q", self._parse_triple_quoted()))
                else:
                    tokens.append(("q", self.parse_quoted()))
            elif c == "$":
                tokens.append(("s", self._parse_subst()))
            elif c and c not in "\n,]}#" and not self.text.startswith("//", self.pos):
                # unquoted chunk: read to end-of-line / comma / closing
                # bracket / comment / the start of a ${subst} or quoted
                # string. Whitespace is KEPT — HOCON preserves interior
                # whitespace between concatenated tokens ('foo ${x}' is
                # 'foo <x>', not 'foo<x>'); only the whole value's outer
                # edges are trimmed below.
                start = self.pos
                while self.pos < self.n and self.text[self.pos] not in '\n,]}#$"':
                    if self.text.startswith("//", self.pos):
                        break
                    self.pos += 1
                tokens.append(("u", self.text[start : self.pos]))
            else:
                break
        if not tokens or (len(tokens) == 1 and tokens[0][0] == "u"
                          and not tokens[0][1].strip()):
            raise self._err("Expected a value")
        # Trim the value's outer edges FIRST and drop edge tokens that
        # become empty, so '${x} \n' (sole substitution + trailing
        # whitespace) still resolves type-preserving instead of passing
        # through _Concat and stringifying (ADVICE r13).
        if tokens[0][0] == "u":
            tokens[0] = ("u", tokens[0][1].lstrip())
        if tokens[-1][0] == "u":
            tokens[-1] = ("u", tokens[-1][1].rstrip())
        tokens = [t for t in tokens if not (t[0] == "u" and t[1] == "")]
        if len(tokens) == 1:
            kind, v = tokens[0]
            return _coerce(v.strip()) if kind == "u" else v
        return _Concat(v for k, v in tokens)

    def _parse_triple_quoted(self) -> str:
        """HOCON multi-line string: content between \"\"\" pairs taken
        verbatim (no escape processing); per the spec, when the closing
        run has more than three quotes the excess quotes belong to the
        string content (the reference's Hive DDL templates in
        examples/enceladus_single_config use this form)."""
        assert self.text.startswith('"""', self.pos)
        end = self.text.find('"""', self.pos + 3)
        if end < 0:
            raise self._err("Unterminated triple-quoted string")
        while end + 3 < self.n and self.text[end + 3] == '"':
            end += 1
        s = self.text[self.pos + 3 : end]
        self.pos = end + 3
        return s

    def _parse_subst(self) -> "_Subst":
        assert self._peek() == "$"
        if not self.text.startswith("${", self.pos):
            raise self._err("'$' outside ${substitution} is not supported")
        self.pos += 2
        optional = self._peek() == "?"
        if optional:
            self.pos += 1
        start = self.pos
        while self.pos < self.n and self.text[self.pos] not in "}\n":
            self.pos += 1
        if self._peek() != "}":
            raise self._err("Unterminated ${substitution}")
        path = self.text[start : self.pos].strip()
        self.pos += 1
        if not path:
            raise self._err("Empty ${substitution}")
        return _Subst(path, optional)

    def parse_array(self) -> List[Any]:
        assert self._peek() == "["
        self.pos += 1
        out: List[Any] = []
        while True:
            self._skip_ws_and_comments()
            if self.pos >= self.n:
                raise self._err("Unexpected end of input in array")
            if self._peek() == "]":
                self.pos += 1
                return out
            if self._peek() == ",":
                self.pos += 1
                continue
            out.append(self.parse_value())

    def parse_quoted(self) -> str:
        assert self._peek() == '"'
        self.pos += 1
        out: List[str] = []
        while self.pos < self.n:
            c = self.text[self.pos]
            if c == '"':
                self.pos += 1
                return "".join(out)
            if c == "\\":
                self.pos += 1
                esc = self.text[self.pos] if self.pos < self.n else ""
                out.append({"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}.get(esc, esc))
                self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise self._err("Unterminated string")


def _assign(obj: Dict[str, Any], path: List[str], value: Any) -> None:
    cur = obj
    for part in path[:-1]:
        nxt = cur.get(part)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[part] = nxt
        cur = nxt
    last = path[-1]
    if isinstance(value, dict) and isinstance(cur.get(last), dict):
        _merge(cur[last], value)  # HOCON object merge
    else:
        cur[last] = value


def _merge(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _resolve_tree(root: Dict[str, Any]) -> None:
    """Resolve every ``_Subst``/``_Concat`` marker in place against the
    final merged ``root`` (post-include, post-override — matching the
    reference's resolve-after-merge order, so a substitution sees values
    from sibling include files and ``-D``-style overrides)."""
    stack: set = set()

    def lookup(path: str) -> Any:
        cur: Any = root
        for part in path.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return _MISSING
            cur = cur[part]
        return resolve(cur)

    def resolve(v: Any) -> Any:
        if isinstance(v, _Subst):
            if v.path in stack:
                raise HoconError(f"substitution cycle via ${{{v.path}}}")
            stack.add(v.path)
            try:
                got = lookup(v.path)
            finally:
                stack.discard(v.path)
            if got is _MISSING:
                if v.optional:
                    return _MISSING
                raise HoconError(f"unresolved substitution ${{{v.path}}}")
            return got
        if isinstance(v, _Concat):
            parts = []
            for t in v:
                r = resolve(t)
                parts.append("" if r in (_MISSING, None) else str(r))
            return "".join(parts)
        return v

    def walk(node: Any) -> None:
        if isinstance(node, dict):
            drop = []
            for k, val in node.items():
                if isinstance(val, (_Subst, _Concat)):
                    r = resolve(val)
                    if r is _MISSING:
                        drop.append(k)  # unresolved ${?path}: key vanishes
                    else:
                        node[k] = r
                elif isinstance(val, (dict, list)):
                    walk(val)
            for k in drop:
                del node[k]
        elif isinstance(node, list):
            for i, val in enumerate(node):
                if isinstance(val, (_Subst, _Concat)):
                    r = resolve(val)
                    node[i] = None if r is _MISSING else r
                elif isinstance(val, (dict, list)):
                    walk(val)

    walk(root)


def _coerce(raw: str) -> Any:
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw
