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

NOT supported (rejected loudly rather than misparsed): ``include``,
``${substitutions}``, triple-quoted strings, ``+=``. When pyhocon IS
available it is preferred (full spec).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple


class HoconError(ValueError):
    pass


def loads(text: str) -> Dict[str, Any]:
    try:  # full parser when available
        import pyhocon  # type: ignore

        return pyhocon.ConfigFactory.parse_string(text).as_plain_ordered_dict()
    except ImportError:
        pass
    p = _Parser(text)
    return p.parse_root()


def load(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return loads(f.read())


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.n = len(text)

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
                raise self._err("HOCON 'include' is not supported by the built-in parser")
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
        if c == '"':
            if self.text.startswith('"""', self.pos):
                raise self._err("Triple-quoted strings are not supported by the built-in parser")
            s = self.parse_quoted()
            return s
        if c == "$":
            raise self._err("${substitution} is not supported by the built-in parser")
        # unquoted scalar: read to end-of-line / comma / closing bracket
        start = self.pos
        while self.pos < self.n and self.text[self.pos] not in "\n,]}#":
            if self.text.startswith("//", self.pos):
                break
            self.pos += 1
        raw = self.text[start : self.pos].strip()
        if raw == "":
            raise self._err("Expected a value")
        return _coerce(raw)

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
