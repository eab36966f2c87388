"""PURE text parsers: lambda expressions and the generated-model subset.

The reference delegates all PURE parsing to legend-engine's ANTLR grammar
(``LegendUtils.scala:199-204``).  We implement a small recursive-descent
parser for the exact surface the engine exercises:

* **lambda/query expressions** — ``Entity.all()->filter(x|$x.a > 1)
  ->project([x|$x.b],['b'])``, constraint bodies, derivation bodies.
  Produces the same value-specification JSON AST shape the entities store,
  so one compiler (plans/compiler.py) serves both inputs.
* **model text** — the ###Pure/###Mapping/###Relational sections emitted by
  codegen.py, parsed back into entity dicts (round-trip validation, the
  reference's ``validateModel`` equivalent).
"""

from __future__ import annotations

import re
from typing import Any

from ..model.entities import LegendModelError

Node = dict[str, Any]

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
      (?P<ws>\s+)
    | (?P<arrow>->)
    | (?P<path_sep>::)
    | (?P<op>==|!=|>=|<=|&&|\|\||[><+\-*/!|.,;()\[\]{}=%$])
    | (?P<float>\d+\.\d+)
    | (?P<int>\d+)
    | (?P<string>'(?:[^'\\]|\\.)*')
    | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
""", re.VERBOSE)


def tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise LegendModelError(f"PURE parse error at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


def _mult1() -> dict:
    return {"lowerBound": 1, "upperBound": 1}


def _lit(t: str, v: Any) -> Node:
    return {"_type": t, "values": [v], "multiplicity": _mult1()}


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    # -- token helpers ------------------------------------------------------

    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, value: str) -> bool:
        if self.peek()[1] == value and self.peek()[0] != "string":
            self.i += 1
            return True
        return False

    def expect(self, value: str) -> None:
        kind, v = self.next()
        if v != value or kind == "string":
            raise LegendModelError(f"expected {value!r}, got {v!r}")

    # -- expression grammar --------------------------------------------------

    def parse_expression(self) -> Node:
        return self._or()

    def _or(self) -> Node:
        node = self._and()
        while self.accept("||"):
            node = {"_type": "func", "function": "or",
                    "parameters": [node, self._and()]}
        return node

    def _and(self) -> Node:
        node = self._cmp()
        while self.accept("&&"):
            node = {"_type": "func", "function": "and",
                    "parameters": [node, self._cmp()]}
        return node

    _CMP = {"==": "equal", "!=": "notEqual", ">": "greaterThan",
            ">=": "greaterThanEqual", "<": "lessThan", "<=": "lessThanEqual"}

    def _cmp(self) -> Node:
        node = self._add()
        op = self.peek()[1]
        if op in self._CMP and self.peek()[0] == "op":
            self.next()
            node = {"_type": "func", "function": self._CMP[op],
                    "parameters": [node, self._add()]}
        return node

    def _add(self) -> Node:
        node = self._mul()
        while True:
            if self.accept("+"):
                node = {"_type": "func", "function": "plus",
                        "parameters": [node, self._mul()]}
            elif self.accept("-"):
                node = {"_type": "func", "function": "minus",
                        "parameters": [node, self._mul()]}
            else:
                return node

    def _mul(self) -> Node:
        node = self._unary()
        while True:
            if self.accept("*"):
                node = {"_type": "func", "function": "times",
                        "parameters": [node, self._unary()]}
            elif self.accept("/"):
                node = {"_type": "func", "function": "divide",
                        "parameters": [node, self._unary()]}
            else:
                return node

    def _unary(self) -> Node:
        if self.accept("!"):
            return {"_type": "func", "function": "not",
                    "parameters": [self._unary()]}
        if self.accept("-"):
            kind, v = self.next()
            if kind == "int":
                return _lit("integer", -int(v))
            if kind == "float":
                return _lit("float", -float(v))
            raise LegendModelError("unary minus expects a number literal")
        return self._postfix()

    def _postfix(self) -> Node:
        node = self._primary()
        while True:
            if self.accept("->"):
                kind, fname = self.next()
                if kind != "ident":
                    raise LegendModelError(f"expected function after ->, got {fname!r}")
                self.expect("(")
                params = [node] + self._args()
                node = {"_type": "func", "function": fname, "parameters": params}
            elif self.peek()[1] == "." and self.peek(1)[0] == "ident":
                self.next()
                _, name = self.next()
                if self.accept("("):
                    # method-style call: $x.substring(0, 1) — rare, treat as func
                    params = [node] + self._args()
                    node = {"_type": "func", "function": name,
                            "parameters": params}
                else:
                    node = {"_type": "property", "property": name,
                            "parameters": [node]}
            else:
                return node

    def _args(self) -> list[Node]:
        args: list[Node] = []
        if self.accept(")"):
            return args
        while True:
            args.append(self._lambda_or_expr())
            if self.accept(")"):
                return args
            self.expect(",")

    def _lambda_or_expr(self) -> Node:
        # lambda: ident '|' expr   (also {ident | expr})
        braced = False
        if self.peek()[1] == "{" and self.peek(1)[0] == "ident" and self.peek(2)[1] == "|":
            self.expect("{")
            braced = True
        if self.peek()[0] == "ident" and self.peek(1)[1] == "|":
            _, param = self.next()
            self.next()  # |
            body = self.parse_expression()
            if braced:
                self.expect("}")
            return {"_type": "lambda", "body": [body],
                    "parameters": [{"_type": "var", "name": param}]}
        return self.parse_expression()

    def _primary(self) -> Node:
        kind, v = self.peek()
        if kind == "int":
            self.next()
            return _lit("integer", int(v))
        if kind == "float":
            self.next()
            return _lit("float", float(v))
        if kind == "string":
            self.next()
            return _lit("string", v[1:-1].replace("\\'", "'"))
        if v == "%":
            self.next()
            return self._date_literal()
        if v == "$":
            self.next()
            k2, name = self.next()
            if k2 != "ident":
                raise LegendModelError(f"expected variable name after $, got {name!r}")
            return {"_type": "var", "name": name}
        if v == "[":
            self.next()
            values: list[Node] = []
            if not self.accept("]"):
                while True:
                    values.append(self._lambda_or_expr())
                    if self.accept("]"):
                        break
                    self.expect(",")
            return {"_type": "collection", "values": values,
                    "multiplicity": {"lowerBound": len(values),
                                     "upperBound": len(values)}}
        if v == "(":
            self.next()
            node = self.parse_expression()
            self.expect(")")
            return node
        if kind == "ident":
            return self._ident_expr()
        raise LegendModelError(f"unexpected token {v!r}")

    def _ident_expr(self) -> Node:
        _, name = self.next()
        if name == "true":
            return _lit("boolean", True)
        if name == "false":
            return _lit("boolean", False)
        # qualified path a::b::c
        if self.peek()[1] == "::":
            parts = [name]
            while self.accept("::"):
                parts.append(self.next()[1])
            path = "::".join(parts)
            if self.peek()[1] == "." and self.peek(1)[1] == "all" \
                    and self.peek(2)[1] == "(":
                self.next(); self.next(); self.next()
                self.expect(")")
                return {"_type": "func", "function": "getAll", "parameters": [
                    {"_type": "packageableElementPtr", "fullPath": path}]}
            return {"_type": "packageableElementPtr", "fullPath": path}
        # function call  fn(args)
        if self.accept("("):
            args = self._args()
            return {"_type": "func", "function": name, "parameters": args}
        # bare enum-ish reference (DurationUnit.YEARS handled by postfix '.')
        return {"_type": "packageableElementPtr", "fullPath": name}

    def _date_literal(self) -> Node:
        # %2020-01-01 or %2020-01-01T12:00:00
        parts: list[str] = []
        while self.peek()[0] in ("int", "ident") or self.peek()[1] in ("-", ":", "."):
            parts.append(self.next()[1])
            if self.peek()[1] in (",", ")", "]", "") or self.peek()[0] == "eof":
                break
        text = "".join(parts)
        t = "dateTime" if "T" in text else "strictDate"
        return _lit(t, text)


def parse_expression(text: str) -> Node:
    """Parse one PURE expression (constraint/derivation body) to AST."""
    p = _Parser(tokenize(text))
    node = p.parse_expression()
    if p.peek()[0] != "eof":
        raise LegendModelError(f"trailing input after expression: {p.peek()[1]!r}")
    return node


def parse_lambda(text: str) -> Node:
    """Parse a full query lambda (``Entity.all()->...``) to a lambda node."""
    body = parse_expression(text)
    return {"_type": "lambda", "body": [body], "parameters": []}


# ---------------------------------------------------------------------------
# Model-text parser (the codegen.py output subset)
# ---------------------------------------------------------------------------

_CLASS_RE = re.compile(
    r"Class\s+([\w:]+)(?:\s+extends\s+([\w:]+))?\s*\{(.*?)\}", re.DOTALL)
_FIELD_RE = re.compile(
    r"(?:\{meta::pure::profiles::doc\.doc\s*=\s*'((?:[^'\\]|\\.)*)'\}\s*)?"
    r"(\w+)\s*:\s*([\w:]+)\s*\[(\d+|\*)(?:\.\.(\d+|\*))?\]\s*;")
_MAPPING_RE = re.compile(
    r"Mapping\s+([\w:]+)\s*\(\s*\*([\w:]+)\s*:\s*Relational\s*\{(.*?)\}\s*\)",
    re.DOTALL)
_MAIN_TABLE_RE = re.compile(r"~mainTable\s+\[[\w:]+\](\w+)\.(\w+)")
_PROP_MAP_RE = re.compile(r"(\w+)\s*:\s*\[[\w:]+\]\w+\.\w+\.(\w+)")
_TABLE_RE = re.compile(r"Table\s+(\w+)\s*\((.*?)\)", re.DOTALL)
_SCHEMA_RE = re.compile(r"Schema\s+(\w+)")
_DATABASE_RE = re.compile(r"Database\s+([\w:]+)")


def parse_model_text(text: str) -> list[dict]:
    """Parse generated PURE model text into entity dicts for load_dicts()."""
    sections: dict[str, str] = {}
    current = None
    for chunk in re.split(r"^(###\w+)\s*$", text, flags=re.MULTILINE):
        if chunk.startswith("###"):
            current = chunk[3:]
        elif current:
            sections[current] = sections.get(current, "") + chunk

    entities: list[dict] = []

    for m in _CLASS_RE.finditer(sections.get("Pure", "")):
        fqn, parent, body = m.group(1), m.group(2), m.group(3)
        pkg, _, name = fqn.rpartition("::")
        props = []
        for fm in _FIELD_RE.finditer(body):
            doc, fname, ftype, lb, ub = fm.groups()
            if ub is None:
                ub = lb
            mult: dict[str, Any] = {"lowerBound": 0 if lb == "*" else int(lb)}
            if ub != "*":
                mult["upperBound"] = int(ub)
            p: dict[str, Any] = {"name": fname, "type": ftype,
                                 "multiplicity": mult}
            if doc:
                p["taggedValues"] = [{"tag": {"value": "doc"}, "value": doc}]
            props.append(p)
        entities.append({"content": {
            "_type": "class", "package": pkg, "name": name,
            "superTypes": [parent] if parent else [],
            "properties": props, "qualifiedProperties": [], "constraints": []}})

    for m in _MAPPING_RE.finditer(sections.get("Mapping", "")):
        fqn, cls, body = m.group(1), m.group(2), m.group(3)
        pkg, _, name = fqn.rpartition("::")
        mt = _MAIN_TABLE_RE.search(body)
        schema_name, table_name = (mt.group(1), mt.group(2)) if mt else ("", "")
        body_after_main = body[mt.end():] if mt else body
        prop_maps = [
            {"_type": "relationalPropertyMapping",
             "property": {"class": cls, "property": pm.group(1)},
             "relationalOperation": {"_type": "column", "column": pm.group(2)}}
            for pm in _PROP_MAP_RE.finditer(body_after_main)]
        entities.append({"content": {
            "_type": "mapping", "package": pkg, "name": name,
            "classMappings": [{
                "_type": "relational", "class": cls,
                "mainTable": {"_type": "Table", "schema": schema_name,
                              "table": table_name},
                "propertyMappings": prop_maps}]}})

    rel = sections.get("Relational", "")
    if rel:
        dbm = _DATABASE_RE.search(rel)
        scm = _SCHEMA_RE.search(rel)
        if dbm and scm:
            pkg, _, name = dbm.group(1).rpartition("::")
            tables = []
            for tm in _TABLE_RE.finditer(rel):
                cols = []
                for line in tm.group(2).split(","):
                    parts = line.split()
                    if len(parts) >= 2:
                        cols.append({"name": parts[0],
                                     "type": {"_type": parts[1]}})
                tables.append({"name": tm.group(1), "columns": cols})
            entities.append({"content": {
                "_type": "relational", "package": pkg, "name": name,
                "schemas": [{"name": scm.group(1), "tables": tables}]}})

    return entities


def validate_model(text: str) -> bool:
    """Parse + reload generated PURE text (reference ``validateModel``)."""
    from ..model.loader import load_dicts
    try:
        model = load_dicts(parse_model_text(text))
        return bool(model.classes)
    except Exception:
        return False
