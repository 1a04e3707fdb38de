"""SQL text front-end for the engine's predicate language.

The DML/scan surface speaks DNF tuples
(``[("turn_idx", "between", (35, 39)), ...]`` — see
``pipelines/dml._check_pred``), but the reference's users speak SQL:
its consumers query the lake through Athena (``Instructions.md:122-131``)
and ``catalog.py`` already gives read-side SQL over committed state.
This module closes the write/scan-side gap: a self-contained
tokenizer + recursive-descent parser from SQL boolean expressions
(and the DELETE/UPDATE/SELECT statement shells around them) to the
exact structure the statements already take — no new predicate
evaluator, so SQL text inherits the zone-map + Bloom pruning and the
vectorized batch kernels unchanged.

Supported WHERE grammar (ANSI subset matching the engine's ops):

    expr      := or_expr
    or_expr   := and_expr (OR and_expr)*
    and_expr  := unary (AND unary)*
    unary     := NOT unary | '(' expr ')' | comparison
    comparison:= col (= | == | != | <> | < | <= | > | >=) literal
               | col [NOT] BETWEEN literal AND literal
               | col [NOT] IN '(' literal (',' literal)* ')'
    literal   := number | 'string' ('' escapes) | TRUE | FALSE
               | TIMESTAMP 'string' | DATE 'string'

``NOT`` is normalized away (op negation / De Morgan), the tree is
distributed to DNF with a group-count cap (pathological ORs must fail
loudly, not shuffle a combinatorial predicate to every file), and the
result plugs straight into ``delete_where`` / ``update_where`` /
``scan_where`` / ``read_where``. NULL semantics note: the engine's
predicate language is SQL-like already (NULL never matches a
comparison), so ``NOT (x = 1)`` becomes ``x != 1`` — identical to SQL
for non-null x, and NULL rows match neither side, exactly as DuckDB
evaluates ``NOT coalesce(x = 1, FALSE)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["parse_where", "parse_statement", "SqlParseError"]

_MAX_DNF_GROUPS = 64


class SqlParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><=|>=|<>|!=|==|=|<|>)
      | (?P<punct>[(),;])
      | (?P<word>[A-Za-z_][A-Za-z_0-9.]*)
      | (?P<star>\*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "and", "or", "not", "between", "in", "true", "false", "null",
    "timestamp", "date", "select", "from", "where", "delete", "update",
    "set", "limit", "is",
}


@dataclass
class _Tok:
    kind: str  # num | str | op | punct | word | star | end
    text: str


def _tokenize(sql: str) -> list[_Tok]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            if sql[pos:].strip() == "":
                break
            raise SqlParseError(f"cannot tokenize at: {sql[pos:pos + 20]!r}")
        pos = m.end()
        for kind in ("num", "str", "op", "punct", "word", "star"):
            text = m.group(kind)
            if text is not None:
                out.append(_Tok(kind, text))
                break
    out.append(_Tok("end", ""))
    return out


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    # -- token helpers -------------------------------------------------
    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def kw(self, *words: str) -> bool:
        """Consume the keyword if it is next (case-insensitive)."""
        t = self.peek()
        if t.kind == "word" and t.text.lower() in words:
            self.next()
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.kw(word):
            raise SqlParseError(f"expected {word.upper()}, got {self.peek().text!r}")

    def expect_punct(self, ch: str) -> None:
        t = self.next()
        if t.kind != "punct" or t.text != ch:
            raise SqlParseError(f"expected {ch!r}, got {t.text!r}")

    # -- literals ------------------------------------------------------
    def literal(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            return float(t.text) if "." in t.text else int(t.text)
        if t.kind == "str":
            self.next()
            return t.text[1:-1].replace("''", "'")
        if t.kind == "word":
            w = t.text.lower()
            if w in ("true", "false"):
                self.next()
                return w == "true"
            if w in ("timestamp", "date"):
                self.next()
                s = self.next()
                if s.kind != "str":
                    raise SqlParseError(f"{w.upper()} needs a quoted literal")
                return s.text[1:-1].replace("''", "'")
            if w == "null":
                raise SqlParseError(
                    "NULL literals are not comparable; the engine follows "
                    "SQL (a NULL column value never matches any predicate)"
                )
        raise SqlParseError(f"expected a literal, got {t.text!r}")

    # -- boolean expression -> AST ------------------------------------
    # AST: ("cmp", col, op, val) | ("and", [..]) | ("or", [..])
    def expr(self):
        node = self.and_expr()
        parts = [node]
        while self.kw("or"):
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def and_expr(self):
        node = self.unary()
        parts = [node]
        while self.kw("and"):
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def unary(self):
        if self.kw("not"):
            return _negate(self.unary())
        if self.peek().kind == "punct" and self.peek().text == "(":
            self.next()
            node = self.expr()
            self.expect_punct(")")
            return node
        return self.comparison()

    def comparison(self):
        t = self.next()
        if t.kind != "word" or t.text.lower() in _KEYWORDS:
            raise SqlParseError(f"expected a column name, got {t.text!r}")
        col = t.text
        if self.kw("is"):
            raise SqlParseError(
                "IS [NOT] NULL is not supported: the engine's predicate "
                "language has no null test (filter nulls with the DQ "
                "quarantine, or project and test downstream)"
            )
        negated = self.kw("not")
        if self.kw("between"):
            lo = self.literal()
            self.expect_kw("and")
            hi = self.literal()
            node = ("cmp", col, "between", (lo, hi))
            return _negate(node) if negated else node
        if self.kw("in"):
            self.expect_punct("(")
            vals = [self.literal()]
            while self.peek().kind == "punct" and self.peek().text == ",":
                self.next()
                vals.append(self.literal())
            self.expect_punct(")")
            node = ("cmp", col, "in", vals)
            return _negate(node) if negated else node
        if negated:
            raise SqlParseError("NOT must precede BETWEEN or IN here")
        op_tok = self.next()
        if op_tok.kind != "op":
            raise SqlParseError(f"expected an operator, got {op_tok.text!r}")
        op = {"=": "==", "<>": "!="}.get(op_tok.text, op_tok.text)
        return ("cmp", col, op, self.literal())


_NEG_OP = {"==": "!=", "!=": "==", "<": ">=", ">=": "<", ">": "<=", "<=": ">"}


def _negate(node):
    kind = node[0]
    if kind == "and":
        return ("or", [_negate(n) for n in node[1]])
    if kind == "or":
        return ("and", [_negate(n) for n in node[1]])
    _, col, op, val = node
    if op in _NEG_OP:
        return ("cmp", col, _NEG_OP[op], val)
    if op == "between":
        lo, hi = val
        return ("or", [("cmp", col, "<", lo), ("cmp", col, ">", hi)])
    if op == "in":
        return ("and", [("cmp", col, "!=", v) for v in val])
    raise SqlParseError(f"cannot negate op {op!r}")  # pragma: no cover


def _to_dnf(node) -> list[list[tuple]]:
    """Distribute the AST to OR-of-ANDs of (col, op, val) tuples."""
    kind = node[0]
    if kind == "cmp":
        return [[(node[1], node[2], node[3])]]
    if kind == "or":
        out = []
        for n in node[1]:
            out.extend(_to_dnf(n))
            if len(out) > _MAX_DNF_GROUPS:
                raise SqlParseError(
                    f"predicate expands past {_MAX_DNF_GROUPS} OR groups; "
                    "rewrite (e.g. as IN lists) or split the statement"
                )
        return out
    # and: cartesian product of the children's DNF groups
    groups: list[list[tuple]] = [[]]
    for n in node[1]:
        child = _to_dnf(n)
        groups = [g + c for g in groups for c in child]
        if len(groups) > _MAX_DNF_GROUPS:
            raise SqlParseError(
                f"predicate expands past {_MAX_DNF_GROUPS} OR groups; "
                "rewrite (e.g. as IN lists) or split the statement"
            )
    return groups


def parse_where(sql: str) -> list:
    """SQL boolean expression text -> the engine's predicate structure:
    a single conjunction ``[(col, op, val), ...]`` when there is no OR,
    else a DNF list of conjunction groups (what ``_check_pred``
    accepts either way)."""
    p = _Parser(sql)
    node = p.expr()
    if p.peek().kind != "end" and p.peek().text != ";":
        raise SqlParseError(f"trailing input at {p.peek().text!r}")
    dnf = _to_dnf(node)
    return dnf[0] if len(dnf) == 1 else dnf


def parse_statement(sql: str) -> dict:
    """Parse a full statement shell. Returns one of

    - ``{"kind": "delete", "table": t, "where": pred}``
    - ``{"kind": "update", "table": t, "set": {col: scalar}, "where": pred}``
    - ``{"kind": "select", "table": t, "columns": [..] | None,
        "where": pred | None, "limit": int | None}``

    The table name is returned for the caller to resolve (the engine
    addresses lakes by directory, ``catalog.py`` by registered name).
    UPDATE assignments are scalar literals (the Python API takes
    vectorized callables; SQL expressions are out of scope)."""
    p = _Parser(sql)
    if p.kw("delete"):
        p.expect_kw("from")
        table = p.next()
        if table.kind != "word":
            raise SqlParseError("expected a table name after FROM")
        p.expect_kw("where")
        where = p.expr()
        _expect_end(p)
        return {"kind": "delete", "table": table.text,
                "where": _pred(where)}
    if p.kw("update"):
        table = p.next()
        if table.kind != "word":
            raise SqlParseError("expected a table name after UPDATE")
        p.expect_kw("set")
        assignments = {}
        while True:
            col = p.next()
            if col.kind != "word" or col.text.lower() in _KEYWORDS:
                raise SqlParseError(f"expected a column name, got {col.text!r}")
            eq = p.next()
            if eq.kind != "op" or eq.text not in ("=", "=="):
                raise SqlParseError(f"expected '=', got {eq.text!r}")
            if p.kw("null"):
                assignments[col.text] = None
            else:
                assignments[col.text] = p.literal()
            if p.peek().kind == "punct" and p.peek().text == ",":
                p.next()
                continue
            break
        p.expect_kw("where")
        where = p.expr()
        _expect_end(p)
        return {"kind": "update", "table": table.text, "set": assignments,
                "where": _pred(where)}
    if p.kw("select"):
        cols: list[str] | None = []
        if p.peek().kind == "star":
            p.next()
            cols = None
        else:
            while True:
                c = p.next()
                if c.kind != "word" or c.text.lower() in _KEYWORDS:
                    raise SqlParseError(
                        f"expected a column name, got {c.text!r}"
                    )
                cols.append(c.text)
                if p.peek().kind == "punct" and p.peek().text == ",":
                    p.next()
                    continue
                break
        p.expect_kw("from")
        table = p.next()
        if table.kind != "word":
            raise SqlParseError("expected a table name after FROM")
        where = None
        if p.kw("where"):
            where = p.expr()
        limit = None
        if p.kw("limit"):
            n = p.next()
            if n.kind != "num" or "." in n.text:
                raise SqlParseError("LIMIT takes an integer")
            limit = int(n.text)
        _expect_end(p)
        return {"kind": "select", "table": table.text, "columns": cols,
                "where": _pred(where) if where is not None else None,
                "limit": limit}
    raise SqlParseError(
        f"expected DELETE / UPDATE / SELECT, got {p.peek().text!r}"
    )


def _pred(node) -> list:
    dnf = _to_dnf(node)
    return dnf[0] if len(dnf) == 1 else dnf


def _expect_end(p: _Parser) -> None:
    if p.peek().kind == "punct" and p.peek().text == ";":
        p.next()
    if p.peek().kind != "end":
        raise SqlParseError(f"trailing input at {p.peek().text!r}")
