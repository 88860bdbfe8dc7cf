r"""Predicate + projection pushdown export (`filter` CLI).

A generic "select columns where predicate" pass over a parquet corpus,
compiled to a **pyarrow dataset expression** and handed to the scanner
via ``read_parquet(filter=..., columns=...)`` — so row-group min/max
statistics prune whole row groups and non-matching rows are dropped
during the scan, before they ever enter the pipeline or the object
store. At 100 TB this is the difference between "read 2 columns of the
matching 3%" and "read everything, then filter".

The predicate language is deliberately tiny and is parsed by a
recursive-descent parser into ``pyarrow.compute`` field expressions —
never ``eval``:

    expr    := or
    or      := and ("or" and)*
    and     := not ("and" not)*
    not     := "not" not | cmp
    cmp     := "(" expr ")"
             | ident "is" ["not"] "null"
             | ident ["not"] "in" "(" literal ("," literal)* ")"
             | ident ["not"] "matches" "'regex'"
             | ident op literal
    op      := "==" | "!=" | "<=" | ">=" | "<" | ">"
    literal := int | float | "'str'" | '"str"' | true | false

Comparison semantics match SQL WHERE: a comparison against a NULL cell
never matches, ``in``/``not in`` never match a NULL cell (``not in``
conjoins ``is_valid`` because pyarrow's set kernel would otherwise
keep nulls), and only ``is null`` / ``is not null`` test nullness.
``not``/``and``/``or`` are pyarrow's Kleene kernels, which agree with
SQL three-valued logic (e.g. ``not (lang == 'en')`` drops NULL langs:
the inner null propagates through NOT, and a null predicate never
matches).

``matches`` is an unanchored RE2 regex search over a string column
(``url matches '/tag/|/search\?'`` — the URL-pattern filter every
crawl-curation recipe needs), validated against the RE2 engine at
parse time so a bad pattern is a CLI error, not a mid-scan task
failure. NULL cells match neither ``matches`` nor ``not matches``
(the null propagates and a null predicate never keeps a row).
IMPORTANT: inside a ``matches`` literal, backslashes pass through to
RE2 RAW — ``'\.pdf'`` is the escaped-dot regex, ``'\d+'`` matches
digits; only the quote character itself needs escaping (``\'`` /
``\"``). Ordinary string literals (``==``, ``in``) keep the usual
backslash unescaping.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<op><=|>=|==|!=|<|>)
    | (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<comma>,)
    | (?P<float>-?\d+\.\d*(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
    | (?P<int>-?\d+)
    | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not", "in", "is", "null", "true", "false",
             "matches"}


class PredicateError(ValueError):
    """Raised on any syntax or semantic error in a --where string."""


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None or m.end() == pos:
            rest = s[pos:].lstrip()
            if not rest:
                break
            raise PredicateError("can't tokenize %r (at %r)" % (s, rest[:20]))
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "ident" and text.lower() in _KEYWORDS:
            out.append((text.lower(), text))
        else:
            out.append((kind, text))
    return out


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def _unquote_regex(tok: str) -> str:
    """Unquote a ``matches`` pattern literal: ONLY the quote escape is
    processed; every other backslash reaches RE2 intact (``'\\.pdf'``
    must stay the escaped-dot regex — running the general _unquote
    would silently turn it into ``.pdf``, which matches 'xpdf')."""
    body = tok[1:-1]
    return re.sub(r"\\(['\"])", r"\1", body)


class _Parser:
    def __init__(self, s: str):
        self.toks = _tokenize(s)
        self.i = 0
        self.columns: set[str] = set()
        # columns used with 'matches' — filter_read type-checks these
        # against the schema (the regex kernel only exists for strings)
        self.regex_columns: set[str] = set()

    def _peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def _next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise PredicateError("unexpected end of predicate")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, kind: str) -> str:
        k, text = self._next()
        if k != kind:
            raise PredicateError("expected %s, got %r" % (kind, text))
        return text

    def parse(self):
        e = self._or()
        if self.i < len(self.toks):
            raise PredicateError("trailing input after predicate: %r"
                                 % self.toks[self.i][1])
        return e

    def _or(self):
        e = self._and()
        while self._peek() == "or":
            self._next()
            e = e | self._and()
        return e

    def _and(self):
        e = self._not()
        while self._peek() == "and":
            self._next()
            e = e & self._not()
        return e

    def _not(self):
        if self._peek() == "not":
            self._next()
            return ~self._not()
        return self._cmp()

    def _literal(self):
        k, text = self._next()
        if k == "int":
            return int(text)
        if k == "float":
            return float(text)
        if k == "str":
            return _unquote(text)
        if k == "true":
            return True
        if k == "false":
            return False
        raise PredicateError("expected a literal, got %r" % text)

    def _matches_expr(self, f):
        k, text = self._next()
        if k != "str":
            raise PredicateError("'matches' takes a quoted regex, "
                                 "got %r" % text)
        pattern = _unquote_regex(text)
        try:
            # validate against the ACTUAL engine (RE2) so a bad
            # pattern fails at parse time, not inside a scan task;
            # must be a NON-empty array — the kernel short-circuits
            # empty input without ever compiling the pattern
            pc.match_substring_regex(pa.array([""], pa.string()),
                                     pattern)
        except Exception as e:
            raise PredicateError("invalid regex %r: %s" % (pattern, e))
        return pc.match_substring_regex(f, pattern)

    def _in_list(self) -> list:
        self._expect("lparen")
        vals = [self._literal()]
        while self._peek() == "comma":
            self._next()
            vals.append(self._literal())
        self._expect("rparen")
        return vals

    def _cmp(self):
        k, text = self._next()
        if k == "lparen":
            e = self._or()
            self._expect("rparen")
            return e
        if k == "matches":
            # a column may be literally named 'matches' (e.g. a
            # classifier output); in column position the keyword
            # reverts to an identifier
            k = "ident"
        if k != "ident":
            raise PredicateError("expected a column name or '(', got %r"
                                 % text)
        self.columns.add(text)
        f = pc.field(text)
        k2, t2 = self._next()
        if k2 == "is":
            negate = False
            if self._peek() == "not":
                self._next()
                negate = True
            nk, nt = self._next()
            if nk != "null":
                raise PredicateError("expected 'null' after 'is', got %r"
                                     % nt)
            return f.is_valid() if negate else ~f.is_valid()
        if k2 == "not":
            nk, nt = self._next()
            if nk == "matches":
                self.regex_columns.add(text)
                # match_substring_regex propagates NULL (unlike is_in),
                # so the Kleene ~ alone already drops null rows — no
                # is_valid conjunction needed here
                return ~self._matches_expr(f)
            if nk != "in":
                raise PredicateError("expected 'in' or 'matches' "
                                     "after 'not', got %r" % nt)
            # pyarrow's is_in maps NULL → false, so a bare ~isin would
            # KEEP null rows; conjoin is_valid to match SQL NOT IN
            # (null never satisfies it)
            return f.is_valid() & ~f.isin(self._in_list())
        if k2 == "in":
            return f.isin(self._in_list())
        if k2 == "matches":
            self.regex_columns.add(text)
            return self._matches_expr(f)
        if k2 == "op":
            lit = self._literal()
            return {"==": f.__eq__, "!=": f.__ne__, "<": f.__lt__,
                    "<=": f.__le__, ">": f.__gt__, ">=": f.__ge__}[t2](lit)
        raise PredicateError("expected an operator after %r, got %r"
                             % (text, t2))


def parse_predicate(where: str):
    """Compile ``where`` to a pyarrow expression. Returns
    ``(expression, referenced_column_names)``."""
    p = _Parser(where)
    return p.parse(), sorted(p.columns)


def filter_read(paths, where: str, columns: list[str] | None = None):
    """``read_parquet`` with the compiled predicate pushed into the
    scanner and an optional projection. Raises :class:`PredicateError`
    if the predicate references a column the table doesn't have."""
    import pyarrow.dataset as pads
    import ray.data

    p = _Parser(where)
    expr, used = p.parse(), sorted(p.columns)
    schema = pads.dataset(paths).schema
    missing = [c for c in used if c not in schema.names]
    if missing:
        raise PredicateError(
            "predicate references column(s) %s not in the table (has: %s)"
            % (", ".join(missing), ", ".join(schema.names)))
    for c in sorted(p.regex_columns):
        typ = schema.field(c).type
        if not (pa.types.is_string(typ) or pa.types.is_large_string(typ)):
            raise PredicateError(
                "'matches' needs a string column; %r is %s" % (c, typ))
    if columns:
        bad = [c for c in columns if c not in schema.names]
        if bad:
            raise PredicateError(
                "projection column(s) %s not in the table" % ", ".join(bad))
    return ray.data.read_parquet(paths, columns=columns, filter=expr)
