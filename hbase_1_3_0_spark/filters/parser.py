"""ParseFilter DSL — the filter string language of the HBase shell/REST/Thrift.

Reference: ParseFilter.java:52 (parseFilterString:112,
parseSimpleFilterExpression:235; 18 registered filters in filterHashMap at
:61-96; operator precedence SKIP/WHILE > AND > OR). Examples:

    (RowFilter (=, 'binary:abc')) AND PageFilter (10)
    SKIP ValueFilter (>=, 'long:10')
    SingleColumnValueFilter ('d', 'q', =, 'substring:x', true, true)

Comparators are ``'type:value'`` strings: binary, binaryprefix, regexstring,
substring (ParseFilter.createComparator) — plus engine extensions ``long``
(8-byte BE), ``longutf8`` (canonical decimal string values), ``null``.
Quote escaping: ``''`` inside a quoted string is a literal quote.
"""

from __future__ import annotations

import re

from hbase_1_3_0_spark.filters import ast

_OPS = {
    "<": ast.CompareOp.LESS,
    "<=": ast.CompareOp.LESS_OR_EQUAL,
    "=": ast.CompareOp.EQUAL,
    "!=": ast.CompareOp.NOT_EQUAL,
    ">=": ast.CompareOp.GREATER_OR_EQUAL,
    ">": ast.CompareOp.GREATER,
}

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<string>'(?:[^']|'')*')
      | (?P<op><=|>=|!=|<|>|=)
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "SKIP", "WHILE"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"ParseFilter: bad syntax at {s[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "name" and text.upper() in _KEYWORDS:
            tokens.append((text.upper(), text))
        elif kind == "string":
            tokens.append(("string", text[1:-1].replace("''", "'")))
        else:
            tokens.append((kind, text))
    tokens.append(("eof", ""))
    return tokens


def _compare_op(op: str) -> str:
    """ParseFilter.createCompareOp analog: only the seven CompareOp
    names are legal at parse time — anything else (the reference test's
    quoted ``'>>'``, TestParseFilter.java:511) is rejected here rather
    than surfacing later as a compiler error."""
    if op in _VALID_OPS:
        return op
    raise ValueError(f"ParseFilter: invalid compare operator {op!r}")


_VALID_OPS = frozenset(
    (ast.CompareOp.LESS, ast.CompareOp.LESS_OR_EQUAL, ast.CompareOp.EQUAL,
     ast.CompareOp.NOT_EQUAL, ast.CompareOp.GREATER_OR_EQUAL,
     ast.CompareOp.GREATER, ast.CompareOp.NO_OP)
)


def _comparator(spec: str) -> ast.Comparator:
    kind, _, val = spec.partition(":")
    kind = kind.lower()
    if kind == "binary":
        return ast.BinaryComparator(val.encode())
    if kind == "binaryprefix":
        return ast.BinaryPrefixComparator(val.encode())
    if kind == "regexstring":
        return ast.RegexStringComparator(val)
    if kind == "substring":
        return ast.SubstringComparator(val)
    if kind == "long":
        return ast.LongComparator(int(val), codec="be8")
    if kind == "longutf8":
        return ast.LongComparator(int(val), codec="utf8")
    if kind == "null":
        return ast.NullComparator()
    raise ValueError(f"ParseFilter: unknown comparator type {kind!r}")


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise ValueError(f"ParseFilter: expected {kind}, got {k} {v!r}")
        return v

    # precedence: OR < AND < SKIP/WHILE (ParseFilter.java precedence rules)
    def parse_or(self) -> ast.Filter:
        left = self.parse_and()
        parts = [left]
        while self.peek()[0] == "OR":
            self.next()
            parts.append(self.parse_and())
        return parts[0] if len(parts) == 1 else ast.FilterList("MUST_PASS_ONE", parts)

    def parse_and(self) -> ast.Filter:
        parts = [self.parse_unary()]
        while self.peek()[0] == "AND":
            self.next()
            parts.append(self.parse_unary())
        return parts[0] if len(parts) == 1 else ast.FilterList("MUST_PASS_ALL", parts)

    def parse_unary(self) -> ast.Filter:
        k, _ = self.peek()
        if k == "SKIP":
            self.next()
            return ast.SkipFilter(self.parse_unary())
        if k == "WHILE":
            self.next()
            return ast.WhileMatchFilter(self.parse_unary())
        if k == "lparen":
            self.next()
            inner = self.parse_or()
            self.expect("rparen")
            return inner
        return self.parse_filter()

    def parse_args(self) -> list:
        args: list = []
        if self.peek()[0] != "lparen":
            return args
        self.next()
        while self.peek()[0] != "rparen":
            k, v = self.next()
            if k == "string":
                args.append(v)
            elif k == "number":
                args.append(float(v) if "." in v else int(v))
            elif k == "op":
                args.append(_OPS[v])
            elif k == "name":
                if v.lower() in ("true", "false"):
                    args.append(v.lower() == "true")
                else:
                    args.append(v)
            else:
                raise ValueError(f"ParseFilter: unexpected arg token {k} {v!r}")
            if self.peek()[0] == "comma":
                self.next()
        self.expect("rparen")
        return args

    def parse_filter(self) -> ast.Filter:
        name = self.expect("name")
        args = self.parse_args()
        return _construct(name, args)


def _construct(name: str, a: list) -> ast.Filter:  # noqa: C901
    n = name.lower()
    if n == "keyonlyfilter":
        return ast.KeyOnlyFilter(*([bool(a[0])] if a else []))
    if n == "firstkeyonlyfilter":
        return ast.FirstKeyOnlyFilter()
    if n == "prefixfilter":
        return ast.PrefixFilter(a[0].encode())
    if n == "columnprefixfilter":
        return ast.ColumnPrefixFilter(a[0].encode())
    if n == "multiplecolumnprefixfilter":
        return ast.MultipleColumnPrefixFilter([x.encode() for x in a])
    if n == "columncountgetfilter":
        return ast.ColumnCountGetFilter(int(a[0]))
    if n == "pagefilter":
        return ast.PageFilter(int(a[0]))
    if n == "columnpaginationfilter":
        return ast.ColumnPaginationFilter(int(a[0]), int(a[1]))
    if n == "inclusivestopfilter":
        return ast.InclusiveStopFilter(a[0].encode())
    if n == "timestampsfilter":
        return ast.TimestampsFilter([int(x) for x in a])
    if n in ("rowfilter", "familyfilter", "qualifierfilter", "valuefilter"):
        cls = {
            "rowfilter": ast.RowFilter,
            "familyfilter": ast.FamilyFilter,
            "qualifierfilter": ast.QualifierFilter,
            "valuefilter": ast.ValueFilter,
        }[n]
        return cls(op=_compare_op(a[0]), comparator=_comparator(a[1]))
    if n == "columnrangefilter":
        return ast.ColumnRangeFilter(
            a[0].encode() if a[0] else None,
            bool(a[1]),
            a[2].encode() if a[2] else None,
            bool(a[3]),
        )
    if n in ("singlecolumnvaluefilter", "singlecolumnvalueexcludefilter"):
        cls = (
            ast.SingleColumnValueFilter
            if n == "singlecolumnvaluefilter"
            else ast.SingleColumnValueExcludeFilter
        )
        kwargs = {}
        if len(a) > 4:
            kwargs["filter_if_missing"] = bool(a[4])
        if len(a) > 5:
            kwargs["latest_version_only"] = bool(a[5])
        return cls(
            a[0], a[1].encode(), _compare_op(a[2]), _comparator(a[3]),
            **kwargs,
        )
    if n == "dependentcolumnfilter":
        if len(a) <= 3:
            return ast.DependentColumnFilter(
                a[0], a[1].encode(), bool(a[2]) if len(a) > 2 else False
            )
        return ast.DependentColumnFilter(
            a[0], a[1].encode(), bool(a[2]), _compare_op(a[3]),
            _comparator(a[4])
        )
    if n == "randomrowfilter":
        return ast.RandomRowFilter(float(a[0]), int(a[1]) if len(a) > 1 else 42)
    raise ValueError(f"ParseFilter: unknown filter {name!r}")


def parse_filter(s: str) -> ast.Filter:
    """Parse a filter DSL string into a Filter AST."""
    p = _Parser(_tokenize(s))
    out = p.parse_or()
    if p.peek()[0] != "eof":
        raise ValueError(f"ParseFilter: trailing input at token {p.peek()!r}")
    return out


# ---------------------------------------------------------------------------
# serializer: Filter AST -> DSL string, the inverse of parse_filter
# ---------------------------------------------------------------------------

def _q(s: str) -> str:
    """Quote a DSL string argument; '' escapes a literal quote."""
    return "'" + s.replace("'", "''") + "'"


_OP_STR = {v: k for k, v in _OPS.items()}


def _bstr(x: bytes) -> str:
    """Decode a byte argument for the shell DSL, or raise: the DSL can
    only spell UTF-8 text, and a lossy 'replace' decode would round-trip
    to a DIFFERENT filter instead of failing loudly."""
    try:
        return x.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(
            f"to_dsl: byte argument {x!r} is not valid UTF-8 and cannot be "
            "expressed in the shell filter DSL"
        ) from e


def _comparator_str(c: ast.Comparator) -> str:
    if isinstance(c, ast.BinaryComparator):
        return _q("binary:" + _bstr(c.value))
    if isinstance(c, ast.BinaryPrefixComparator):
        return _q("binaryprefix:" + _bstr(c.value))
    if isinstance(c, ast.RegexStringComparator):
        return _q("regexstring:" + c.pattern)
    if isinstance(c, ast.SubstringComparator):
        return _q("substring:" + c.substr)
    if isinstance(c, ast.LongComparator):
        kind = "long" if c.codec == "be8" else "longutf8"
        return _q(f"{kind}:{c.value}")
    if isinstance(c, ast.NullComparator):
        return _q("null:")
    raise ValueError(f"to_dsl: unsupported comparator {c!r}")


def to_dsl(f: ast.Filter) -> str:  # noqa: C901
    """Serialize a Filter AST back to the ParseFilter DSL such that
    ``parse_filter(to_dsl(f)) == f`` for the DSL-expressible surface
    (string-safe byte args; BitComparator/FuzzyRow/MultiRowRange carry raw
    bytes the shell DSL cannot spell and raise; non-UTF-8 byte args in
    any filter raise rather than silently decoding lossily)."""
    b = _bstr
    if isinstance(f, ast.FilterList):
        joiner = " AND " if f.operator == "MUST_PASS_ALL" else " OR "
        return "(" + joiner.join(to_dsl(x) for x in f.filters) + ")"
    if isinstance(f, ast.SkipFilter):
        return "SKIP " + to_dsl(f.wrapped)
    if isinstance(f, ast.WhileMatchFilter):
        return "WHILE " + to_dsl(f.wrapped)
    if isinstance(f, ast.SingleColumnValueExcludeFilter):
        return (
            f"SingleColumnValueExcludeFilter ({_q(f.family)}, "
            f"{_q(b(f.qualifier))}, {_OP_STR[f.op]}, "
            f"{_comparator_str(f.comparator)}, "
            f"{str(f.filter_if_missing).lower()}, "
            f"{str(f.latest_version_only).lower()})"
        )
    if isinstance(f, ast.SingleColumnValueFilter):
        return (
            f"SingleColumnValueFilter ({_q(f.family)}, {_q(b(f.qualifier))}, "
            f"{_OP_STR[f.op]}, {_comparator_str(f.comparator)}, "
            f"{str(f.filter_if_missing).lower()}, "
            f"{str(f.latest_version_only).lower()})"
        )
    if isinstance(f, ast.DependentColumnFilter):
        base = f"{_q(f.family)}, {_q(b(f.qualifier))}, " \
               f"{str(f.drop_dependent_column).lower()}"
        if f.op is not None:
            base += f", {_OP_STR[f.op]}, {_comparator_str(f.comparator)}"
        return f"DependentColumnFilter ({base})"
    for cls, name in (
        (ast.RowFilter, "RowFilter"),
        (ast.FamilyFilter, "FamilyFilter"),
        (ast.QualifierFilter, "QualifierFilter"),
        (ast.ValueFilter, "ValueFilter"),
    ):
        if type(f) is cls:
            return f"{name} ({_OP_STR[f.op]}, {_comparator_str(f.comparator)})"
    if isinstance(f, ast.PrefixFilter):
        return f"PrefixFilter ({_q(b(f.prefix))})"
    if isinstance(f, ast.ColumnPrefixFilter):
        return f"ColumnPrefixFilter ({_q(b(f.prefix))})"
    if isinstance(f, ast.MultipleColumnPrefixFilter):
        args = ", ".join(_q(b(p)) for p in f.prefixes)
        return f"MultipleColumnPrefixFilter ({args})"
    if isinstance(f, ast.ColumnRangeFilter):
        return (
            f"ColumnRangeFilter ({_q(b(f.min_column)) if f.min_column else _q('')}, "
            f"{str(f.min_inclusive).lower()}, "
            f"{_q(b(f.max_column)) if f.max_column else _q('')}, "
            f"{str(f.max_inclusive).lower()})"
        )
    if isinstance(f, ast.ColumnPaginationFilter):
        return f"ColumnPaginationFilter ({f.limit}, {f.offset})"
    if isinstance(f, ast.ColumnCountGetFilter):
        return f"ColumnCountGetFilter ({f.limit})"
    if isinstance(f, ast.PageFilter):
        return f"PageFilter ({f.page_size})"
    if isinstance(f, ast.InclusiveStopFilter):
        return f"InclusiveStopFilter ({_q(b(f.stop_row))})"
    if isinstance(f, ast.TimestampsFilter):
        return f"TimestampsFilter ({', '.join(str(t) for t in f.timestamps)})"
    if isinstance(f, ast.KeyOnlyFilter):
        return f"KeyOnlyFilter ({str(f.len_as_val).lower()})"
    if isinstance(f, ast.FirstKeyOnlyFilter):
        return "FirstKeyOnlyFilter ()"
    if isinstance(f, ast.RandomRowFilter):
        return f"RandomRowFilter ({f.chance}, {f.seed})"
    raise ValueError(f"to_dsl: filter not expressible in the DSL: {f!r}")
