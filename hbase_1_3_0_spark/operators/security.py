"""Cell-level security tags: visibility labels and per-cell ACLs.

Reference: cells carry tags (hbase-common/.../Tag.java; TagType.java:27-33 —
ACL_TAG_TYPE=1, VISIBILITY_TAG_TYPE=2, TTL_TAG_TYPE=8). Visibility labels
are enforced by the VisibilityController coprocessor
(hbase-server/.../security/visibility/VisibilityController.java): a scan
declares its Authorizations (Scan.setAuthorizations) and a labeled cell is
returned only when its label expression is satisfied. Per-cell ACLs are
enforced by the AccessController (security/access/AccessController.java).

Spark model: tags are optional cell-metadata columns on the cell log —
``vis`` (STRING label expression) and ``acl`` (ARRAY<STRING> of principals).
Both predicates are pure JVM Column expressions, evaluated per cell BEFORE
version counting, mirroring the server-side coprocessor order. No Python
UDFs on the data path: at 100 TB the security filter stays inside
whole-stage codegen and pushes down with the scan.

Label-expression grammar (ExpressionParser.java:41): labels, ``&``, ``|``,
``!``, parentheses, and double-quoted labels with backslash escapes.
``&`` and ``|`` have EQUAL precedence and associate LEFT (the stack in
processANDorOROp folds as operators arrive — ``a|b&c`` is ``(a|b)&c``,
NOT ``a|(b&c)``); ``!`` applies to the operand that follows it.

Two evaluation strategies:

- **Flat expressions** (no parens/quotes): evaluated per cell JVM-side by
  a left-to-right fold over the token array — exact reference semantics,
  whole-stage codegen, no driver involvement.
- **Full grammar**: visibility policies are a human-written vocabulary
  (dozens, not millions), so tables can declare them
  (``TableMeta.visibility_policies``). Each declared policy is parsed
  ONCE on the driver by :func:`evaluate_vis_expression` (a faithful port
  of the reference's stack algorithm) and the per-cell predicate becomes
  a broadcast-literal ``isin`` over the satisfied policies — O(1) per
  cell at any scale. Cells whose expression contains parens/quotes but
  is NOT a declared policy are DENIED (fail-closed, the only safe
  posture for a security filter).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Optional cell-metadata column names (the tag analogs).
VISIBILITY_COLUMN = "vis"
ACL_COLUMN = "acl"


# ---------------------------------------------------------------------------
# driver-side exact parser/evaluator (full reference grammar)
# ---------------------------------------------------------------------------


class VisibilityParseError(ValueError):
    """Raised for expressions the reference ExpressionParser would reject."""


def _tokenize_vis(s: str) -> list[tuple[str, str]]:
    """Tokens: ('op', '&'|'|'|'!'), ('paren', '('|')'), ('label', name)."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c in "&|!":
            out.append(("op", c))
            i += 1
        elif c in "()":
            out.append(("paren", c))
            i += 1
        elif c == '"':
            # quoted label with \" and \\ escapes (ExpressionParser.java:66)
            i += 1
            buf = []
            while i < n and s[i] != '"':
                if s[i] == "\\":
                    i += 1
                    if i >= n or s[i] not in ('"', "\\"):
                        raise VisibilityParseError(
                            f"invalid escaping with quotes in {s!r}"
                        )
                buf.append(s[i])
                i += 1
            if i >= n:
                raise VisibilityParseError(f"no terminating quote in {s!r}")
            i += 1
            lbl = "".join(buf).strip()
            if not lbl:
                raise VisibilityParseError(f"empty quoted label in {s!r}")
            out.append(("label", lbl))
        else:
            j = i
            while j < n and s[j] not in '&|!()"' and not s[j].isspace():
                j += 1
            out.append(("label", s[i:j]))
            i = j
    return out


def parse_vis_expression(s: str):
    """Parse a visibility expression into a nested tuple AST:
    ``('label', name)`` / ``('!', node)`` / ``('&'|'|', left, right)``.

    Faithful to the reference's stack algorithm (ExpressionParser.java:41):
    ``&``/``|`` equal precedence, left-associative; ``!`` prefixes the
    following operand; parentheses group."""
    tokens = _tokenize_vis(s.strip())
    if not tokens:
        raise VisibilityParseError("empty expression")

    # stack holds: completed nodes, '(' markers, or pending-op frames
    # ('pending', op, left_or_None)
    stack: list = []

    def attach(node) -> None:
        while stack and isinstance(stack[-1], tuple) and stack[-1][0] == "pending":
            _, op, left = stack.pop()
            if op == "!":
                node = ("!", node)
                continue  # a completed NOT may itself feed an outer pending op
            node = (op, left, node)
        stack.append(node)

    for kind, val in tokens:
        if kind == "label":
            attach(("label", val))
        elif kind == "paren" and val == "(":
            stack.append("(")
        elif kind == "paren" and val == ")":
            if not stack or stack[-1] == "(":
                raise VisibilityParseError(f"empty parens in {s!r}")
            node = stack.pop()
            if not stack or stack[-1] != "(":
                raise VisibilityParseError(f"unbalanced ')' in {s!r}")
            stack.pop()
            attach(node)
        elif val == "!":
            # the reference rejects doubled NOT ('!!a'): processNOTOp
            # throws when the top frame is a NOT still missing its child
            if stack and isinstance(stack[-1], tuple) and stack[-1][:2] == (
                "pending",
                "!",
            ):
                raise VisibilityParseError(f"doubled '!' in {s!r}")
            stack.append(("pending", "!", None))
        else:  # & or |
            if not stack or stack[-1] == "(" or (
                isinstance(stack[-1], tuple) and stack[-1][0] == "pending"
            ):
                raise VisibilityParseError(f"misplaced {val!r} in {s!r}")
            left = stack.pop()
            stack.append(("pending", val, left))
    if len(stack) != 1 or stack[0] == "(" or (
        isinstance(stack[0], tuple) and stack[0][0] == "pending"
    ):
        raise VisibilityParseError(f"error parsing expression {s!r}")
    return stack[0]


def evaluate_vis_expression(s: str, authorizations) -> bool:
    """True iff ``authorizations`` satisfies the expression (exact
    reference grammar — VisibilityExpEvaluator semantics)."""
    auths = set(authorizations)

    def ev(node) -> bool:
        if node[0] == "label":
            return node[1] in auths
        if node[0] == "!":
            return not ev(node[1])
        if node[0] == "&":
            return ev(node[1]) and ev(node[2])
        return ev(node[1]) or ev(node[2])

    return ev(parse_vis_expression(s))


# ---------------------------------------------------------------------------
# per-cell Column predicates
# ---------------------------------------------------------------------------


def _flat_fold_pred(auth_arr: Column, vis: Column) -> Column:
    """Left-to-right fold over a FLAT (paren/quote-free) expression —
    exact equal-precedence left-associative reference semantics as one
    codegen'd ``aggregate`` over the token array. ``!`` may prefix any
    label. Malformed expressions DENY (fail closed), exactly where the
    reference parser would throw: paren/quote chars in a flat context,
    interior '!', and operator-sequence errors — a leading/doubled
    operator ('&a', 'a||b') or a trailing one ('finance&'), the latter
    via the ``need`` operand-expected flag checked after the fold."""
    tokens = F.regexp_extract_all(vis, F.lit("[&|]|[^&|]+"), 0)
    init = F.struct(
        F.lit(False).alias("acc"),
        F.lit("|").alias("op"),
        F.lit(False).alias("bad"),
        F.lit(True).alias("need"),  # an operand is expected next
    )

    def step(st: Column, raw: Column) -> Column:
        tok = F.trim(raw)
        is_and = tok == "&"
        is_or = tok == "|"
        is_op = is_and | is_or
        neg = tok.startswith("!")
        name = F.trim(F.when(neg, F.substring(tok, 2, 1 << 20)).otherwise(tok))
        has = F.array_contains(auth_arr, name)
        val = F.when(neg, ~has).otherwise(has)
        new_acc = F.when(st["op"] == "&", st["acc"] & val).otherwise(
            st["acc"] | val
        )
        malformed = F.when(
            is_op,
            st["need"],  # operator where an operand was expected
        ).otherwise(
            ~st["need"]  # two operands in a row (blank between operators)
            | tok.contains("(")
            | tok.contains(")")
            | tok.contains('"')
            | (F.length(name) == 0)
            | name.contains("!")
            # interior whitespace = two adjacent labels: the reference
            # ExpressionParser ends a label at SPACE, so 'a b' is a
            # ParseException, not one label (surrounding spaces are
            # already legal via the trims above)
            | name.rlike("\\s")
        )
        return F.struct(
            F.when(is_op, st["acc"]).otherwise(new_acc).alias("acc"),
            F.when(is_and, F.lit("&"))
            .when(is_or, F.lit("|"))
            .otherwise(st["op"])
            .alias("op"),
            (st["bad"] | malformed).alias("bad"),
            is_op.alias("need"),
        )

    folded = F.aggregate(tokens, init, step)
    return folded["acc"] & ~folded["bad"] & ~folded["need"]


def visibility_pred(
    authorizations: tuple[str, ...] | list[str],
    vis_col: str = VISIBILITY_COLUMN,
    *,
    policies: tuple[str, ...] | list[str] | None = None,
) -> Column:
    """Cell-visible predicate for a scan holding ``authorizations``.

    An unlabeled cell (NULL expression) is visible to everyone. Flat
    labeled cells evaluate JVM-side with exact reference precedence
    (``a|b&c`` = ``(a|b)&c``, ``!`` supported). Expressions using the
    full grammar (parens/quoted labels) are resolved through
    ``policies`` — the table's declared policy vocabulary, each evaluated
    once on the driver (:func:`evaluate_vis_expression`) and folded into
    a broadcast-literal membership test; a parenthesized/quoted
    expression NOT in the vocabulary is denied (fail closed)."""
    auth_arr = F.array(*[F.lit(a) for a in authorizations])
    vis = F.col(vis_col)
    needs_full = vis.contains("(") | vis.contains(")") | vis.contains('"')
    flat_ok = _flat_fold_pred(auth_arr, vis)
    if policies:
        satisfied = [p for p in policies if evaluate_vis_expression(p, authorizations)]
        full_ok = vis.isin(satisfied) if satisfied else F.lit(False)
    else:
        full_ok = F.lit(False)
    return vis.isNull() | F.when(needs_full, full_ok).otherwise(flat_ok)


def acl_pred(user: str, acl_col: str = ACL_COLUMN) -> Column:
    """Per-cell ACL predicate (ACL_TAG_TYPE=1): a cell with an ACL array is
    readable only by listed principals; a cell without one falls through to
    table/family-level grants (modeled as readable)."""
    return F.col(acl_col).isNull() | F.array_contains(F.col(acl_col), F.lit(user))
