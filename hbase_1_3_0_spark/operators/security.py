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
Both predicates are pure JVM Column expressions (split + higher-order
exists/forall over a broadcast-literal authorization array), evaluated
per cell BEFORE version counting, mirroring the server-side coprocessor
order. No Python UDFs: at 100 TB the security filter stays inside
whole-stage codegen and pushes down with the scan.

Label-expression grammar: the supported subset is OR over AND
(``a|b&c`` = a OR (b AND c)) without parentheses or NOT — the common form
of the reference grammar (ExpressionParser supports full boolean
expressions; the subset is documented as a deviation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Optional cell-metadata column names (the tag analogs).
VISIBILITY_COLUMN = "vis"
ACL_COLUMN = "acl"


def visibility_pred(
    authorizations: tuple[str, ...] | list[str],
    vis_col: str = VISIBILITY_COLUMN,
) -> Column:
    """Cell-visible predicate for a scan holding ``authorizations``.

    An unlabeled cell (NULL expression) is visible to everyone; a labeled
    cell is visible iff some '|'-alternative has all of its '&'-conjunct
    labels in the authorization set (VisibilityLabelFilter semantics)."""
    auth_arr = F.array(*[F.lit(a) for a in authorizations])
    satisfied = F.exists(
        F.split(F.col(vis_col), "\\|"),
        lambda alt: F.forall(
            F.split(alt, "&"),
            lambda lab: F.array_contains(auth_arr, F.trim(lab)),
        ),
    )
    return F.col(vis_col).isNull() | satisfied


def acl_pred(user: str, acl_col: str = ACL_COLUMN) -> Column:
    """Per-cell ACL predicate (ACL_TAG_TYPE=1): a cell with an ACL array is
    readable only by listed principals; a cell without one falls through to
    table/family-level grants (modeled as readable)."""
    return F.col(acl_col).isNull() | F.array_contains(F.col(acl_col), F.lit(user))
