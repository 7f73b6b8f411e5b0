"""AccessController table/namespace/global grant model — the ACL layer
ABOVE the per-cell ACLs already in operators/security.py.

Reference:
- TableAuthManager.java:419-459 authorizeUser — global and namespace
  authorizations supersede table level; each level consults the user's
  own grants then every group's.
- TablePermission.java:215-235 implies — a family-scoped grant never
  matches a family-less request (and same for qualifier); a NULL grant
  field is the wildcard.
- Permission.java:48 Action enum (READ/WRITE/EXEC/CREATE/ADMIN).
- AccessController.java:299-345 permissionGranted — op-level check
  over a families map: a table-level grant short-circuits; otherwise
  EVERY requested family must pass at family level, or failing that,
  every requested qualifier of that family at qualifier level.

Data model (all metadata-scale, broadcast everywhere):
- ``grants``: (subject, namespace, table_name, family, qualifier,
  action). ``subject`` is a user name or ``@group``. Scope is encoded
  by NULLs exactly as the reference's AccessControlLists rows:
  global = namespace AND table NULL; namespace = namespace set, table
  NULL; table = table set, family/qualifier optionally narrowing.
- ``memberships``: (user, group_name) — the user-to-@group expansion
  (the reference asks the Hadoop group mapping; here it is a table).

Scale shape: grants x memberships expand driver-free into a per-user
grant table that BROADCASTS; the request stream joins it once and is
never shuffled — mirroring the reference's in-memory permission cache
consulted per RPC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ACTIONS", "authorize", "op_permission_granted"]

ACTIONS = ("READ", "WRITE", "EXEC", "CREATE", "ADMIN")

_REQ_COLS = (
    "req_id", "user", "namespace", "table_name", "family", "qualifier",
    "action",
)


def _subject_grants(grants: DataFrame, memberships: DataFrame) -> DataFrame:
    """Expand @group grants to their member users (one row per user x
    grant); user-directed grants pass through. Output columns are
    g_-prefixed so request joins never collide."""
    cols = [
        F.col("namespace").alias("g_ns"),
        F.col("table_name").alias("g_tbl"),
        F.col("family").alias("g_fam"),
        F.col("qualifier").alias("g_qual"),
        F.col("action").alias("g_act"),
    ]
    user_grants = grants.where(~F.col("subject").startswith("@")).select(
        F.col("subject").alias("g_user"), *cols
    )
    group_grants = (
        grants.where(F.col("subject").startswith("@"))
        .join(
            memberships.select(
                F.col("user").alias("m_user"),
                F.concat(F.lit("@"), F.col("group_name")).alias("subject"),
            ),
            "subject",
        )
        .select(F.col("m_user").alias("g_user"), *cols)
    )
    return user_grants.unionByName(group_grants)


def authorize(
    requests: DataFrame, grants: DataFrame, memberships: DataFrame
) -> DataFrame:
    """authorizeUser (TableAuthManager.java:449): per-request verdict.

    ``requests``: (req_id, user, namespace, table_name, family,
    qualifier, action) — family/qualifier nullable ("all columns").

    Returns the request columns + ``allowed`` + ``level``, where level
    is the FIRST granting level in the reference's supersession order
    ('global', then 'namespace', then 'table'; TableAuthManager
    comments "Global and namespace authorizations supercede table
    level") — denied rows carry a NULL level.

    Matching per TablePermission.implies (:215-235): a grant's NULL
    field is the wildcard at that position, while a NON-null grant
    family only matches requests that NAME that family (a
    family-scoped grant does not authorize a whole-table request), and
    likewise for qualifier.
    """
    g = F.broadcast(_subject_grants(grants, memberships))
    joined = requests.join(
        g,
        (F.col("g_user") == F.col("user"))
        & (F.col("g_act") == F.col("action")),
        "left",
    )
    # g_user non-null guards the no-grant left-join row (whose all-NULL
    # grant fields would otherwise read as a global wildcard)
    is_global = (
        F.col("g_user").isNotNull()
        & F.col("g_ns").isNull()
        & F.col("g_tbl").isNull()
    )
    is_ns = (
        F.col("g_ns").isNotNull()
        & F.col("g_tbl").isNull()
        & (F.col("g_ns") == F.col("namespace"))
    )
    fam_ok = F.col("g_fam").isNull() | (
        F.col("family").isNotNull() & (F.col("g_fam") == F.col("family"))
    )
    qual_ok = F.col("g_qual").isNull() | (
        F.col("qualifier").isNotNull()
        & (F.col("g_qual") == F.col("qualifier"))
    )
    is_tbl = (
        F.col("g_tbl").isNotNull()
        & (F.col("g_tbl") == F.col("table_name"))
        & fam_ok
        & qual_ok
    )
    req_cols = [c for c in requests.columns]
    per_req = joined.groupBy(*req_cols).agg(
        F.max(F.when(is_global, 1).otherwise(0)).alias("_g"),
        F.max(F.when(is_ns, 1).otherwise(0)).alias("_n"),
        F.max(F.when(is_tbl, 1).otherwise(0)).alias("_t"),
    )
    return per_req.select(
        *req_cols,
        ((F.col("_g") + F.col("_n") + F.col("_t")) > 0).alias("allowed"),
        F.when(F.col("_g") == 1, F.lit("global"))
        .when(F.col("_n") == 1, F.lit("namespace"))
        .when(F.col("_t") == 1, F.lit("table"))
        .alias("level"),
    )


def op_permission_granted(
    op_requests: DataFrame, grants: DataFrame, memberships: DataFrame
) -> DataFrame:
    """permissionGranted (AccessController.java:299): one verdict per
    OPERATION over its touched families map.

    ``op_requests``: (op_id, user, namespace, table_name, family,
    qualifier, action) — one row per touched (family, qualifier);
    qualifier NULL means the op touches the whole family (an empty
    qualifier collection in the reference's map).

    Rule, exactly the reference's short-circuit chain:
    1. a TABLE-level grant for (user, table, action) allows the whole
       op ("Table permission granted", :320-323);
    2. otherwise every touched family must pass: a family-level grant
       (:330-333, "family-level permission overrides per-qualifier"),
       or failing that EVERY touched qualifier of that family passes a
       qualifier-level check (:336-345);
    3. anything else denies the op.

    Returns (op_id, user, table_name, action, allowed, reason) with
    reason 'table' | 'families' | NULL (denied).
    """
    head_cols = ["op_id", "user", "namespace", "table_name", "action"]
    heads = op_requests.select(*head_cols).distinct()
    # 1. table level: the op head with no family/qualifier narrowing
    tbl = authorize(
        heads.select(
            F.col("op_id").alias("req_id"),
            "user", "namespace", "table_name",
            F.lit(None).cast("string").alias("family"),
            F.lit(None).cast("string").alias("qualifier"),
            "action",
        ),
        grants, memberships,
    ).select(F.col("req_id").alias("op_id"), F.col("allowed").alias("_tbl_ok"))
    # 2a. family level: one check per touched family (qualifier ignored)
    fams = op_requests.select(*head_cols, "family").distinct()
    fam_check = authorize(
        fams.select(
            F.concat_ws("\x00", "op_id", "family").alias("req_id"),
            "user", "namespace", "table_name", "family",
            F.lit(None).cast("string").alias("qualifier"),
            "action",
        ),
        grants, memberships,
    ).select("req_id", F.col("allowed").alias("_fam_ok"))
    fam_verdict = fams.join(
        fam_check,
        F.concat_ws("\x00", "op_id", "family") == F.col("req_id"),
    ).drop("req_id")
    # 2b. qualifier fallback for families that failed the family check
    quals = op_requests.where(F.col("qualifier").isNotNull()).select(
        *head_cols, "family", "qualifier"
    )
    qual_check = authorize(
        quals.select(
            F.concat_ws(
                "\x00", "op_id", "family", "qualifier"
            ).alias("req_id"),
            "user", "namespace", "table_name", "family", "qualifier",
            "action",
        ),
        grants, memberships,
    ).select("req_id", F.col("allowed").alias("_q_ok"))
    qual_verdict = quals.join(
        qual_check,
        F.concat_ws("\x00", "op_id", "family", "qualifier")
        == F.col("req_id"),
    ).drop("req_id")
    # per family: #touched qualifiers and #passing qualifiers
    qual_agg = qual_verdict.groupBy("op_id", "family").agg(
        F.count(F.lit(1)).alias("_nq"),
        F.sum(F.col("_q_ok").cast("int")).alias("_nq_ok"),
    )
    per_family = (
        fam_verdict.join(qual_agg, ["op_id", "family"], "left")
        .select(
            "op_id",
            (
                F.col("_fam_ok")
                | (
                    F.coalesce(F.col("_nq"), F.lit(0)) > 0
                ) & (F.coalesce(F.col("_nq_ok"), F.lit(-1)) == F.col("_nq"))
            ).alias("_f_pass"),
        )
        .groupBy("op_id")
        .agg(
            (F.sum((~F.col("_f_pass")).cast("int")) == 0).alias("_all_fams")
        )
    )
    return (
        heads.join(tbl, "op_id")
        .join(per_family, "op_id", "left")
        .select(
            "op_id", "user", "table_name", "action",
            (
                F.col("_tbl_ok")
                | F.coalesce(F.col("_all_fams"), F.lit(False))
            ).alias("allowed"),
            F.when(F.col("_tbl_ok"), F.lit("table"))
            .when(
                F.coalesce(F.col("_all_fams"), F.lit(False)),
                F.lit("families"),
            )
            .alias("reason"),
        )
    )
