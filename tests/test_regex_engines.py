"""RegexStringComparator engine variants: JAVA vs JONI, pinned.

The reference ships two engines (RegexStringComparator.java:85-89).
Both parse JAVA regex syntax — the joni Regex is constructed with
``Syntax.Java`` (:338) — so the engines agree on the common surface;
the observable deltas are:

* the JONI flag mask: only CASE_INSENSITIVE/DOTALL/MULTILINE survive
  patternToJoniFlags (:380-396); LITERAL/COMMENTS/UNICODE_CASE/
  UNIX_LINES/CANON_EQ silently drop;
* oniguruma's newline model: '\\n' only (vs java.util.regex's
  \\n/\\r/\\r\\n/NEL/LS/PS) — emulated by always adding UNIX_LINES;
* oniguruma IGNORECASE over UTF-8 = Unicode case folding (the Ruby
  model) vs bare (?i)'s ASCII-only fold — emulated by (?iu);
* \\p{javaXxx} JVM-runtime property classes exist only in
  java.util.regex — rejected under JONI;
* charsets: UTF-8 (default) and ISO-8859-1 (the one the reference
  javadoc recommends for arbitrary bytes, :143-145) are implemented;
  others are rejected explicitly.

Each agreement case pins JAVA == JONI; each divergence case pins the
exact direction the flag-mask drop flips the verdict.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.filters import ast
from hbase_1_3_0_spark.filters.compiler import (
    compile_compare,
    compile_regex_pattern,
)

CI = ast.PATTERN_CASE_INSENSITIVE
DOTALL = ast.PATTERN_DOTALL
ML = ast.PATTERN_MULTILINE
LIT = ast.PATTERN_LITERAL
COMMENTS = ast.PATTERN_COMMENTS
UCASE = ast.PATTERN_UNICODE_CASE


VALUES = {
    1: "a\nb",
    2: "a\rb",
    3: "x\ry\nfox",
    4: "The QUICK fox",
    5: "ΑΣ",  # "ΑΣ" — uppercase alpha + sigma
    6: "abc",
    7: "xa.cy",
    8: "fox",
    9: "f o x",
    10: "a\\Eb",
}


@pytest.fixture(scope="module")
def vals(spark):
    df = spark.createDataFrame(
        sorted(VALUES.items()), "k int, v string"
    ).withColumn("b", F.encode("v", "UTF-8"))
    return df.cache()


def matched(vals, pattern, flags=DOTALL, engine="JAVA", charset="UTF-8"):
    cmp = ast.RegexStringComparator(
        pattern, flags=flags, engine=engine, charset=charset
    )
    pred = compile_compare(F.col("b"), ast.CompareOp.EQUAL, cmp)
    return {r.k for r in vals.where(pred).select("k").collect()}


# ---------------------------------------------------------------------------
# compile_regex_pattern unit pins
# ---------------------------------------------------------------------------


def test_default_flags_are_dotall():
    # 1-arg constructor adds Pattern.DOTALL (RegexStringComparator.java:97-99)
    assert compile_regex_pattern(ast.RegexStringComparator("a.b")) == "(?s)a.b"
    assert (
        compile_regex_pattern(ast.RegexStringComparator("a.b", flags=0))
        == "a.b"
    )


def test_joni_flag_mask_and_newline_model():
    # JONI: DOTALL kept, UNIX_LINES added (oniguruma \n-only newlines)
    assert (
        compile_regex_pattern(ast.RegexStringComparator("a.b", engine="JONI"))
        == "(?ds)a.b"
    )
    # CASE_INSENSITIVE under joni = Unicode folding -> (?iu)
    assert (
        compile_regex_pattern(
            ast.RegexStringComparator("a", flags=CI, engine="JONI")
        )
        == "(?diu)a"
    )
    # LITERAL/COMMENTS are NOT in the joni mask: silently dropped
    assert (
        compile_regex_pattern(
            ast.RegexStringComparator("a.c", flags=LIT | DOTALL, engine="JONI")
        )
        == "(?ds)a.c"
    )
    # CANON_EQ: rejected under JAVA, silently dropped under JONI
    with pytest.raises(NotImplementedError):
        compile_regex_pattern(
            ast.RegexStringComparator("a", flags=ast.PATTERN_CANON_EQ)
        )
    assert (
        compile_regex_pattern(
            ast.RegexStringComparator(
                "a", flags=ast.PATTERN_CANON_EQ, engine="JONI"
            )
        )
        == "(?d)a"
    )


def test_literal_quoting():
    assert (
        compile_regex_pattern(
            ast.RegexStringComparator("a.c", flags=LIT)
        )
        == "\\Qa.c\\E"
    )
    # only CASE_INSENSITIVE/UNICODE_CASE survive alongside LITERAL
    assert (
        compile_regex_pattern(
            ast.RegexStringComparator("a.c", flags=LIT | CI | DOTALL | COMMENTS)
        )
        == "(?i)\\Qa.c\\E"
    )
    # embedded \E split
    assert (
        compile_regex_pattern(
            ast.RegexStringComparator("a\\Eb", flags=LIT)
        )
        == "\\Qa\\E\\\\E\\Qb\\E"
    )


def test_joni_rejects_jvm_property_classes():
    with pytest.raises(NotImplementedError):
        compile_regex_pattern(
            ast.RegexStringComparator(
                "\\p{javaLowerCase}+", engine="JONI"
            )
        )
    # JAVA engine compiles them (java.util.regex extension)
    assert "javaLowerCase" in compile_regex_pattern(
        ast.RegexStringComparator("\\p{javaLowerCase}+")
    )


def test_unknown_engine_rejected():
    with pytest.raises(ValueError):
        compile_regex_pattern(
            ast.RegexStringComparator("a", engine="RUST")
        )


# ---------------------------------------------------------------------------
# end-to-end matching pins (through compile_compare, i.e. the real
# ValueFilter/RowFilter predicate path)
# ---------------------------------------------------------------------------


def test_dotall_default_both_engines(vals):
    # default DOTALL: '.' crosses the newline — BOTH engines
    assert 1 in matched(vals, "a.b", engine="JAVA")
    assert 1 in matched(vals, "a.b", engine="JONI")
    # flags=0: '.' excludes \n — BOTH engines
    assert 1 not in matched(vals, "a.b", flags=0, engine="JAVA")
    assert 1 not in matched(vals, "a.b", flags=0, engine="JONI")


def test_newline_model_divergence(vals):
    # value "a\rb", flags=0: java.util.regex '.' excludes \r;
    # oniguruma's only newline is \n so '.' matches \r
    assert 2 not in matched(vals, "a.b", flags=0, engine="JAVA")
    assert 2 in matched(vals, "a.b", flags=0, engine="JONI")


def test_multiline_anchor_divergence(vals):
    # "x\ry\nfox": Java MULTILINE treats the lone \r as a terminator,
    # so ^y matches; joni anchors only after \n
    assert 3 in matched(vals, "^y$", flags=ML, engine="JAVA")
    assert 3 not in matched(vals, "^y$", flags=ML, engine="JONI")
    # after \n both engines agree
    assert 3 in matched(vals, "^fox$", flags=ML, engine="JAVA")
    assert 3 in matched(vals, "^fox$", flags=ML, engine="JONI")
    # without MULTILINE neither anchors mid-string
    assert 3 not in matched(vals, "^fox$", flags=0, engine="JAVA")
    assert 3 not in matched(vals, "^fox$", flags=0, engine="JONI")


def test_case_insensitive_agreement_and_unicode_divergence(vals):
    assert 4 in matched(vals, "quick", flags=CI, engine="JAVA")
    assert 4 in matched(vals, "quick", flags=CI, engine="JONI")
    assert 4 not in matched(vals, "quick", flags=0, engine="JAVA")
    # "ΑΣ" vs lowercase sigma: bare (?i) folds ASCII only (no match);
    # joni IGNORECASE is Unicode-aware (match); JAVA+UNICODE_CASE agrees
    assert 5 not in matched(vals, "σ", flags=CI, engine="JAVA")
    assert 5 in matched(vals, "σ", flags=CI, engine="JONI")
    assert 5 in matched(vals, "σ", flags=CI | UCASE, engine="JAVA")


def test_literal_flag_divergence(vals):
    # JAVA honors LITERAL: "a.c" is a literal (no match on "abc");
    # JONI drops it: "a.c" is a regex again
    java = matched(vals, "a.c", flags=LIT | DOTALL, engine="JAVA")
    joni = matched(vals, "a.c", flags=LIT | DOTALL, engine="JONI")
    assert 6 not in java and 7 in java
    assert 6 in joni and 7 in joni
    # embedded \E survives the quoting
    assert 10 in matched(vals, "a\\Eb", flags=LIT, engine="JAVA")
    assert 6 not in matched(vals, "a\\Eb", flags=LIT, engine="JAVA")


def test_comments_flag_divergence(vals):
    # JAVA (?x): whitespace in the pattern is ignored -> matches "fox";
    # JONI drops COMMENTS -> needs the literal spaces
    java = matched(vals, "f o x", flags=COMMENTS | DOTALL, engine="JAVA")
    joni = matched(vals, "f o x", flags=COMMENTS | DOTALL, engine="JONI")
    assert 8 in java and 9 not in java
    assert 8 not in joni and 9 in joni


def test_charsets(spark):
    # latin-1 bytes b"caf\xe9": ISO-8859-1 decode matches "café";
    # under UTF-8 the lone \xe9 is not the UTF-8 encoding of é
    df = spark.createDataFrame([(1, "café")], "k int, v string").select(
        "k", F.encode("v", "ISO-8859-1").alias("b")
    )
    for engine in ("JAVA", "JONI"):
        cmp = ast.RegexStringComparator(
            "café", engine=engine, charset="ISO-8859-1"
        )
        pred = compile_compare(F.col("b"), ast.CompareOp.EQUAL, cmp)
        assert df.where(pred).count() == 1, engine
        cmp8 = ast.RegexStringComparator("café", engine=engine)
        pred8 = compile_compare(F.col("b"), ast.CompareOp.EQUAL, cmp8)
        assert df.where(pred8).count() == 0, engine
    with pytest.raises(NotImplementedError):
        compile_compare(
            F.col("b"),
            ast.CompareOp.EQUAL,
            ast.RegexStringComparator("x", charset="KOI8-R"),
        )
