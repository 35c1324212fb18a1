"""Edge-case tests for the round-7b corpus transforms: corpus-wide line
dedup (CCNet/RefinedWeb boilerplate pass) and C4 rule cleaning."""

from __future__ import annotations

from indicators_spark.functions import dedup, text


# --------------------------------------------------------------------- #
# line_dedup_global
# --------------------------------------------------------------------- #


def test_line_dedup_removes_boilerplate_everywhere(spark):
    boiler = "accept all cookies"
    rows = [
        (1, f"unique alpha line\n{boiler}\nends here"),
        (2, f"{boiler}\nanother unique line"),
        (3, "totally unique document"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.line_dedup_global(df).collect()}
    assert out[1].clean_text == "unique alpha line\nends here"
    assert (out[1].n_lines, out[1].n_removed) == (3, 1)
    assert out[2].clean_text == "another unique line"
    assert (out[2].n_lines, out[2].n_removed) == (2, 1)
    # no copy survives anywhere (remove-all policy, not keep-first)
    assert out[3].clean_text == "totally unique document"
    assert out[3].n_removed == 0
    # NULL text: extraction-failure passthrough, not ''
    assert out[4].clean_text is None
    assert (out[4].n_lines, out[4].n_removed) == (0, 0)


def test_line_dedup_full_removal_rebuilds_empty(spark):
    rows = [(1, "dup one\ndup two"), (2, "dup one"), (3, "dup two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.line_dedup_global(df).collect()}
    assert out[1].clean_text == ""
    assert (out[1].n_lines, out[1].n_removed) == (2, 2)


def test_line_dedup_min_df_counts_occurrences_not_docs(spark):
    # "twice here" appears twice WITHIN doc 1 only: occurrence count 2
    # meets min_df=2 even though only one document contains it
    rows = [(1, "twice here\nmiddle\ntwice here"), (2, "solo line")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.line_dedup_global(df).collect()}
    assert out[1].clean_text == "middle"
    assert out[1].n_removed == 2
    # raising min_df past the count keeps everything
    out3 = {
        r.doc_id: r
        for r in dedup.line_dedup_global(df, min_df=3).collect()
    }
    assert out3[1].n_removed == 0
    assert out3[1].clean_text == rows[0][1]


def test_line_dedup_preserves_line_order(spark):
    rows = [(1, "z last\ndup\na first"), (2, "dup")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.line_dedup_global(df).collect()}
    assert out[1].clean_text == "z last\na first"


# --------------------------------------------------------------------- #
# c4_rules
# --------------------------------------------------------------------- #


def test_c4_line_rules_and_sentence_flag(spark):
    doc = "\n".join(
        [
            "this line has five words.",
            "short line.",  # < 5 words -> dropped
            "this line mentions javascript somewhere here.",  # dropped
            "no terminal punctuation here at all",  # dropped
            "another good line with six words!",
            "third fine sentence is right here?",
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = text.c4_rules(df).collect()[0]
    assert r.clean_text == (
        "this line has five words.\n"
        "another good line with six words!\n"
        "third fine sentence is right here?"
    )
    assert (r.n_lines, r.n_kept) == (6, 3)
    assert r.ok_sentences is True and r.keep is True


def test_c4_page_rules(spark):
    good = "this line has five words."
    rows = [
        (1, f"{good}\nsee the lorem ipsum filler here."),
        (2, f"{good}\ncode with a brace {{ inside."),
        (3, f"{good}\nthis has the word shit in."),
        (4, None),
        # badword only as a SUBSTRING of a longer word: must not trip
        (5, f"{good}\na mishit serve ended the rally."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text.c4_rules(df).collect()}
    assert got[1].ok_no_lorem is False and got[1].keep is False
    assert got[2].ok_no_brace is False and got[2].keep is False
    assert got[3].ok_no_badwords is False and got[3].keep is False
    assert got[4].clean_text is None and got[4].keep is False
    assert got[4].n_kept == 0
    assert got[5].ok_no_badwords is True


def test_c4_all_lines_dropped_rebuilds_empty(spark):
    df = spark.createDataFrame(
        [(1, "nope\nstill nope")], "doc_id long, text string"
    )
    r = text.c4_rules(df).collect()[0]
    assert r.clean_text == "" and r.n_kept == 0
    assert r.ok_sentences is False and r.keep is False


def test_c4_zero_shuffle_plan(spark):
    from indicators_spark.plans import exchange_count, plan_string

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = plan_string(text.c4_rules(df))
    assert exchange_count(plan) == 0, plan


def test_r7_pipeline_end_to_end(spark):
    """Integration: lineify → line dedup → C4 → per-source accounting is
    internally consistent at smoke scale."""
    from indicators_spark.queries import QUERIES

    rows = QUERIES["pipeline_corpus_r7"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_pages_kept <= r.n_docs
        assert r.lines_deduped >= 0 and r.lines_dropped_c4 >= 0
        assert (r.tokens_kept > 0) == (r.n_pages_kept > 0)


def test_r7_pipeline_plan_text_shuffle_budget(spark):
    """The chained plan keeps the line-dedup guarantees: hash-keyed
    exchanges never carry the text/line columns, and the dup set comes
    back via broadcast."""
    from indicators_spark.plans import plan_string
    from indicators_spark.queries import QUERIES

    plan = plan_string(
        QUERIES["pipeline_corpus_r7"].spark(spark, "/root/testdata/sf0.001")
    )
    assert "BroadcastHashJoin" in plan, plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "line#" not in ln, ln


def test_line_dedup_incremental_no_store_equals_global(spark):
    from indicators_spark.functions.dedup import (
        line_dedup_global,
        line_dedup_incremental,
    )

    rows = [
        (1, "dup line\nunique a"),
        (2, "dup line\nunique b"),
        (3, None),
        (4, "dup line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = {tuple(r) for r in line_dedup_global(df, min_df=2).collect()}
    i = {tuple(r) for r in line_dedup_incremental(df, None, min_df=2).collect()}
    assert g == i
