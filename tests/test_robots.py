"""robots.txt parser + filter (`operators/robots.py`): RFC 9309 group
selection, comments, record semantics, and precedence. The full
engine-vs-oracle gate (parsed text vs arithmetic rules) runs in
tests/test_oracle_parity.py::robots_filter."""

from __future__ import annotations

from no_ocr_spark.operators.robots import _robots_text_for, parse_robots


def test_star_group_only():
    text = ("User-agent: google-bot\n"
            "Disallow: /private\n"
            "\n"
            "User-agent: *\n"
            "Disallow: /tmp\n"
            "Allow: /tmp/ok\n")
    assert parse_robots(text) == [("/tmp", False), ("/tmp/ok", True)]


def test_shared_group_multiple_user_agents():
    # consecutive UA lines share ONE group (RFC 9309 §2.2.1)
    text = ("User-agent: a-bot\n"
            "User-agent: *\n"
            "Disallow: /x\n")
    assert parse_robots(text) == [("/x", False)]


def test_records_end_group_next_ua_opens_new_one():
    # a UA line AFTER records starts a fresh group: the '*' group's
    # rules must not leak into b-bot's group
    text = ("User-agent: *\n"
            "Disallow: /x\n"
            "User-agent: b-bot\n"
            "Disallow: /y\n")
    assert parse_robots(text) == [("/x", False)]


def test_comments_blank_lines_and_empty_disallow():
    text = ("# top comment\n"
            "User-agent: * # trailing\n"
            "Disallow:   \n"          # empty value: matches nothing
            "Disallow: /a # note\n"
            "\n"
            "Allow: /a/b\n")          # after blank line but same group
    # RFC: a blank line ends a group only at a following UA line; records
    # still in the same group here
    assert parse_robots(text) == [("/a", False), ("/a/b", True)]


def test_case_insensitive_keys():
    text = "USER-AGENT: *\nDISALLOW: /q\nallow: /q/r\n"
    assert parse_robots(text) == [("/q", False), ("/q/r", True)]


def test_synthetic_policy_shape():
    rules = parse_robots(_robots_text_for("news"))
    d = str(ord("n") % 10)
    assert rules == [(f"/doc-{d}", False), (f"/doc-{d}{d}", True),
                     (f"/x-{d}", False), (f"/x-{d}", True)]
    # the other-bot group's blanket Disallow must not appear
    assert ("/", False) not in rules


def test_empty_source_rows_stay_allowed(spark):
    """Review finding: a blank/null host must not crash the parse stage;
    the doc simply has no robots rules and stays allowed."""
    import pandas as pd

    from no_ocr_spark.operators.robots import q_robots_filter

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a", "b", "c"],
        "lang": ["en"] * 3,
        "source": ["news", "", None],
        "n_chars": [1, 1, 1],
    })
    path = "/tmp/robots_empty_src"
    spark.createDataFrame(
        pdf, "doc_id bigint, text string, lang string, source string, "
             "n_chars bigint"
    ).write.mode("overwrite").parquet(path + "/documents.parquet")
    out = {r.doc_id: r.allowed for r in q_robots_filter(spark, path).collect()}
    assert out[1] is True and out[2] is True  # no host -> no rules
    assert 0 in out                           # real host still gated
