"""Paragraph-level cross-document dedup (RefinedWeb/MassiveText style):
duplicate_paragraphs / paragraph_dup_profile / scrub_dup_paragraphs.

The synthetic corpus has no newlines, so these tests build real
multi-paragraph fixtures; the sf-data oracle queries split on a word
delimiter instead (same code path, different regex).
"""

import pytest
from pyspark.sql import functions as F

from datatest_spark.operators.dedup import (
    duplicate_paragraphs,
    paragraph_dup_profile,
    scrub_dup_paragraphs,
)


BOILER = "subscribe to our newsletter"
UNIQ1 = "alpha beta gamma"
UNIQ2 = "delta epsilon"
UNIQ3 = "zeta eta theta"


@pytest.fixture(scope="module")
def docs(spark):
    # doc 1: boilerplate + unique; doc 2: boilerplate (whitespace
    # variant, collapses to the same normalized paragraph) + unique;
    # doc 3: boilerplate twice within ONE doc + unique; doc 4: only
    # boilerplate; doc 5: empty text; doc 6: null text (dropped);
    # doc 7: unique only.
    rows = [
        (1, BOILER + "\n\n" + UNIQ1),
        (2, "subscribe  to our\tnewsletter" + "\n\n" + UNIQ2),
        (3, BOILER + "\n\n" + BOILER + "\n\n" + UNIQ3),
        (4, BOILER),
        (5, ""),
        (6, None),
        (7, UNIQ1 + " extra"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_paragraphs_counts(docs):
    out = duplicate_paragraphs(docs, min_docs=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["paragraph"] == BOILER
    assert r["n_docs"] == 4
    assert r["n_occurrences"] == 5  # doc 3 contributes twice
    assert r["first_doc_id"] == 1


def test_duplicate_paragraphs_normalize_off(docs):
    # without normalization the whitespace variant in doc 2 no longer
    # matches, so the boilerplate group is docs {1, 3, 4}
    out = duplicate_paragraphs(docs, min_docs=2, normalize=False).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 3


def test_duplicate_paragraphs_hash_fn_parity(docs):
    md5 = {
        (r["paragraph"], r["n_docs"], r["n_occurrences"])
        for r in duplicate_paragraphs(docs, hash_fn="md5").collect()
    }
    xx = {
        (r["paragraph"], r["n_docs"], r["n_occurrences"])
        for r in duplicate_paragraphs(docs, hash_fn="xxhash64").collect()
    }
    assert md5 == xx


def test_profile_fractions(docs):
    rows = {
        r["doc_id"]: r
        for r in paragraph_dup_profile(docs, min_docs=2).collect()
    }
    # docs 5 (empty) and 6 (null) have no kept paragraphs -> absent
    assert set(rows) == {1, 2, 3, 4, 7}
    assert rows[1]["n_paragraphs"] == 2
    assert rows[1]["n_dup_paragraphs"] == 1
    assert rows[1]["dup_paragraph_frac"] == 0.5
    assert rows[3]["n_paragraphs"] == 3
    assert rows[3]["n_dup_paragraphs"] == 2
    assert rows[4]["dup_paragraph_frac"] == 1.0
    assert rows[4]["dup_char_frac"] == 1.0
    assert rows[7]["n_dup_paragraphs"] == 0
    assert rows[7]["dup_char_frac"] == 0.0
    # char fraction for doc 1: len(BOILER) / (len(BOILER) + len(UNIQ1))
    exp = round(len(BOILER) / (len(BOILER) + len(UNIQ1)), 6)
    assert rows[1]["dup_char_frac"] == pytest.approx(exp)


def test_scrub_keep_first(docs):
    rows = {
        r["doc_id"]: r
        for r in scrub_dup_paragraphs(docs, keep="first").collect()
    }
    # every non-null-text doc survives, including empty ones
    assert set(rows) == {1, 2, 3, 4, 5, 7}
    # doc 1 holds the globally first occurrence -> keeps it
    assert rows[1]["clean_text"] == BOILER + "\n\n" + UNIQ1
    assert rows[1]["n_removed"] == 0
    # later occurrences are removed everywhere else
    assert rows[2]["clean_text"] == UNIQ2
    assert rows[2]["n_removed"] == 1
    assert rows[3]["clean_text"] == UNIQ3
    assert rows[3]["n_removed"] == 2
    assert rows[4]["clean_text"] == ""
    assert rows[4]["n_kept"] == 0 and rows[4]["n_removed"] == 1
    assert rows[5]["clean_text"] == "" and rows[5]["n_kept"] == 0
    assert rows[7]["clean_text"] == UNIQ1 + " extra"


def test_scrub_keep_none(docs):
    rows = {
        r["doc_id"]: r
        for r in scrub_dup_paragraphs(docs, keep="none").collect()
    }
    assert rows[1]["clean_text"] == UNIQ1
    assert rows[1]["n_removed"] == 1
    assert rows[3]["n_removed"] == 2


def test_within_doc_repeat_is_not_cross_doc_dup(spark):
    """A paragraph repeated twice inside ONE document is not a
    cross-document duplicate: n_docs counts DISTINCT docs, so neither
    the blocklist, the profile, nor the scrub flags it at min_docs=2."""
    df = spark.createDataFrame(
        [(1, "self same\n\nself same\n\nother"), (2, "unrelated")],
        "doc_id long, text string",
    )
    assert duplicate_paragraphs(df, min_docs=2).count() == 0
    prof = {
        r["doc_id"]: r for r in paragraph_dup_profile(df, min_docs=2).collect()
    }
    assert prof[1]["n_dup_paragraphs"] == 0
    scrub = {
        r["doc_id"]: r for r in scrub_dup_paragraphs(df, keep="first").collect()
    }
    assert scrub[1]["n_removed"] == 0
    assert scrub[1]["clean_text"] == "self same\n\nself same\n\nother"


def test_scrub_rejects_bad_keep(docs):
    with pytest.raises(ValueError):
        scrub_dup_paragraphs(docs, keep="last")


def test_min_chars_filters_short_segments(spark):
    df = spark.createDataFrame(
        [(1, "ab\n\nx\n\nab"), (2, "ab\n\ny")],
        "doc_id long, text string",
    )
    out = duplicate_paragraphs(df, min_chars=2, min_docs=2).collect()
    assert len(out) == 1 and out[0]["paragraph"] == "ab"
    # the 1-char segments never exploded, so doc 2's profile is 1 par
    prof = {
        r["doc_id"]: r
        for r in paragraph_dup_profile(df, min_chars=2).collect()
    }
    assert prof[2]["n_paragraphs"] == 1


def test_profile_plan_single_paragraph_exchange(spark):
    """The window distinct-doc count and the groupBy(par_hash, id)
    partials must ride ONE par_hash exchange (subset co-location), so
    the corpus-sized exploded frame shuffles exactly twice overall
    (par_hash + final doc id)."""
    import contextlib
    import io
    import re

    df = spark.createDataFrame(
        [(1, "a b\n\nc d"), (2, "a b")], "doc_id long, text string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        paragraph_dup_profile(df).explain(mode="formatted")
    plan = buf.getvalue()
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan


def test_vertical_tab_is_not_normalized_whitespace(spark):
    # Java \s matches U+000B but RE2 (the DuckDB oracle engine) does
    # not: normalization must use the shared explicit class, so a
    # vertical-tab variant stays DISTINCT from the space variant on
    # both engines (cross-engine parity regression, round-5 review)
    df = spark.createDataFrame(
        [
            (1, "some repeated paragraph here"),
            (2, "some\x0brepeated\x0bparagraph\x0bhere"),
            (3, "some  repeated\trepeated? no, paragraph here"),
        ],
        "doc_id long, text string",
    )
    out = duplicate_paragraphs(df, min_docs=2, min_chars=5).collect()
    assert out == []


def test_scrub_accepts_column_text_col(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "THE BOILER PARA GRAPH\n\nunique one two three four"),
            (2, "the boiler  para graph\n\nanother unique five six"),
        ],
        "doc_id long, text string",
    )
    out = scrub_dup_paragraphs(
        df, text_col=F.lower(F.col("text")), min_docs=2, min_chars=5
    ).orderBy("doc_id").collect()
    assert out[0]["n_removed"] == 0 and out[0]["n_kept"] == 2
    assert out[1]["n_removed"] == 1
