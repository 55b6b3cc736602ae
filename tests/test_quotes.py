"""Quotation attribution (operators/quotes.py): hand fixtures for both
templates, length gates, case gates, multi-quote pages, and Spark/DuckDB
pattern identity via quotes_sql."""

from __future__ import annotations

import duckdb
import pytest

from graphiti_spark.operators.quotes import extract_quotes, quotes_sql


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, '"We will double revenue this year," said Jane Doe.'),
        (2, 'Carl van Dorn told reporters nothing. Ana Bell said: "The merger closes in May."'),
        (3, '"Too short" said Bo Li.'),  # quote under min_len=8? len("Too short")=9 -> kept
        (4, '"ok" said Jo Smith.'),  # under min_len -> dropped
        (5, 'she said "lowercase speakers never match this rule."'),
        (6, '"First quote is long enough," says Ann Ray. Then Bob Cole wrote "the second quote also counts."'),
        (7, "No quotes here at all."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_both_templates_hand_checked(docs):
    got = {
        (r["id"], r["speaker"], r["verb"], r["quote"], r["pattern"])
        for r in extract_quotes(docs).collect()
    }
    assert (1, "Jane Doe", "said", "We will double revenue this year,", "quote_first") in got
    assert (2, "Ana Bell", "said", "The merger closes in May.", "speaker_first") in got
    assert (6, "Ann Ray", "says", "First quote is long enough,", "quote_first") in got
    assert (6, "Bob Cole", "wrote", "the second quote also counts.", "speaker_first") in got
    assert (3, "Bo Li", "said", "Too short", "quote_first") in got
    # gates: short quote, lowercase speaker, quote-free page
    assert not any(r[0] in (4, 5, 7) for r in got)
    assert len(got) == 5


def test_multiword_name_bounded(spark):
    d = spark.createDataFrame(
        [(1, '"A sufficiently long quotation," said Anna Maria Del Rey Tudor Jones.')],
        ["doc_id", "text"],
    )
    (row,) = extract_quotes(d).collect()
    # name caps at 4 capitalized tokens
    assert row["speaker"] == "Anna Maria Del Rey"


def test_duckdb_twin_identical(spark, docs):
    spark_rows = sorted(map(tuple, extract_quotes(docs).collect()))
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    duck_rows = sorted(map(tuple, con.execute(quotes_sql("documents")).fetchall()))
    assert spark_rows == duck_rows


def test_plan_is_map_only(docs):
    plan = extract_quotes(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
