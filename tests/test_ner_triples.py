"""S3/S4 extraction-contract tests (prompts/extract_nodes.py:92-109,
prompts/extract_edges.py:107-124 output contracts, deterministically)."""

from __future__ import annotations

from graphiti_spark.operators.ner import extract_mentions_py
from graphiti_spark.operators.triples import extract_triples_py


def names(text):
    return [m[0] for m in extract_mentions_py(text)]


def test_simple_svo():
    assert names("Alice likes Bob.") == ["Alice", "Bob"]
    t = extract_triples_py("Alice likes Bob.")
    # trailing True = ongoing (present tense -> valid_at defaults to the
    # episode reference time downstream, DATETIME RULES :117-122)
    assert t == [("Alice", "LIKES", "Bob", "Alice likes Bob.", None, None, True)]


def test_tense_classification():
    """DATETIME RULES (extract_edges.py:117-122): present-tense facts are
    ongoing; past-tense facts are not."""
    likes = extract_triples_py("Alice likes Bob.")[0]
    assert likes[6] is True
    visited = extract_triples_py("Alice Smith visited Paris Gardens.")[0]
    assert visited[6] is False  # -ed past
    met = extract_triples_py("Alice Smith met Carol Jones.")[0]
    assert met[6] is False  # irregular past


def test_multiword_and_connector_entities():
    assert names("The University of Toronto hired Geoffrey Hinton.") == [
        "The University of Toronto",
        "Geoffrey Hinton",
    ]


def test_sentence_initial_common_word_not_entity():
    assert names("She joined Acme Corp.") == ["Acme Corp"]
    assert names("On Monday, Tesla announced Cybertruck.") == ["Tesla", "Cybertruck"]


def test_no_date_entities():
    # prompts/extract_nodes.py:107-109: no date/time entities.
    assert "January" not in names("In January, Bob met Carol.")


def test_date_extraction_to_valid_at():
    t = extract_triples_py("Acme Corp hired Carol Jones in 2021.")
    assert t[0][1] == "HIRED" and t[0][4] == "2021"
    t = extract_triples_py("Emmanuel Macron governs France since 2017.")
    assert t[0][4] == "2017"


def test_fact_quotes_sentence():
    # prompts/extract_edges.py:113: fact quotes the source sentence.
    t = extract_triples_py("Claude Code extends Claude.")
    assert t[0][3] == "Claude Code extends Claude."


def test_predicate_screaming_snake_case():
    for tr in extract_triples_py("Alice Smith works at Acme Corp. Bob co-founded Initech."):
        pred = tr[1]
        assert pred == pred.upper() and " " not in pred


def test_no_self_loops_and_distinct_endpoints():
    for tr in extract_triples_py("Claude was built by Anthropic. Claude extends Claude."):
        assert tr[0] != tr[2]


def test_deterministic():
    text = "Alice likes Bob. Acme Corp hired Carol Jones in 2021."
    assert extract_triples_py(text) == extract_triples_py(text)
    assert extract_mentions_py(text) == extract_mentions_py(text)
