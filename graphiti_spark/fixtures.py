"""Golden fixtures: tiny page corpus with hand-computed expected triples.

Mirrors the reference's integration-test expectation shape
(/root/reference/tests/test_graphiti_int.py:83-147 — episode "Alice likes
Bob" -> entities {Alice, Bob} + RELATES_TO edge) and the dedup scenario
tables (dedup_test_results_*.json): name variations, fuzzy typos,
compound-name non-duplicates, cross-page entity reuse, temporal
contradictions, and a skew hot-spot. The P/R >= 0.95 gate (BASELINE.json) is
computed as exact set intersection over normalized canonical triples —
the deterministic replacement for the reference's LLM judge
(tests/evals/eval_e2e_graph_building.py).
"""

from __future__ import annotations

from datetime import datetime, timezone

_BOILERPLATE_HEAD = (
    "<html><head><title>{title}</title>"
    "<script>var tracker = 'x';</script><style>.a{{color:red}}</style></head>"
    "<body><nav><ul><li><a href='/'>Home</a></li><li>About</li></ul></nav>"
    "<header><h1>{title}</h1></header><div class='content'>"
)
_BOILERPLATE_TAIL = (
    "</div><aside>Related links</aside>"
    "<footer>Copyright 2024 — all rights reserved.</footer></body></html>"
)


def _page(url: str, ts: str, title: str, body_sentences: list[str], lang: str = "en") -> dict:
    html = (
        _BOILERPLATE_HEAD.format(title=title)
        + "".join(f"<p>{s}</p>" for s in body_sentences)
        + _BOILERPLATE_TAIL
    )
    return {
        "url": url,
        "warc_ts": datetime.fromisoformat(ts).replace(tzinfo=timezone.utc),
        "html": html.encode("utf-8"),
        "text": None,
        "lang": lang,
    }


FIXTURE_PAGES: list[dict] = [
    # Canonical SVO shapes (test_graphiti_int.py:89-127 analog).
    _page(
        "https://example.com/alice",
        "2024-01-01T00:00:00",
        "Alice",
        ["Alice likes Bob.", "Alice Smith works at Acme Corp."],
    ),
    _page(
        "https://example.com/acme",
        "2024-01-02T00:00:00",
        "Acme",
        ["Acme Corp hired Carol Jones in 2021.", "Carol Jones married David Lee."],
    ),
    # Fuzzy name variation: Graphitti is a typo of Graphiti (ratio 0.94 >= 0.9)
    # -> one canonical entity; both facts land on the same canonical triple key.
    _page(
        "https://example.com/graphiti",
        "2024-01-03T00:00:00",
        "Graphiti",
        ["Graphiti powers Zep.", "Graphitti powers Zep."],
    ),
    # Compound-name guard: Claude vs Claude Code must stay distinct
    # (maintenance_dedupe_entities.py:139-158).
    _page(
        "https://example.com/claude",
        "2024-01-04T00:00:00",
        "Claude",
        ["Claude helps Anthropic.", "Claude Code extends Claude."],
    ),
    # Cross-page entity reuse: Acme Corp appears on /alice, /acme and here —
    # one canonical node whose episodes union spans pages.
    _page(
        "https://example.com/news",
        "2024-01-05T00:00:00",
        "News",
        ["Acme Corp acquired Widget Works.", "Google praised Widget Works."],
    ),
    # Temporal contradiction (edge_operations.py:425-455): same (subj, pred),
    # different object at two crawl times -> earlier edge invalidated.
    _page(
        "https://example.com/own1",
        "2024-01-01T12:00:00",
        "Ownership",
        ["Bluebird Corp owns Nestly."],
    ),
    _page(
        "https://example.com/own2",
        "2024-03-01T12:00:00",
        "Ownership update",
        ["Bluebird Corp owns Firmly."],
    ),
    # Skew hot-spot: Google on many pages (salting/df-cap exercise).
    *[
        _page(
            f"https://example.com/google{i}",
            f"2024-02-0{i+1}T00:00:00",
            f"Google {i}",
            [f"Google launched Product{i}.", "Google employs Sundar Pichai."],
        )
        for i in range(5)
    ],
    # Non-English page (lang filter exercise).
    _page(
        "https://example.de/bericht",
        "2024-01-06T00:00:00",
        "Bericht",
        ["Der Bericht ist gut."],
        lang="de",
    ),
    # Pre-extracted text path (S1 bypass): text non-null.
    {
        "url": "https://example.com/pretext",
        "warc_ts": datetime.fromisoformat("2024-01-07T00:00:00").replace(tzinfo=timezone.utc),
        "html": b"<html><body>ignored</body></html>",
        "text": "Helix Labs funded Nova Robotics.",
        "lang": "en",
    },
]

# Expected canonical triples as (subj_name_norm, pred, obj_name_norm) — the
# names below are pre-canonicalization normalized forms; the P/R harness maps
# both sides through the produced uuid_map so fuzzy-dup variants count as one.
# IDENTITY names are the ENHANCED normalization (uuid_utils.py:99-155, the
# reference's uuid default): company indicators drop, so "Acme Corp" and
# "Bluebird Corp" identify as "acme" / "bluebird"; "bob" expands to
# "robert". The P/R harness maps both sides through the produced uuid_map,
# so fuzzy-dup variants still count as one.
EXPECTED_TRIPLES: set[tuple[str, str, str]] = {
    ("alice", "LIKES", "robert"),
    ("alice_smith", "WORKS", "acme"),
    ("acme", "HIRED", "carol_jones"),
    ("carol_jones", "MARRIED", "david_lee"),
    ("graphiti", "POWERS", "zep"),  # graphitti folds into graphiti
    ("claude", "HELPS", "anthropic"),
    ("claude_code", "EXTENDS", "claude"),
    ("acme", "ACQUIRED", "widget_works"),
    ("google", "PRAISED", "widget_works"),
    ("bluebird", "OWNS", "nestly"),
    ("bluebird", "OWNS", "firmly"),
    *{(f"google", "LAUNCHED", f"product{i}") for i in range(5)},
    ("google", "EMPLOYS", "sundar_pichai"),
    ("helix_labs", "FUNDED", "nova_robotics"),
}

# Pairs that MUST canonicalize together / apart (dedup scenario table).
EXPECTED_SAME: list[tuple[str, str]] = [("graphiti", "graphitti")]
EXPECTED_DIFFERENT: list[tuple[str, str]] = [("claude", "claude_code")]


def fixture_pages_df(spark):
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    rows = [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in FIXTURE_PAGES]
    return spark.createDataFrame(rows, schema)
