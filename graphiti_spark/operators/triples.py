"""S4 — deterministic (subj, pred, obj) triple extraction.

Replaces the reference's LLM edge extraction (``extract_edges``,
/root/reference/graphiti_core/utils/maintenance/edge_operations.py:190-324)
with sentence-pattern extraction under the same output contract
(prompts/extract_edges.py:107-124):
 - both endpoints must be distinct extracted entities,
 - predicate is SCREAMING_SNAKE_CASE,
 - ``fact`` quotes the source sentence,
 - explicit dates in the sentence become valid_at; a dateless PRESENT-tense
   fact is "ongoing" and adopts the episode reference time; a dateless
   past-tense fact leaves valid_at null (DATETIME RULES,
   prompts/extract_edges.py:117-122),
 - episodes provenance list = [episode_uuid].

Pattern: within a sentence, for each adjacent entity-mention pair (E1, E2),
the token span between them is the predicate phrase if it is 1..6 tokens and
contains a verb-like token. Deterministic; no reflexion loop needed.

Execution shape: pandas UDF (text -> array<struct triple>) + explode; then
JVM-side uuid/predicate normalization. Shuffle-free map stage.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.session import session_pandas_udf
from pyspark.sql.types import ArrayType, BooleanType, StringType, StructField, StructType

from graphiti_spark.functions.ids import edge_uuid_udf, entity_uuid_udf
from graphiti_spark.functions.normalize import predicate_name_py
from graphiti_spark.operators.ner import (
    _ISO_DATEISH,
    _URLISH,
    extract_mentions_py,
    split_messages,
    split_sentences,
)

# Verbs common in SVO facts; supplements the morphological heuristic.
_VERB_LIST = frozenset(
    """is are was were has have had works likes loves hates knows owns runs
    leads founded created built wrote directs manages joined left acquired
    bought sold hired fired married met visited moved lives lived teaches
    studies studied develops developed maintains launched announced released
    reported said told became becomes makes made uses used supports opposes
    won lost plays played sings sang produces produced employs partnered
    collaborates invested funds funded heads chairs governs rules serves
    served represents endorsed criticized sued praised helps helped likes
    attended graduated retired resigned appointed elected nominated""".split()
)

_STOP_EDGE = frozenset("the a an and or but of in on at to for with by from as".split())
_TOKEN_RE = re.compile(r"[A-Za-z0-9'’-]+")
_YEAR_RE = re.compile(r"\b(?:since|in|from|on)\s+((?:\d{1,2}\s+)?(?:\w+\s+)?(\d{4}))\b", re.IGNORECASE)
_ISO_RE = re.compile(r"\b(\d{4}-\d{2}-\d{2})\b")
_UNTIL_RE = re.compile(r"\buntil\s+((?:\d{1,2}\s+)?(?:\w+\s+)?(\d{4}))\b", re.IGNORECASE)


def _verbish(tok: str) -> bool:
    low = tok.lower()
    if low in _VERB_LIST:
        return True
    if low in _STOP_EDGE or low in {"its", "his", "her", "their"}:
        return False
    return len(low) > 3 and (low.endswith("ed") or low.endswith("ing") or low.endswith("s"))


# Irregular past forms that don't end in -ed (the -ed suffix and this list
# jointly classify the fact's tense for the DATETIME RULES below).
_IRREGULAR_PAST = frozenset(
    """was were had met sold won lost sang wrote built left became made said
    told bought""".split()
)


def _is_present_tense(tok: str) -> bool:
    """Deterministic tense classifier for the reference's DATETIME RULES
    (prompts/extract_edges.py:117-122): an ONGOING (present-tense) fact
    adopts REFERENCE_TIME as valid_at; a past-tense fact with no explicit
    date leaves valid_at null. English morphology: -ed and the irregular
    list are past; everything else verbish (is/has/owns/uses/-s forms,
    -ing) is treated as present/ongoing."""
    low = tok.lower()
    if low in _IRREGULAR_PAST or low.endswith("ed"):
        return False
    return True


def _triple_ongoing(toks: list[str]) -> bool:
    """Tense of a predicate token span = tense of its first verbish token."""
    for t in toks:
        if _verbish(t):
            return _is_present_tense(t)
    return True


def _extract_dates(sent: str) -> tuple[str | None, str | None]:
    """(valid_at_str, invalid_at_str) as 'YYYY[-MM-DD]' when explicit."""
    valid = invalid = None
    m = _ISO_RE.search(sent)
    if m:
        valid = m.group(1)
    else:
        m = _YEAR_RE.search(sent)
        if m:
            valid = m.group(2)
    m = _UNTIL_RE.search(sent)
    if m:
        invalid = m.group(2)
    return valid, invalid


def extract_triples_py(text: str) -> list[tuple[str, str, str, str, str | None, str | None]]:
    """[(subj_name, pred, obj_name, fact, valid_at_str?, invalid_at_str?)]."""
    out = []
    if not text:
        return out
    for _sent_off, sent in split_sentences(text):
        mentions = extract_mentions_py(sent)
        if len(mentions) < 2:
            continue
        valid_s, invalid_s = _extract_dates(sent)
        fact = re.sub(r"\s+", " ", sent).strip()
        for (n1, _s1, e1), (n2, s2, _e2) in zip(mentions, mentions[1:]):
            if n1 == n2:
                continue
            span = sent[e1:s2]
            toks = _TOKEN_RE.findall(span)
            if not 1 <= len(toks) <= 6:
                continue
            if not any(_verbish(t) for t in toks):
                continue
            pred_toks = [t for t in toks if t.lower() not in _STOP_EDGE] or toks
            pred = predicate_name_py(" ".join(pred_toks))
            if not pred:
                continue
            out.append((n1, pred, n2, fact, valid_s, invalid_s, _triple_ongoing(toks)))
    return out


_FIRST_PERSON = re.compile(r"^\s*(I|We)\s+([A-Za-z]+)", re.IGNORECASE)
_NAMEISH_KEYS = ("name", "title", "id")


def extract_triples_message_py(text: str) -> list[tuple[str, str, str, str, str | None, str | None]]:
    """Message-source triples: run the sentence extractor over each
    utterance body, plus the speaker-pronoun rule — an utterance sentence
    opening 'I/We <verb> ... <Entity>' yields (speaker, VERB, entity)
    (prompts/extract_nodes.py:92-95 pronoun disambiguation: he/she/I resolve
    to the dialogue actor). Deterministic."""
    out = []
    if not text:
        return out
    for _sp_off, speaker, _utt_off, utterance in split_messages(text):
        out.extend(extract_triples_py(utterance))
        if not speaker:
            continue
        for _off, sent in split_sentences(utterance):
            m = _FIRST_PERSON.match(sent)
            if not m or not _verbish(m.group(2)):
                continue
            mentions = extract_mentions_py(sent)
            if not mentions:
                continue
            obj = mentions[0][0]
            if obj == speaker:
                continue
            valid_s, invalid_s = _extract_dates(sent)
            pred = predicate_name_py(m.group(2))
            fact = re.sub(r"\s+", " ", f"{speaker}: {sent}").strip()
            if pred:
                out.append(
                    (speaker, pred, obj, fact, valid_s, invalid_s,
                     _is_present_tense(m.group(2)))
                )
    return out


def extract_triples_json_py(text: str) -> list[tuple[str, str, str, str, str | None, str | None]]:
    """JSON-source triples: each object carrying a name-ish key yields
    (name, FIELD, value) for its other string-leaf fields — the structured
    twin of the reference's extract_edges over EpisodeType.json content.
    Nested objects/lists recurse; non-string scalars are attributes, not
    entities, and are skipped (endpoints must be entities,
    prompts/extract_edges.py:107-124). Date-like and URL-like values are
    likewise NOT endpoints — the same exclusion extract_mentions_json_py
    applies (prompts/extract_nodes.py:107-109: dates are edge attributes,
    not entities); a date-valued field instead contributes the edge-date of
    its subject's other triples when they carry none. Before this rule the
    json path emitted e.g. (X, SINCE, "2020-01-01") edges whose target uuid
    existed in no node table — dangling endpoints, caught by the
    hand-derived fixture audit, not by the pinned goldens. Malformed JSON
    yields nothing."""
    import json

    out = []
    if not text:
        return out
    try:
        doc = json.loads(text)
    except (ValueError, TypeError):
        return out

    def _subject_of(d: dict) -> str | None:
        for k in _NAMEISH_KEYS:
            v = d.get(k)
            if isinstance(v, str) and v.strip():
                return v.strip()
        return None

    def _walk(v):
        if isinstance(v, list):
            for vv in v:
                _walk(vv)
            return
        if not isinstance(v, dict):
            return
        subj = _subject_of(v)
        # First date-like string field (document order) becomes the valid_at
        # of the dict's other triples when they carry no explicit date —
        # {"name": "Acme", "employer": "Globex", "since": "2020-01-01"}
        # dates the EMPLOYER edge instead of minting a date entity
        # (extract_edge_dates parity, edge_operations.py:291-305).
        dict_date = None
        for vv in v.values():
            if isinstance(vv, str):
                s = vv.strip()
                if _ISO_DATEISH.match(s):
                    m = _ISO_RE.search(s)
                    if m:
                        dict_date = m.group(1)
                    elif re.fullmatch(r"\d{4}", s):
                        dict_date = s
                    if dict_date:
                        break
        for k, vv in v.items():
            if isinstance(vv, (dict, list)):
                _walk(vv)
                continue
            if subj is None or k in _NAMEISH_KEYS or not isinstance(vv, str):
                continue
            obj = vv.strip()
            if not obj or len(obj) > 80 or obj == subj:
                continue
            # endpoints must be entities: date-like / URL-like values are
            # excluded exactly like extract_mentions_json_py excludes them
            if _ISO_DATEISH.match(obj) or _URLISH.match(obj):
                continue
            pred = predicate_name_py(k)
            if not pred:
                continue
            valid_s, invalid_s = _extract_dates(obj)
            if valid_s is None:
                valid_s = dict_date
            fact = f"{subj} {k} {obj}"
            # a json document states the entity's CURRENT fields -> ongoing
            out.append((subj, pred, obj, fact, valid_s, invalid_s, True))

    _walk(doc)
    return out


def extract_triples_dispatch_py(text: str, source: str):
    """EpisodeType dispatch for edge extraction (edge_operations.py:190-324
    selects per-source prompts)."""
    if source == "message":
        return extract_triples_message_py(text)
    if source == "json":
        return extract_triples_json_py(text)
    return extract_triples_py(text)


_TRIPLE_SCHEMA = ArrayType(
    StructType(
        [
            StructField("subj_name", StringType()),
            StructField("pred", StringType()),
            StructField("obj_name", StringType()),
            StructField("fact", StringType()),
            StructField("valid_at_str", StringType()),
            StructField("invalid_at_str", StringType()),
            StructField("ongoing", BooleanType()),
        ]
    )
)


@session_pandas_udf(_TRIPLE_SCHEMA)
def extract_triples_udf(text: pd.Series) -> pd.Series:
    return pd.Series([extract_triples_py(t if t is not None else "") for t in text])


@session_pandas_udf(_TRIPLE_SCHEMA)
def extract_triples_src_udf(text: pd.Series, source: pd.Series) -> pd.Series:
    return pd.Series(
        [
            extract_triples_dispatch_py(t if t is not None else "", s or "text")
            for t, s in zip(text, source)
        ]
    )


def _parse_date_col(c):
    """'YYYY' or 'YYYY-MM-DD' (or 'Month YYYY' tail) -> timestamp.
    ISO parse with fallbacks mirrors edge_operations.py:291-305."""
    year_only = F.to_timestamp(F.concat(c, F.lit("-01-01")), "yyyy-MM-dd")
    iso = F.to_timestamp(c, "yyyy-MM-dd")
    return F.when(c.rlike(r"^\d{4}$"), year_only).otherwise(iso)


def triples_stage(episodes: DataFrame) -> DataFrame:
    """episodes -> raw triples DF (pre-canonicalization).

    Columns: episode_uuid, group_id, source_entity_uuid, target_entity_uuid,
    subj_name, name (predicate), obj_name, fact, valid_at, invalid_at,
    created_at. Endpoint uuids use extraction-time identity; S6/S7 remap them
    to canonical uuids — same two-phase shape as the reference
    (extract -> resolve_edge_pointers, graphiti.py:505).
    """
    # EpisodeType dispatch mirrors mentions_stage: per-row source column.
    if "source" in episodes.columns:
        tr_arr = extract_triples_src_udf(F.col("content"), F.col("source"))
    else:
        tr_arr = extract_triples_udf(F.col("content"))
    t = (
        episodes.select(
            F.col("uuid").alias("episode_uuid"),
            "group_id",
            F.col("valid_at").alias("episode_valid_at"),
            "created_at",
            F.explode(tr_arr).alias("tr"),
        )
        .select(
            "episode_uuid",
            "group_id",
            "created_at",
            "episode_valid_at",
            F.col("tr.subj_name").alias("subj_name"),
            F.col("tr.pred").alias("name"),
            F.col("tr.obj_name").alias("obj_name"),
            F.col("tr.fact").alias("fact"),
            F.col("tr.valid_at_str").alias("valid_at_str"),
            F.col("tr.invalid_at_str").alias("invalid_at_str"),
            F.col("tr.ongoing").alias("ongoing"),
        )
        .filter((F.col("subj_name") != "") & (F.col("obj_name") != "") & (F.col("name") != ""))
    )
    # DATETIME RULES (extract_edges.py:117-122): explicit date wins; an
    # ONGOING (present-tense) fact adopts the episode reference time; a
    # past-tense fact with no stated date leaves valid_at null.
    t = t.withColumn(
        "valid_at",
        F.coalesce(
            _parse_date_col(F.col("valid_at_str")),
            F.when(F.col("ongoing"), F.col("episode_valid_at")),
        ),
    ).withColumn("invalid_at", _parse_date_col(F.col("invalid_at_str")))
    t = t.withColumn("source_entity_uuid", entity_uuid_udf("subj_name", "group_id")).withColumn(
        "target_entity_uuid", entity_uuid_udf("obj_name", "group_id")
    )
    # Self-loops excluded: endpoints must be distinct entities
    # (edge_operations.py:283-289 id-validation analog).
    t = t.filter(F.col("source_entity_uuid") != F.col("target_entity_uuid"))
    return t.drop("valid_at_str", "invalid_at_str", "episode_valid_at", "ongoing")
