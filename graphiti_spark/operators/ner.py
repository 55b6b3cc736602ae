"""S3 — vectorized deterministic NER: episode text -> entity mentions.

Replaces the reference's LLM extraction (``extract_nodes``,
/root/reference/graphiti_core/utils/maintenance/node_operations.py:234-342)
with a rule-based recognizer honoring the same output contract
(prompts/extract_nodes.py:92-109):
 - entity names, no relationship/action entities, no date/time entities,
 - empty names filtered,
 - deterministic entity uuid assigned from (normalized name, group_id),
 - labels = ['Entity'].

Recognizer: maximal runs of capitalized tokens, allowing lowercase connector
words (of/the/for/and/de/van/von) strictly *inside* a run. Sentence-initial
common words are dropped. Pure function of the text -> stable across runs.
The reflexion re-prompt loop (node_operations.py:213-231) is unnecessary:
deterministic extraction has nothing to "miss" on retry.

Execution shape: one Arrow-batched pandas UDF producing
array<struct<name,start_pos,end_pos>> + a JVM-side explode. Shuffle-free.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.session import session_pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

from graphiti_spark.functions.ids import entity_uuid_udf
from graphiti_spark.functions.normalize import normalize_entity_name_col

# Tokens that may appear capitalized at sentence start but are not entities.
_COMMON_WORDS = frozenset(
    """the a an it he she they this that these those we you i his her its their
    our your my there here when where what who how why and but or nor so yet
    after before during since until while because although if then also now
    today yesterday tomorrow meanwhile however moreover later earlier once
    on in at by for with from to of as is are was were be been being has have
    had do does did will would can could may might must shall should not no
    yes all any both each few more most other some such only own same very
    one two three four five six seven eight nine ten many several
    new old first last next previous according""".split()
)

# Date/time words — excluded per prompts/extract_nodes.py:107-109.
_DATE_WORDS = frozenset(
    """january february march april may june july august september october
    november december monday tuesday wednesday thursday friday saturday
    sunday spring summer autumn winter fall""".split()
)

# Lowercase words allowed INSIDE a multi-token entity ("University of Toronto").
_CONNECTORS = frozenset("of the for and de la van von der al el".split())

# Unicode-aware word shape: \w covers accented letters (Café, Müller,
# Wałęsa) so non-ASCII names stay whole instead of fragmenting at each
# accent (the ASCII class [A-Za-z...] split "Café" into "Caf" + stray "M"
# runs — caught by the hand-derived unicode fixtures). Capitalization is
# tested with str.isupper(), which is unicode-aware too.
_WORD_RE = re.compile(r"[\w'’.&-]+", re.UNICODE)
_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def _cap_token(tok: str) -> bool:
    return bool(tok) and tok[0].isupper()


def split_sentences(text: str) -> list[tuple[int, str]]:
    """(offset, sentence) pairs; deterministic regex splitter."""
    out = []
    pos = 0
    for sent in _SENT_SPLIT.split(text):
        idx = text.find(sent, pos)
        if idx < 0:
            idx = pos
        out.append((idx, sent))
        pos = idx + len(sent)
    return out


def _is_entity_token(tok: str) -> bool:
    if not _cap_token(tok):
        return False
    low = tok.lower().rstrip(".")
    if low in _DATE_WORDS:
        return False
    if tok.isdigit():
        return False
    return True


def extract_mentions_py(text: str) -> list[tuple[str, int, int]]:
    """(name, start, end) mentions. Pure deterministic function of text."""
    mentions: list[tuple[str, int, int]] = []
    if not text:
        return mentions
    for sent_off, sent in split_sentences(text):
        words = [(m.group(0), m.start()) for m in _WORD_RE.finditer(sent)]
        i = 0
        while i < len(words):
            tok, off = words[i]
            if _is_entity_token(tok):
                run = [(tok, off)]
                j = i + 1
                pending: list[tuple[str, int]] = []
                while j < len(words):
                    nxt, noff = words[j]
                    if _is_entity_token(nxt):
                        run.extend(pending)
                        run.append((nxt, noff))
                        pending = []
                        j += 1
                    elif nxt.lower() in _CONNECTORS and not pending and len(run) >= 1:
                        pending = [(nxt, noff)]
                        j += 1
                    else:
                        break
                i = j if not pending else j - len(pending)
                # Sentence-initial single common word is not an entity.
                first_tok, first_off = run[0]
                if len(run) == 1 and first_off == 0 and first_tok.lower() in _COMMON_WORDS:
                    continue
                if len(run) == 1 and first_tok.lower() in _COMMON_WORDS:
                    continue
                name = sent[run[0][1] : run[-1][1] + len(run[-1][0])]
                name = name.rstrip(".")
                if name:
                    start = sent_off + run[0][1]
                    mentions.append((name, start, start + len(name)))
            else:
                i += 1
    return mentions


_SPEAKER_RE = re.compile(r"^\s*([A-Za-z][A-Za-z0-9_ .'-]{0,63}?)\s*:\s*(.*)$")
_ISO_DATEISH = re.compile(r"^\d{4}(-\d{2}(-\d{2})?)?([ T].*)?$")
_URLISH = re.compile(r"^\w+://")


def split_messages(text: str) -> list[tuple[int, str, int, str]]:
    """Per line: (speaker_offset, speaker, utterance_offset, utterance).

    EpisodeType.message content is '<actor>: <content>' lines
    (/root/reference/graphiti_core/nodes.py:55-77). Lines without a speaker
    prefix are treated as continuation text with no speaker.
    """
    out = []
    pos = 0
    for line in text.split("\n"):
        m = _SPEAKER_RE.match(line)
        if m:
            out.append((pos + m.start(1), m.group(1), pos + m.start(2), m.group(2)))
        elif line.strip():
            out.append((-1, "", pos, line))
        pos += len(line) + 1
    return out


def extract_mentions_message_py(text: str) -> list[tuple[str, int, int]]:
    """Message-source extraction (speaker-first rule,
    prompts/extract_nodes.py:96): the dialogue actor before the ':' is
    always extracted as an entity, then the utterance body goes through the
    standard recognizer. Deterministic function of the text."""
    mentions: list[tuple[str, int, int]] = []
    if not text:
        return mentions
    for sp_off, speaker, utt_off, utterance in split_messages(text):
        if speaker:
            mentions.append((speaker, sp_off, sp_off + len(speaker)))
        for name, s, e in extract_mentions_py(utterance):
            mentions.append((name, utt_off + s, utt_off + e))
    return mentions


def extract_mentions_json_py(text: str) -> list[tuple[str, int, int]]:
    """JSON-source extraction (EpisodeType.json, nodes.py:66-68;
    prompts/extract_nodes.py extract_json): entities are the string leaf
    values of the document — names, titles, referenced actors — excluding
    date-like and URL-like values (the prompt's date/relationship
    exclusions). Positions locate the first occurrence of the quoted value.
    Malformed JSON falls back to plain-text extraction (the reference would
    surface the raw string to the model the same way)."""
    import json

    if not text:
        return []
    try:
        doc = json.loads(text)
    except (ValueError, TypeError):
        return extract_mentions_py(text)
    leaves: list[str] = []

    def _walk(v):
        if isinstance(v, dict):
            for vv in v.values():
                _walk(vv)
        elif isinstance(v, list):
            for vv in v:
                _walk(vv)
        elif isinstance(v, str):
            leaves.append(v)

    _walk(doc)
    mentions: list[tuple[str, int, int]] = []
    seen: set[str] = set()
    for v in leaves:
        name = v.strip()
        if (
            not name
            or len(name) > 80
            or name in seen
            or _ISO_DATEISH.match(name)
            or _URLISH.match(name)
        ):
            continue
        seen.add(name)
        idx = text.find(f'"{v}"')
        start = idx + 1 if idx >= 0 else 0
        mentions.append((name, start, start + len(name)))
    return mentions


def extract_mentions_dispatch_py(text: str, source: str) -> list[tuple[str, int, int]]:
    """EpisodeType dispatch (node_operations.py:279-291): message/json/text
    pick their extractor; unknown sources default to text."""
    if source == "message":
        return extract_mentions_message_py(text)
    if source == "json":
        return extract_mentions_json_py(text)
    return extract_mentions_py(text)


_MENTION_SCHEMA = ArrayType(
    StructType(
        [
            StructField("name", StringType()),
            StructField("start_pos", IntegerType()),
            StructField("end_pos", IntegerType()),
        ]
    )
)


@session_pandas_udf(_MENTION_SCHEMA)
def extract_mentions_udf(text: pd.Series) -> pd.Series:
    return pd.Series([extract_mentions_py(t if t is not None else "") for t in text])


@session_pandas_udf(_MENTION_SCHEMA)
def extract_mentions_src_udf(text: pd.Series, source: pd.Series) -> pd.Series:
    return pd.Series(
        [
            extract_mentions_dispatch_py(t if t is not None else "", s or "text")
            for t, s in zip(text, source)
        ]
    )


def mentions_stage(episodes: DataFrame) -> DataFrame:
    """episodes -> mentions DF
    (episode_uuid, group_id, name, name_norm, entity_uuid, start_pos, end_pos,
     valid_at, created_at).

    Within-episode exact dedup (resolve_extracted_nodes tier 1,
    node_operations.py:364-381) falls out of dropDuplicates on
    (episode_uuid, entity_uuid); cross-episode exact dedup is free because the
    uuid is a pure function of (normalized name, group_id).
    """
    # EpisodeType dispatch (node_operations.py:279-291): per-row source
    # column selects the message/json/text extractor inside ONE Arrow batch
    # — no per-type job, no extra pass.
    if "source" in episodes.columns:
        m_arr = extract_mentions_src_udf(F.col("content"), F.col("source"))
    else:
        m_arr = extract_mentions_udf(F.col("content"))
    exploded = (
        episodes.select(
            F.col("uuid").alias("episode_uuid"),
            "group_id",
            "valid_at",
            "created_at",
            F.explode(m_arr).alias("m"),
        )
        .select(
            "episode_uuid",
            "group_id",
            "valid_at",
            "created_at",
            F.col("m.name").alias("name"),
            F.col("m.start_pos").alias("start_pos"),
            F.col("m.end_pos").alias("end_pos"),
        )
        .filter(F.col("name") != "")
    )
    exploded = exploded.withColumn("name_norm", normalize_entity_name_col("name")).filter(
        F.col("name_norm") != ""
    )
    return exploded.withColumn("entity_uuid", entity_uuid_udf("name", "group_id"))
