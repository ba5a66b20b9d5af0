"""Deterministic mention + relation + date extraction (pure logic).

Plays the role of Graphiti's LLM extraction chain:
- entity extraction with reflexion (extract_nodes,
  graphiti_core/utils/maintenance/node_operations.py:121-212)
- fact-triple extraction (extract_edges,
  utils/maintenance/edge_operations.py:73-148)
- edge date extraction with the present-tense->reference-time default
  (extract_edge_dates, utils/maintenance/temporal_operations.py:32-68;
  rule 3 of prompts/extract_edge_dates.py:78)

The reference makes these pluggable LLMClient calls
(llm_client/client.py:47-114); this module is the deterministic default
implementation (rule-based NER over capitalized spans + pattern
relations), so correctness is reproducible without API keys. An
LLM-backed extractor drops into the same actor-pool stage
(stages/extract.py) behind the same signature.

Shared verbatim by the distributed pipeline AND the single-process
oracle (pipelines/oracle.py): the P/R comparison then isolates the
*distributed* canonicalization/temporal logic, which is what must match
reference semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime

# Capitalized span: one or more Capitalized words, allowing "K." initials.
NAME = r"(?:[A-Z][A-Za-z]*\.?)(?: [A-Z][A-Za-z]*\.?)*"

# (pattern, predicate, date_kind) — date_kind in
# {present, year3, asof, none, ended}
RELATION_PATTERNS: list[tuple[str, str, str]] = [
    (rf"({NAME}) works for ({NAME})\.", "WORKS_FOR", "present"),
    (rf"({NAME}) no longer works for ({NAME})\.", "WORKS_FOR", "ended"),
    (rf"({NAME}) lives in ({NAME})\.", "LIVES_IN", "present"),
    (rf"({NAME}) was born in ({NAME})\.", "BORN_IN", "none"),
    (rf"({NAME}) moved to ({NAME}) in (\d{{4}})\.", "MOVED_TO", "year3"),
    (rf"As of (\d{{4}}-\d{{2}}-\d{{2}}), ({NAME}) is the ([a-z ]+) of ({NAME})\.", "HOLDS_ROLE", "asof"),
    (rf"({NAME}) is married to ({NAME})\.", "SPOUSE_OF", "present"),
    (rf"({NAME}) acquired ({NAME}) in (\d{{4}})\.", "ACQUIRED", "year3"),
]

# Predicates where a subject can hold only one object at a time; a newer
# fact contradicts (and temporally closes) an older one — the
# deterministic stand-in for get_edge_contradictions
# (temporal_operations.py:71-103).
EXCLUSIVE_PREDICATES = frozenset({"WORKS_FOR", "LIVES_IN", "HOLDS_ROLE"})

_SENT_SPLIT = re.compile(r"\n")
_NAME_RE = re.compile(NAME)
_LEADING_STOP = frozenset({"The", "A", "As", "In", "On", "It", "Several", "Local", "Markets"})


def compile_patterns() -> list[tuple[re.Pattern, str, str]]:
    return [(re.compile(p), pred, dk) for p, pred, dk in RELATION_PATTERNS]


@dataclass
class ExtractedRelation:
    subj: str
    pred: str
    obj: str
    fact: str
    valid_at: datetime | None
    invalid_at: datetime | None


@dataclass
class EpisodeExtraction:
    entities: list[str] = field(default_factory=list)  # surface forms, order of first mention
    relations: list[ExtractedRelation] = field(default_factory=list)


def extract_episode(
    content: str,
    reference_time: datetime,
    patterns: list[tuple[re.Pattern, str, str]],
) -> EpisodeExtraction:
    """Extract entity mentions and relations from one episode.

    ``reference_time`` plays the role of the episode's valid_at
    (= warc_ts): present-tense facts default to it, matching date-rule 3
    of prompts/extract_edge_dates.py:78.
    """
    out = EpisodeExtraction()
    seen: set[str] = set()

    def add_entity(name: str) -> None:
        if name not in seen:
            seen.add(name)
            out.entities.append(name)

    for sent in _SENT_SPLIT.split(content):
        sent = sent.strip()
        if not sent:
            continue
        matched_any = False
        for rex, pred, dk in patterns:
            for m in rex.finditer(sent):
                matched_any = True
                valid_at: datetime | None = None
                invalid_at: datetime | None = None
                if dk == "present":
                    subj, obj = m.group(1), m.group(2)
                    valid_at = reference_time
                elif dk == "ended":
                    subj, obj = m.group(1), m.group(2)
                    invalid_at = reference_time
                elif dk == "year3":
                    subj, obj = m.group(1), m.group(2)
                    valid_at = datetime(int(m.group(3)), 1, 1)
                elif dk == "asof":
                    subj, obj = m.group(2), m.group(4)
                    y, mo, da = m.group(1).split("-")
                    valid_at = datetime(int(y), int(mo), int(da))
                else:
                    subj, obj = m.group(1), m.group(2)
                add_entity(subj)
                add_entity(obj)
                out.relations.append(
                    ExtractedRelation(subj, pred, obj, sent, valid_at, invalid_at)
                )
        if not matched_any:
            # NER sweep over non-relation sentences: capitalized spans of
            # >=2 words, or single words not sentence-initial/stoplisted.
            for m in _NAME_RE.finditer(sent):
                span = m.group(0).rstrip(".")
                if " " in span:
                    add_entity(span)
                elif m.start() != 0 and span not in _LEADING_STOP:
                    add_entity(span)
    return out


# -------------------------------------------------- alias match (dedupe)

def name_tokens(name_norm: str) -> list[str]:
    return name_norm.split()


def surname_key(name_norm: str) -> str:
    """Blocking key for person-alias canonicalization: last token."""
    toks = name_tokens(name_norm)
    return toks[-1] if toks else ""


def alias_match(a_norm: str, b_norm: str) -> bool:
    """Deterministic duplicate verdict — the stand-in for the LLM dedupe
    prompt (prompts/dedupe_nodes.py:47-128). Two normalized names match
    when aligned from the END their tokens agree, allowing a
    single-letter token to match any token with that initial:
      "barton" ~ "ana barton" ~ "a barton"; "ana barton" !~ "eli barton".
    """
    if a_norm == b_norm:
        return True
    ta, tb = name_tokens(a_norm), name_tokens(b_norm)
    if not ta or not tb or ta[-1] != tb[-1]:
        return False
    short, long_ = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
    # align from the end
    off = len(long_) - len(short)
    for i, tok in enumerate(short):
        other = long_[off + i]
        if tok == other:
            continue
        if len(tok) == 1 and other.startswith(tok):
            continue
        if len(other) == 1 and tok.startswith(other):
            continue
        return False
    return True


def name_sort_key(name: str) -> str:
    """Order-preserving encoding of (len(name), name): the longest (then
    lexicographically largest) name is the 'most complete' canonical
    choice — the reference keeps the more complete node on merge
    (node_operations.py:298-412). String-encoded so a distributed Max
    aggregate picks the winner without custom reducers."""
    return f"{len(name):04d}|{name}"


def decode_name_key(key: str) -> str:
    return key[5:]


def canonical_name_choice(names: list[str]) -> str:
    return decode_name_key(max(name_sort_key(n) for n in names))
