"""Entity-type classification (custom entity types, SURVEY.md §2.9).

The reference lets callers pass ``entity_types: dict[str, BaseModel]``;
an LLM classifies each extracted entity and fills the matching model's
fields into ``EntityNode.attributes``
(graphiti_core/utils/maintenance/node_operations.py:156-185,339-376;
prebuilt types under mcp_server/entity_types/). The deterministic
default here is a rule-based classifier over the surface form — the
same seam (swap ``classify`` for an LLM call) with reproducible
outputs. Attributes are emitted as a JSON string column (open schema,
nodes.py:258-260 ``attributes: dict[str, Any]``).
"""

from __future__ import annotations

import json

ORG_SUFFIXES = frozenset(
    {"corp", "labs", "systems", "group", "industries", "inc", "ltd", "llc", "gmbh"}
)


def classify(name: str) -> tuple[str, dict[str, str]]:
    """(label, attributes) for an entity surface form.

    Rules: a token from the organization-suffix lexicon -> Organization
    (attribute: suffix); multi-token or initial-dot forms -> Person
    (attributes: first/last); anything else -> the base Entity label.
    """
    tokens = name.split()
    lowered = [t.lower().strip(".") for t in tokens]
    for t in lowered:
        if t in ORG_SUFFIXES:
            return "Organization", {"suffix": t}
    if len(tokens) >= 2:
        return "Person", {"first": tokens[0].rstrip("."), "last": tokens[-1]}
    return "Entity", {}


def classify_with(name: str, entity_types: dict | None) -> tuple[str, dict]:
    """Classification with USER-SUPPLIED entity types — the analog of
    the reference's ``entity_types: dict[str, BaseModel]`` surface
    (node_operations.py:339-376, mcp_server/entity_types/): the caller
    passes ``{type_name: {"match": name -> bool,
    "attributes": name -> dict}}``; specs are tried in dict order
    (first match wins) before the built-in rules. The callables are the
    deterministic stand-in for the LLM classify-and-fill pass; they
    ship to extraction workers via normal Ray serialization."""
    if entity_types:
        for tname, spec in entity_types.items():
            if spec["match"](name):
                attrs_fn = spec.get("attributes")
                return tname, (attrs_fn(name) if attrs_fn else {})
    return classify(name)


def labels_of(name: str, entity_types: dict | None = None) -> list[str]:
    """Graphiti-style label list: always the base Entity label plus the
    classified type (nodes.py:82 labels include 'Entity')."""
    label, _ = classify_with(name, entity_types)
    return ["Entity"] if label == "Entity" else ["Entity", label]


def attributes_json(name: str, entity_types: dict | None = None) -> str:
    _, attrs = classify_with(name, entity_types)
    return json.dumps(attrs, sort_keys=True)
