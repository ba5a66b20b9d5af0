"""Versioned extraction-rule library — the batch analog of the
reference's prompt registry (graphiti_core/prompts/lib.py:83-139),
where every LLM prompt lives in a named, versioned catalog and callers
select a version rather than inlining prompt text.

Here the "prompts" are the deterministic rule tables the extractor
clients compile. Registering a new version and constructing the client
with ``version="rules-v2"`` changes extraction output through the SAME
actor-pool stage (stages/extract.extract_all client_factory) with no
pipeline changes — exactly the swap-in point the reference's registry
provides for prompt variants.
"""

from __future__ import annotations

import re

from .extraction import NAME, RELATION_PATTERNS

# name -> (pattern, predicate, date_kind) rows; see
# functions/extraction.py for date_kind semantics.
RULE_VERSIONS: dict[str, list[tuple[str, str, str]]] = {
    # the shipped default every pipeline and oracle uses
    "rules-v1": list(RELATION_PATTERNS),
    # an extended variant: two extra relation rules. Exists so the
    # versioning seam is exercised by a real behavioral difference,
    # not as a second production ruleset.
    "rules-v2": list(RELATION_PATTERNS)
    + [
        (rf"({NAME}) founded ({NAME}) in (\d{{4}})\.", "FOUNDED", "year3"),
        (rf"({NAME}) studied at ({NAME})\.", "STUDIED_AT", "none"),
    ],
}

DEFAULT_VERSION = "rules-v1"


def get_rules(version: str = DEFAULT_VERSION) -> list[tuple[str, str, str]]:
    """Look up a rule-table version; unknown names fail loudly with the
    catalog (prompts/lib.py raises the same way on a bad prompt path)."""
    try:
        return RULE_VERSIONS[version]
    except KeyError:
        raise KeyError(
            f"unknown rule version {version!r}; available: "
            f"{sorted(RULE_VERSIONS)}"
        ) from None


def compile_rules(version: str = DEFAULT_VERSION) -> list[tuple[re.Pattern, str, str]]:
    return [(re.compile(p), pred, dk) for p, pred, dk in get_rules(version)]


def register_rules(version: str, rows: list[tuple[str, str, str]]) -> None:
    """User extension point: add a named rule set (the analog of
    handing Graphiti a custom prompt_library). Re-registration of an
    existing name is rejected — versions are immutable once published.

    Scope caveat: this mutates the registry of the CALLING process
    only. Ray actors import this module fresh, so a custom version must
    reach them as constructor state — pass the rows to the client
    (``DeterministicExtractorClient(version=name, rules=rows)``), which
    self-registers in each worker; a bare ``version=name`` would raise
    KeyError at actor init."""
    if version in RULE_VERSIONS:
        raise ValueError(f"rule version {version!r} already registered")
    RULE_VERSIONS[version] = list(rows)
