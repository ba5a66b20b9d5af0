"""Single-process reference-semantics oracle (SURVEY.md §5b).

A deliberately simple, sequential, dict-and-loop implementation of the
same construction semantics — exact dedup (node_name_match,
bulk_utils.py:243-253), all-pairs near-dup within a group (the
compress_nodes fixpoint, bulk_utils.py:256-327, with the deterministic
alias matcher standing in for the LLM verdict), pointer rewrite
(bulk_utils.py:367-374), per-pair edge dedupe (chunk_edges_by_nodes +
dedupe_edge_list, bulk_utils.py:417-434, edge_operations.py:351-381) and
the T2/T3 temporal sweep (edge_operations.py:234-305).

It shares ONLY the leaf extraction/normalization functions with the Ray
pipeline; all resolution logic is written independently (O(n^2), no
blocking, no shuffles) so the P/R comparison genuinely cross-checks the
distributed canonicalization. Target: P/R = 1.0 with the deterministic
extractor (>=0.95 required by the north rule).
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa

from ..functions.extraction import (
    EXCLUSIVE_PREDICATES,
    alias_match,
    canonical_name_choice,
    compile_patterns,
    extract_episode,
)
from ..functions.hashing import node_uuid
from ..functions.text import html_to_text, normalize_fact, normalize_name
from ..stages.extract import group_id_of


def oracle_triples(pages: pa.Table, now: datetime) -> set[tuple]:
    """Set of (subj, pred, obj, valid_at, invalid_at) after full
    reference-semantics resolution."""
    patterns = compile_patterns()

    # ---- extraction (shared leaf functions)
    # raw node mentions: (group, name) occurrences; raw relations
    names_by_group: dict[str, dict[str, set[str]]] = {}  # group -> norm -> surface forms
    relations: list[dict] = []
    for row in pages.to_pylist():
        if row["lang"] != "en":
            continue
        grp = group_id_of(row["url"])
        content = html_to_text(row["html"], row["text"])
        ex = extract_episode(content, row["warc_ts"], patterns)
        forms = names_by_group.setdefault(grp, {})
        for ent in ex.entities:
            forms.setdefault(normalize_name(ent), set()).add(ent)
        for rel in ex.relations:
            relations.append(
                {
                    "group": grp,
                    "subj_norm": normalize_name(rel.subj),
                    "obj_norm": normalize_name(rel.obj),
                    "pred": rel.pred,
                    "fact_norm": normalize_fact(rel.fact),
                    "valid_at": rel.valid_at,
                    "invalid_at": rel.invalid_at,
                    "created_at": row["warc_ts"],
                }
            )

    # ---- node canonicalization: exact by norm (uuid collision), then
    # all-pairs alias matching within each group + union-find.
    canon_name: dict[tuple[str, str], str] = {}  # (group, norm) -> canonical display name
    for grp, forms in names_by_group.items():
        norms = sorted(forms)
        parent = {n: n for n in norms}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(norms)):
            for j in range(i + 1, len(norms)):
                if alias_match(norms[i], norms[j]):
                    ri, rj = find(norms[i]), find(norms[j])
                    if ri != rj:
                        lo, hi = sorted((ri, rj))
                        parent[hi] = lo
        clusters: dict[str, list[str]] = {}
        for n in norms:
            clusters.setdefault(find(n), []).append(n)
        for members in clusters.values():
            all_forms = [f for m in members for f in sorted(forms[m])]
            # the member owning the winning surface form becomes canonical,
            # mirroring keep-the-existing-node-uuid (stages/canonicalize)
            best = canonical_name_choice(all_forms)
            for m in members:
                canon_name[(grp, m)] = best

    # ---- edge resolution
    # rewrite subj/obj to canonical names; drop self-loops
    merged: dict[tuple, dict] = {}
    for r in relations:
        s = canon_name.get((r["group"], r["subj_norm"]), r["subj_norm"])
        o = canon_name.get((r["group"], r["obj_norm"]), r["obj_norm"])
        if normalize_name(s) == normalize_name(o):
            continue
        key = (r["group"], normalize_name(s), normalize_name(o), r["pred"], r["fact_norm"])
        m = merged.get(key)
        if m is None:
            merged[key] = {
                "group": r["group"],
                "subj": s,
                "obj": o,
                "pred": r["pred"],
                "fact_norm": r["fact_norm"],
                "valid_at": r["valid_at"],
                "invalid_at": r["invalid_at"],
                "created_at": r["created_at"],
            }
        else:
            for f in ("valid_at", "invalid_at", "created_at"):
                if r[f] is not None and (m[f] is None or r[f] < m[f]):
                    m[f] = r[f]

    edges = list(merged.values())

    # fold 'ended' markers into the latest open positive edge of the
    # same (group, subj, obj, pred)
    by_pair: dict[tuple, list[dict]] = {}
    for e in edges:
        by_pair.setdefault(
            (e["group"], normalize_name(e["subj"]), normalize_name(e["obj"]), e["pred"]), []
        ).append(e)
    kept: list[dict] = []
    for pair_edges in by_pair.values():
        markers = [e for e in pair_edges if e["valid_at"] is None and e["invalid_at"] is not None]
        positives = [e for e in pair_edges if e not in markers]
        for mk in markers:
            cands = [p for p in positives if p["valid_at"] is not None and p["valid_at"] < mk["invalid_at"]]
            if cands:
                tgt = max(cands, key=lambda p: (p["valid_at"], p["fact_norm"]))
                if tgt["invalid_at"] is None or mk["invalid_at"] < tgt["invalid_at"]:
                    tgt["invalid_at"] = mk["invalid_at"]
            else:
                positives.append(mk)
        kept.extend(positives)

    # temporal sweep per (group, subj, pred) for exclusive predicates
    by_subj: dict[tuple, list[dict]] = {}
    for e in kept:
        if e["pred"] in EXCLUSIVE_PREDICATES:
            by_subj.setdefault((e["group"], normalize_name(e["subj"]), e["pred"]), []).append(e)
    for group_edges in by_subj.values():
        dated = sorted(
            [e for e in group_edges if e["valid_at"] is not None],
            key=lambda e: (e["valid_at"], e["created_at"]),
        )
        for i, e in enumerate(dated):
            for n in dated[i + 1 :]:
                if normalize_name(n["obj"]) == normalize_name(e["obj"]):
                    continue
                if n["valid_at"] <= e["valid_at"]:
                    continue
                if e["invalid_at"] is not None and e["invalid_at"] <= n["valid_at"]:
                    continue
                if n["invalid_at"] is not None and n["invalid_at"] <= e["valid_at"]:
                    continue
                e["invalid_at"] = n["valid_at"]
                break

    return {
        (e["subj"], e["pred"], e["obj"], e["valid_at"], e["invalid_at"]) for e in kept
    }


def precision_recall(pipeline: set[tuple], oracle: set[tuple]) -> tuple[float, float]:
    if not pipeline or not oracle:
        return (0.0, 0.0)
    tp = len(pipeline & oracle)
    return tp / len(pipeline), tp / len(oracle)
