"""Offline eval harness — the batch analog of the reference's eval
prompt surface (graphiti_core/prompts/eval.py: query_expansion,
qa_prompt, eval_prompt; wired via prompts/lib.py:136).

The reference shapes three LLM calls: rephrase a question into a
retrieval query, answer it from retrieved entity summaries + facts,
and judge the answer against an expected response. This module
re-expresses that loop batch-first:

- ``expand_query``            -> query_expansion (deterministic rule)
- ``DeterministicQAClient``   -> qa_prompt (pluggable; any object with
                                 ``answer(question, facts) -> str``
                                 drops in — e.g. a remote client built
                                 on functions/remote_clients.HttpTransport)
- ``grade_answers``           -> eval_prompt (exact-match grader +
                                 accuracy aggregate; the LLM-judge seam
                                 is the same ``grade`` method surface)
- ``qa_over_edges``           -> the distributed QA loop: facts are
                                 grouped per subject through ONE
                                 bucketed exchange, questions join their
                                 subject's fact context, an actor-pool
                                 stage answers per batch

Scale shape: facts-per-subject is a groupby on the canonical subject
(bounded per entity, no skew beyond entity degree); questions join via
the same key; answering is embarrassingly parallel. Nothing collects on
the driver except the final accuracy row.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_INTERROGATIVE = re.compile(
    r"^(who|what|where|when|which|how)\s+(does|do|did|is|are|was|were)\s+",
    re.IGNORECASE,
)


def expand_query(question: str) -> str:
    """query_expansion analog: rephrase a QA question into a retrieval
    query — strip the interrogative scaffold and the trailing '?', keep
    the content terms in order ("Who does Anera Barwick work for?" ->
    "Anera Barwick work for"). Deterministic so reruns retrieve
    identically; a model-backed rephraser can replace it behind the
    same str -> str surface."""
    q = question.strip()
    q = _INTERROGATIVE.sub("", q)
    return q.rstrip("?").strip()


# intent routing: which predicate a question form asks about
_INTENTS = [
    (re.compile(r"^who does .+ work for\?$", re.IGNORECASE), "WORKS_FOR"),
    (re.compile(r"^where does .+ live\?$", re.IGNORECASE), "LIVES_IN"),
]


def question_intent(question: str) -> str | None:
    for rex, pred in _INTENTS:
        if rex.match(question.strip()):
            return pred
    return None


class DeterministicQAClient:
    """qa_prompt analog: answer from the subject's fact rows.

    Rule (temporal-aware, matching what a correct reader of the KG
    would do): among the subject's facts whose predicate matches the
    question intent, prefer OPEN facts (invalid_at null), then the
    latest valid_at, then the lexicographically greatest object; the
    answer is that object. Returns '' when nothing matches — graded
    incorrect unless the expected answer is also ''."""

    def answer(self, question: str, facts: list[dict]) -> str:
        pred = question_intent(question)
        if pred is None:
            return ""
        cand = [f for f in facts if f.get("pred") == pred]
        if not cand:
            return ""
        def key(f):
            open_ = f.get("invalid_at") is None
            v = f.get("valid_at")
            return (open_, v is not None, v or 0, f.get("obj") or "")
        return max(cand, key=key).get("obj") or ""


def facts_by_subject(edges_ds):
    """Canonical edges -> one row per (group_id, subj) with the
    subject's fact context as parallel lists — ONE groupby exchange,
    vectorized assembly."""
    import pandas as pd

    def _us(x):
        return None if pd.isna(x) else int(pd.Timestamp(x).value // 1000)

    def fold(df: "pd.DataFrame") -> "pd.DataFrame":
        # timestamps ride the exchange as nullable int64 microseconds:
        # list<timestamp> columns round-trip pandas<->Arrow with
        # ns/us unit drift, int64 lists do not
        out = (
            df.groupby(["group_id", "subj"], sort=True)
            .apply(
                lambda g: pd.Series(
                    {
                        "preds": g["pred"].tolist(),
                        "objs": g["obj"].tolist(),
                        "valids": [_us(x) for x in g["valid_at"]],
                        "invalids": [_us(x) for x in g["invalid_at"]],
                    }
                ),
                include_groups=False,
            )
            .reset_index()
        )
        return out

    return (
        edges_ds.select_columns(
            ["group_id", "subj", "pred", "obj", "valid_at", "invalid_at"]
        )
        .groupby(["group_id", "subj"])
        .map_groups(fold, batch_format="pandas")
    )


class _QAStage:
    """Actor-pool QA stage: client built once per actor in __init__
    (the A1-style seam), one batch of questions answered per call."""

    def __init__(self, client_factory=None):
        self.client = (client_factory or DeterministicQAClient)()

    def __call__(self, t: pa.Table) -> pa.Table:
        qs = t.column("question").to_pylist()
        preds = t.column("preds").to_pylist()
        objs = t.column("objs").to_pylist()
        valids = t.column("valids").to_pylist()
        invalids = t.column("invalids").to_pylist()
        answers = []
        for q, ps, os_, vs, ivs in zip(qs, preds, objs, valids, invalids):
            facts = [
                {"pred": p, "obj": o, "valid_at": v, "invalid_at": iv}
                for p, o, v, iv in zip(ps or [], os_ or [], vs or [], ivs or [])
            ]
            answers.append(self.client.answer(q, facts))
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "subj": t.column("subj"),
                "question": t.column("question"),
                "answer": pa.array(answers, pa.string()),
            }
        )


def qa_over_edges(edges_ds, questions_ds, client_factory=None,
                  concurrency: int | tuple[int, int] = 2):
    """Distributed QA: questions (group_id, subj, question) pick up
    their subject's fact context and are answered by the client pool.

    The join routes through stages/joins.lookup_column tiers is not
    needed here: both sides are keyed on (group_id, subj), so a single
    groupby exchange co-locates them (facts rows are tagged 0,
    questions 1, and the reducer emits question rows with the fact
    lists attached)."""
    import pandas as pd

    def tag(ds, is_q: int, cols: dict):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrs = {
                k: (t.column(k).cast(typ) if k in t.schema.names
                    else pa.nulls(n, typ))
                for k, typ in cols.items()
            }
            arrs["_isq"] = pa.array([is_q] * n, pa.int8())
            return pa.table(arrs)
        return ds.map_batches(f, batch_format="pyarrow")

    cols = {
        "group_id": pa.string(), "subj": pa.string(),
        "question": pa.string(),
        "preds": pa.list_(pa.string()), "objs": pa.list_(pa.string()),
        "valids": pa.list_(pa.int64()),
        "invalids": pa.list_(pa.int64()),
    }
    facts = facts_by_subject(edges_ds)
    union = tag(facts, 0, cols).union(tag(questions_ds, 1, cols))

    out_schema = pa.schema(
        [("group_id", pa.string()), ("subj", pa.string()),
         ("question", pa.string())]
        + [(k, cols[k]) for k in ("preds", "objs", "valids", "invalids")]
    )

    def attach(df: "pd.DataFrame") -> pa.Table:
        fr = df[df["_isq"] == 0]
        qr = df[df["_isq"] == 1]
        ctx = fr.set_index(["group_id", "subj"])[
            ["preds", "objs", "valids", "invalids"]
        ]
        arrs = {
            "group_id": qr["group_id"].tolist(),
            "subj": qr["subj"].tolist(),
            "question": qr["question"].tolist(),
        }
        keys = pd.MultiIndex.from_frame(qr[["group_id", "subj"]])
        for c in ("preds", "objs", "valids", "invalids"):
            vals = ctx[c].reindex(keys)
            # list columns arrive as numpy arrays inside pandas groups
            # (a missing context is NaN -> []); int64 nulls come back as
            # float nan, so re-null them element-wise before Arrow
            rows = [
                list(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__")
                else []
                for v in vals
            ]
            if c in ("valids", "invalids"):
                rows = [
                    [None if pd.isna(e) else int(e) for e in r] for r in rows
                ]
            arrs[c] = rows
        # explicit Arrow construction: ragged lists must not take Ray's
        # pandas-block TensorArray cast path
        return pa.table(
            {k: pa.array(arrs[k], out_schema.field(k).type) for k in arrs}
        )

    joined = union.groupby(["group_id", "subj"]).map_groups(
        attach, batch_format="pandas"
    )
    return joined.map_batches(
        _QAStage,
        fn_constructor_kwargs={"client_factory": client_factory},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def grade_answers(answers_ds, expected_ds):
    """eval_prompt analog: join answers to expected responses on
    (group_id, subj, question), grade exact-match on the normalized
    strings, return per-question verdict rows plus is_correct for a
    driver-side accuracy aggregate (``.mean('is_correct')``). A
    model-judge can replace the rule by mapping over the same rows."""
    from .stages.joins import lookup_column

    def ekey(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("group_id").cast(pa.string()),
            t.column("subj").cast(pa.string()),
            t.column("question").cast(pa.string()), "\x1f",
        )
        return pa.table({"k": k, "expected": t.column("expected")})

    def akey(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("group_id").cast(pa.string()),
            t.column("subj").cast(pa.string()),
            t.column("question").cast(pa.string()), "\x1f",
        )
        return t.append_column("k", k)

    joined = lookup_column(
        answers_ds.map_batches(akey, batch_format="pyarrow"),
        "k",
        expected_ds.map_batches(ekey, batch_format="pyarrow"),
        "k",
        "expected",
        "expected",
    )

    def grade(t: pa.Table) -> pa.Table:
        ans = pc.utf8_lower(pc.utf8_trim_whitespace(t.column("answer")))
        exp = pc.utf8_lower(
            pc.utf8_trim_whitespace(
                pc.coalesce(t.column("expected"), pa.scalar("", pa.string()))
            )
        )
        ok = pc.equal(ans, exp)
        return pa.table(
            {
                "group_id": t.column("group_id"),
                "subj": t.column("subj"),
                "question": t.column("question"),
                "answer": t.column("answer"),
                "expected": t.column("expected"),
                "is_correct": ok,
            }
        )

    return joined.map_batches(grade, batch_format="pyarrow")


def questions_from_edges(edges_ds):
    """Synthesize the QA dataset from the KG itself: one WORKS_FOR and
    one LIVES_IN question per subject that has such an edge (the
    stand-in for an external QA benchmark; a real one arrives as a
    parquet of (group_id, subj, question, expected))."""
    templates = {
        "WORKS_FOR": "Who does {s} work for?",
        "LIVES_IN": "Where does {s} live?",
    }

    def gen(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["group_id", "subj", "pred"]).to_pandas()
        df = df[df["pred"].isin(templates)].drop_duplicates()
        df["question"] = [
            templates[p].format(s=s) for p, s in zip(df["pred"], df["subj"])
        ]
        return pa.Table.from_pandas(
            df[["group_id", "subj", "question"]], preserve_index=False
        )

    # per-batch generation can duplicate (subject, pred) across blocks;
    # a distinct pass collapses them (tiny output: one row per entity
    # per template)
    return edges_ds.map_batches(gen, batch_format="pyarrow").groupby(
        ["group_id", "subj", "question"]
    ).count().drop_columns(["count()"])
