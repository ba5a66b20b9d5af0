"""Offline QA eval harness (evals.py — prompts/eval.py analog).

The distributed QA loop over the hash-checked KG must answer every
synthesized question correctly when graded against a DuckDB-derived
expected set that applies the same temporal-aware reading rule (open
facts first, then latest valid_at) — and the grader must actually
discriminate (planted-wrong answers grade incorrect)."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

_EXPECTED_BODY = """
SELECT grp AS group_id, subj,
  CASE pred WHEN 'WORKS_FOR' THEN 'Who does ' || subj || ' work for?'
            ELSE 'Where does ' || subj || ' live?' END AS question,
  obj AS expected
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY grp, subj, pred
    ORDER BY (invalid_at IS NULL) DESC, (valid_at IS NOT NULL) DESC,
             valid_at DESC NULLS LAST, obj DESC) AS rn
  FROM swept WHERE pred IN ('WORKS_FOR', 'LIVES_IN')
) WHERE rn = 1
"""


def _expected_df():
    from graphiti_ray import queries as q

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    df = con.execute(q._kg_docs_sql(_EXPECTED_BODY)).df()
    con.close()
    return df


def test_expand_query_strips_interrogative_scaffold():
    from graphiti_ray.evals import expand_query

    assert expand_query("Who does Anera Barwick work for?") == (
        "Anera Barwick work for"
    )
    assert expand_query("Where does Barwick live?") == "Barwick live"
    assert expand_query("plain retrieval terms") == "plain retrieval terms"


def test_qa_client_prefers_open_then_latest():
    from graphiti_ray.evals import DeterministicQAClient

    c = DeterministicQAClient()
    q = "Who does Anera Barwick work for?"
    facts = [
        {"pred": "WORKS_FOR", "obj": "Newer Closed Corp",
         "valid_at": 200, "invalid_at": 300},
        {"pred": "WORKS_FOR", "obj": "Older Open Corp",
         "valid_at": 100, "invalid_at": None},
        {"pred": "LIVES_IN", "obj": "Dorvale",
         "valid_at": 150, "invalid_at": None},
    ]
    assert c.answer(q, facts) == "Older Open Corp"  # open beats newer
    # no open fact -> latest valid_at
    closed = [f for f in facts if f["pred"] == "WORKS_FOR"]
    closed[1] = {**closed[1], "invalid_at": 400}
    assert c.answer(q, closed) == "Newer Closed Corp"
    assert c.answer("Where does Anera Barwick live?", facts) == "Dorvale"
    assert c.answer("What is the meaning of life?", facts) == ""


def test_eval_qa_accuracy_one_vs_duckdb_expected(ray_session):
    import ray.data as rd

    from graphiti_ray import queries as q
    from graphiti_ray.evals import grade_answers

    answers = q.QUERIES["eval_qa"](SF)
    expected = _expected_df()
    graded = grade_answers(
        answers, rd.from_pandas(expected)
    ).to_pandas()
    assert len(graded) == len(expected) > 0
    assert bool(graded["expected"].notna().all())  # every question known
    assert bool(graded["is_correct"].all())


def test_grader_discriminates_planted_wrong_answers(ray_session):
    import pandas as pd
    import ray.data as rd

    from graphiti_ray.evals import grade_answers

    expected = _expected_df()
    wrong = expected.rename(columns={"expected": "answer"}).copy()
    wrong.loc[wrong.index[::2], "answer"] = "Wrongo Industries"
    graded = (
        grade_answers(rd.from_pandas(wrong), rd.from_pandas(expected))
        .to_pandas()
        .sort_values(["group_id", "subj", "question"])
        .reset_index(drop=True)
    )
    n_wrong = len(wrong.index[::2])
    assert (~graded["is_correct"]).sum() == n_wrong
    assert graded["is_correct"].sum() == len(expected) - n_wrong
