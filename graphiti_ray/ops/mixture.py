"""Mixture balancing — resample the corpus so each language's share
matches a TARGET mixture (uniform here), the data-mixture stage every
multi-source training corpus runs (The Pile's source weights, Gao et
al. 2020; DoReMi's domain reweighting, Xie et al. 2023). Differs from
``ops/sampling`` (fixed per-stratum rates chosen a priori): mixture
rates are SOLVED FROM the observed counts — rate_l = min(1, target_l /
observed_l) — so the kept set approaches the target proportions
whatever the input skew.

Determinism: the keep decision is a pure function of the row —
``md5(salt || doc_id) % 10000 < rate_bp[lang]`` — so reruns, retries
and resumes keep exactly the same documents, and the DuckDB oracle
reproduces the sample bit-for-bit via ``md5_number_lower`` (the
functions/hashing.md5_hash64 pairing). Rates are integer basis points
(exact on both engines).

Scale shape: ONE map-side partial count per language (languages are
bounded — ~hundreds on the real web — so the groupby exchange and the
driver-side rate table are key-sized, never corpus-sized), rates
broadcast via ray.put, then an embarrassingly parallel filter pass.
No corpus-sized exchange, no driver collect of data rows.

Reference analog: none (graphiti has no sampling layer); this extends
the corpus-prep family SURVEY.md §2.10 claims.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .io import read_documents

MIX_SALT = "mix|"
_BP = 10_000  # rate resolution: basis points


def mixture_sample(sf_dir: str):
    """(doc_id, lang, rate_bp, kept): per-language keep rates solved
    for a UNIFORM target mixture, hash-deterministic keep decision."""
    import ray

    docs = read_documents(sf_dir, ["doc_id", "lang"]).materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    counts = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("lang")
        .sum("n")
        .to_pandas()  # language-count-sized: bounded, never corpus-sized
    )
    total = int(counts["sum(n)"].sum())
    k = len(counts)
    rates = {
        str(lang): min(_BP, (_BP * total) // (k * int(n)))
        for lang, n in zip(counts["lang"], counts["sum(n)"])
    }
    rates_ref = ray.put(rates)

    def decide(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        from ..functions.hashing import md5_hash64_vec

        r = ray.get(rates_ref)
        langs = t.column("lang").to_pylist()
        rate = np.array([r[lg] for lg in langs], np.int64)
        # vectorized single-block md5 — same DuckDB md5_number_lower
        # image as the old per-row loop
        h = (
            md5_hash64_vec(
                pc2.cast(t.column("doc_id"), pa.string()), salt=MIX_SALT
            )
            % np.uint64(_BP)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "rate_bp": pa.array(rate, pa.int64()),
                "kept": pa.array(h < rate, pa.bool_()),
            }
        )

    return docs.map_batches(decide, batch_format="pyarrow")


MIXTURE_SAMPLE_SQL = f"""WITH c AS (
  SELECT lang, COUNT(*)::BIGINT AS n FROM documents GROUP BY lang
),
k AS (SELECT COUNT(*)::BIGINT AS k FROM c),
t AS (SELECT COUNT(*)::BIGINT AS total FROM documents),
r AS (
  SELECT c.lang,
         LEAST({_BP}, ({_BP} * t.total) // (k.k * c.n))::BIGINT AS rate_bp
  FROM c, k, t
)
SELECT d.doc_id, d.lang, r.rate_bp,
       (md5_number_lower('{MIX_SALT}' || CAST(d.doc_id AS VARCHAR))
          % {_BP}) < r.rate_bp AS kept
FROM documents d JOIN r USING (lang)"""
