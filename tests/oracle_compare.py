"""Strict engine-vs-oracle compare shared by every oracle-gated test.

This is the same no-coercion ``canon()`` the driver-gate simulator
(tools/driver_sim.py) uses: sort columns, sort rows, stringify, and
compare WITHOUT first casting the oracle frame to the engine's dtypes.
A dtype coercion at this spot masked a real driver red once (DuckDB
windowed SUM returns HUGEINT -> pandas float64 -> '0.0' while the
engine emitted int64 '0'); the driver's hash compare stringifies each
side as-is, so the standing pytest regression gate must too.
"""

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-compare canonical form: sorted columns, rows sorted by
    every column, index dropped, all values stringified (no dtype
    coercion between the two sides)."""
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True).astype(str)


def assert_oracle_match(
    rdf: pd.DataFrame, odf: pd.DataFrame, min_rows: int = 1
) -> None:
    """Assert the engine frame ``rdf`` and the oracle frame ``odf``
    agree under the driver's strict compare (schema, row count, and
    stringified values)."""
    assert sorted(rdf.columns) == sorted(odf.columns), (
        sorted(rdf.columns),
        sorted(odf.columns),
    )
    a, b = canon(rdf), canon(odf)
    assert len(a) == len(b), (len(a), len(b))
    assert len(a) >= min_rows, f"only {len(a)} rows (< {min_rows})"
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        raise AssertionError(
            f"strict value mismatch on {int(neq.sum())}/{len(a)} rows;"
            f" first diffs:\nengine:\n{a[neq].head()}\n"
            f"oracle:\n{b[neq].head()}"
        )
