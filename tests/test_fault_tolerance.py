"""Fault-injection evidence: a transform stage that fails transiently
(first invocation raises after creating an on-disk flag; the retry
succeeds) still yields the exact clean-run output when the stage opts
into Ray task retries — the recovery story a 100-TB run relies on
between checkpoint boundaries (state/checkpoint.py covers the
coarse-grained partition-resume half)."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SF_DIR = "/root/testdata/sf0.001"


def _run(flag_path: str | None):
    import ray.data as rd

    def transform(batch: pa.Table) -> pa.Table:
        if flag_path is not None:
            # fail exactly once cluster-wide: O_EXCL file creation is
            # the atomic "was the failure already injected?" check
            try:
                fd = os.open(flag_path, os.O_CREAT | os.O_EXCL)
                os.close(fd)
                raise RuntimeError("injected transient failure")
            except FileExistsError:
                pass
        n = pc.list_value_length(
            pc.split_pattern(batch.column("text"), " ")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pc.cast(n, pa.int64()),
            }
        )

    ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ds.map_batches(
        transform,
        batch_format="pyarrow",
        retry_exceptions=True,
        max_retries=3,
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_transient_task_failure_recovers_exactly(ray_session):
    with tempfile.TemporaryDirectory() as tmp:
        flag = os.path.join(tmp, "injected_failure.flag")
        flaky = _run(flag)
        assert os.path.exists(flag), "failure was never injected"
        clean = _run(None)
        assert len(flaky) == len(clean) > 0
        assert np.array_equal(
            flaky["doc_id"].to_numpy(), clean["doc_id"].to_numpy()
        )
        assert np.array_equal(
            flaky["n_words"].to_numpy(), clean["n_words"].to_numpy()
        )
