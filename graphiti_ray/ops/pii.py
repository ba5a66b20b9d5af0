"""PII scrubbing over the documents table — the redaction pass every
web-scale training-data pipeline runs before packaging (emails, phone
numbers, IP addresses -> typed placeholder tokens).

The synthetic corpus carries no natural PII, so a deterministic
contact block is planted on every third document (arithmetic on
doc_id only — same construction in Python and in the DuckDB oracle
CTE below, following ops/corpus.py's planted-duplicates pattern).

Both engines run the SAME regexes: pyarrow.compute's
count_substring_regex / replace_substring_regex and DuckDB's
regexp_extract_all / regexp_replace are all RE2, so match semantics
are identical by construction.

Shape at 100 TB: stateless per-batch kernel work (two RE2 passes per
pattern), column-pruned read, no shuffle — the embarrassingly
parallel best case.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from .io import read_documents

PII_MOD = 3  # every third doc gets the planted contact block

# RE2 patterns, shared verbatim with the SQL oracle
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-0[0-9]{3}\b"  # NANP fictional exchange
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"



def _contact_block(doc_id: int) -> str:
    return (
        f" Contact user{doc_id}@site{doc_id % 50}.example"
        f" or call 555-0{doc_id % 1000:03d}"
        f" from 10.{doc_id % 256}.0.{doc_id % 100}."
    )


def _scrub_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    planted = [
        t + _contact_block(i) if i % PII_MOD == 0 else t
        for i, t in zip(ids, texts)
    ]
    text = pa.array(planted, pa.string())
    n_emails = pc.count_substring_regex(text, EMAIL_RE)
    n_phones = pc.count_substring_regex(text, PHONE_RE)
    n_ips = pc.count_substring_regex(text, IP_RE)
    # counts on the ORIGINAL text; replacements cascade (placeholder
    # tokens cannot re-match any pattern)
    scrubbed = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    scrubbed = pc.replace_substring_regex(scrubbed, PHONE_RE, "<PHONE>")
    scrubbed = pc.replace_substring_regex(scrubbed, IP_RE, "<IP>")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_phones": pc.cast(n_phones, pa.int64()),
            "n_ips": pc.cast(n_ips, pa.int64()),
            "scrubbed": scrubbed,
        }
    )


def pii_scrub(sf_dir: str):
    """(doc_id, n_emails, n_phones, n_ips, scrubbed) per document."""
    import ray.data as rd

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(_scrub_batch, batch_format="pyarrow")


PII_SCRUB_SQL = f"""WITH pii AS (
  SELECT doc_id,
    CASE WHEN doc_id % {PII_MOD} = 0 THEN text
      || ' Contact user' || CAST(doc_id AS VARCHAR)
      || '@site' || CAST(doc_id % 50 AS VARCHAR) || '.example'
      || ' or call 555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
      || '.0.' || CAST(doc_id % 100 AS VARCHAR) || '.'
    ELSE text END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{IP_RE}')) AS BIGINT) AS n_ips,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
      '{PHONE_RE}', '<PHONE>', 'g'),
    '{IP_RE}', '<IP>', 'g') AS scrubbed
FROM pii
"""
