"""SQL-mirrorable KG corpus: pages derived arithmetically from doc_id.

Purpose: give the FULL KG-construction chain (extraction ->
canonicalization with alias merging -> edge dedupe -> temporal sweep ->
triples) a driver-checkable DuckDB oracle. Every value in these pages is
a pure integer-arithmetic function of ``documents.doc_id``, and every
name comes from a fixed pool interpolated into both the Python generator
and the SQL mirror (queries.KG_DOCS_* in queries.py) — so DuckDB can
reproduce the exact canonical node/edge/mention/alias tables the
distributed pipeline emits.

Corpus semantics (chosen so each KG stage does non-trivial work AND
stays exactly SQL-expressible):
- person (g, j) per doc: g = doc_id % 10 (the group/domain),
  j = (doc_id // 10) % 4; the person space is deliberately SMALL
  (period 40) so at the driver's 500-doc scale every person recurs
  across time buckets and the sweep finds real contradictions; full
  name from KG_FIRSTS/KG_LASTS with surnames UNIQUE within a group
  (7*j mod 40 is injective for j < 4).
- alias surface forms: 70% full name, 20% bare surname, 10%
  initial+surname ("A. Barwick"), selected by (doc_id // 9) % 10 —
  9 does not divide the person period 40, so the SAME person surfaces
  under multiple forms across docs (a selector aligned to a divisor of
  400 would freeze each person into one form and no alias merge would
  ever trigger) — exercises the blocking + alias_match (including the
  single-letter-initial rule) + connected-components merge; the
  component is exactly (group, surname) and the canonical name is the
  length-then-lexicographic max over observed forms (the same
  name_sort_key rule canonicalize.py applies).
- employer rotates with a ~6-month time bucket -> WORKS_FOR
  contradictions across warc_ts -> the T2/T3 temporal sweep closes
  older facts at the next contradicting valid_at; round 4 added
  "no longer works for" marker sentences (extraction-time invalid_at),
  so the SQL mirror now reproduces the FULL fold + sweep semantics —
  the marker merge_asof of _merge_pair_group and the disjointness
  skips of _sweep_frame are live, not vacuous.
- LIVES_IN (constant city per person: dedupe only), BORN_IN
  (dateless), HOLDS_ROLE (As-of date parsing + sweep), MOVED_TO
  (year-date parsing), SPOUSE_OF (person-valued OBJECT -> target
  canonicalization through uuid_map).

Name pools are mutually DISJOINT across kinds (a city equal to a
surname would alias-merge a city node into a person component).

Reference anchors: extraction patterns functions/extraction.py:36-45
(= graphiti_core prompt semantics), canonical merge
canonicalize.py:282-302 (node_operations.py:298-412), sweep
edges.py:263-307 (edge_operations.py:234-305).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import PAGES

EPOCH_2023 = 1672531200  # 2023-01-01 UTC, seconds
SPAN_S = 63072000  # two years
BUCKET_S = SPAN_S // 4  # employer rotates per bucket -> contradictions
# ts offset multiplier: large and coprime to SPAN_S so even a 500-doc
# corpus wraps the full two-year span many times (with a small
# multiplier every doc lands in bucket 0 and no contradiction exists)
OFF_MULT = 6291469

KG_FIRSTS = [
    "Anera", "Belor", "Coril", "Darven", "Elsin", "Farow", "Gelith",
    "Harnen", "Ilora", "Jasper", "Kelvin", "Lorets", "Mavin", "Norel",
    "Odana", "Peralt", "Quimby", "Rosalind", "Selwin", "Tovira",
    "Ulmer", "Vestra", "Welden", "Xanthe",
]  # 24
KG_LASTS = [
    "Barwick", "Caldon", "Drenmore", "Farnley", "Gartham", "Holvert",
    "Jensley", "Kirbell", "Lundell", "Mortvale", "Norsten", "Ostrem",
    "Pellham", "Randor", "Stenwick", "Thornby", "Ulrich", "Vancett",
    "Waltham", "Yorvin", "Ashford", "Bexley", "Cranmore", "Dunwell",
    "Eastley", "Fenwick", "Grandon", "Hartwell", "Ironsley", "Jadewick",
    "Kingsley", "Lakemore", "Millbrook", "Norwood", "Oakhurst",
    "Pinewell", "Quarles", "Redfern", "Sablewood", "Tarnell",
]  # 40
KG_ORGS = [
    "Zorvex Corp", "Apexon Labs", "Novexa Systems", "Quantis Group",
    "Veldora Industries", "Hexlin Corp", "Lumara Labs",
    "Cryonis Systems", "Synthera Group", "Orbitex Industries",
    "Maxtral Corp", "Tessark Labs",
]  # 12
KG_CITIES = [
    "Dorvale", "Elmsworth", "Fairhaven", "Granport", "Hartsburg",
    "Ironvale", "Jadeport", "Kingsmere", "Lakewynd", "Millhaven",
]  # 10
KG_ROLES = ["president", "director", "chief executive", "manager", "treasurer"]


def kg_doc_fields(doc_id: int) -> dict:
    """All derived fields for one doc — the Python half of the mirror."""
    g = doc_id % 10
    j = (doc_id // 10) % 4
    off = (doc_id * OFF_MULT) % SPAN_S
    ts = datetime(2023, 1, 1) + timedelta(seconds=off)
    bucket = off // BUCKET_S
    first = KG_FIRSTS[(g * 7 + j) % len(KG_FIRSTS)]
    last = KG_LASTS[(g * 3 + 7 * j) % len(KG_LASTS)]
    org = KG_ORGS[(g + j + bucket) % len(KG_ORGS)]
    city = KG_CITIES[(g * 5 + j) % len(KG_CITIES)]
    bcity = KG_CITIES[(g * 2 + j) % len(KG_CITIES)]
    role = KG_ROLES[(g + j + bucket) % len(KG_ROLES)]
    # three alias surface forms (round 4, matching the episodic corpus's
    # synth.person_form split): 70% full, 20% bare surname, 10%
    # initial+surname ("A. Barwick" — normalize_name drops the dot, so
    # alias_match's single-letter-initial rule merges it)
    sel = (doc_id // 9) % 10
    if sel < 7:
        form = f"{first} {last}"
    elif sel < 9:
        form = last
    else:
        form = f"{first[0]}. {last}"
    # person2: spouse sentences exercise TARGET canonicalization
    j2 = (j + 1) % 4
    first2 = KG_FIRSTS[(g * 7 + j2) % len(KG_FIRSTS)]
    last2 = KG_LASTS[(g * 3 + 7 * j2) % len(KG_LASTS)]
    return {
        "g": g, "j": j, "ts": ts, "bucket": bucket, "first": first,
        "last": last, "org": org, "city": city, "bcity": bcity,
        "role": role, "form": form,
        "first2": first2, "last2": last2,
        "mcity": KG_CITIES[(g * 4 + j + bucket) % len(KG_CITIES)],
        "myear": 2015 + doc_id % 9,
        "prev_org": KG_ORGS[(g + j + bucket - 1) % len(KG_ORGS)],
        "grp": f"site{g}.example",
        "url": f"https://site{g}.example/doc{doc_id}",
    }


def kg_doc_sentences(doc_id: int, f: dict) -> list[str]:
    sents = [f"{f['form']} works for {f['org']}."]
    if doc_id % 3 == 0:
        sents.append(f"{f['form']} lives in {f['city']}.")
    if doc_id % 4 == 1:
        sents.append(f"{f['form']} was born in {f['bcity']}.")
    if doc_id % 5 == 2:
        sents.append(
            f"As of {f['ts'].date().isoformat()}, {f['form']} is the "
            f"{f['role']} of {f['org']}."
        )
    # round-4 extension: the remaining extraction patterns + the T1
    # ended-marker fold, so EVERY rule the episodic corpus exercises is
    # hash-checked here too (VERDICT r3 item 7)
    if doc_id % 7 == 3:
        sents.append(f"{f['first2']} {f['last2']} is married to {f['form']}.")
    if doc_id % 6 == 4:
        sents.append(f"{f['form']} moved to {f['mcity']} in {f['myear']}.")
    if doc_id % 8 == 6 and f["bucket"] > 0:
        sents.append(f"{f['form']} no longer works for {f['prev_org']}.")
    return sents


def _kg_batch_to_pages(batch: pa.Table) -> pa.Table:
    urls, ts_us, htmls, texts = [], [], [], []
    for d in batch.column("doc_id").to_pylist():
        f = kg_doc_fields(d)
        sents = kg_doc_sentences(d, f)
        text = "\n".join(sents)
        urls.append(f["url"])
        ts_us.append((EPOCH_2023 + (d * OFF_MULT) % SPAN_S) * 1_000_000)
        texts.append(text)
        if d % 10 == 0:
            htmls.append(None)  # text-only page
        else:
            body = "".join(f"<p>{s}</p>" for s in sents)
            htmls.append(
                (
                    f"<html><head><title>doc {d}</title></head>"
                    f"<body>{body}</body></html>"
                ).encode("utf-8")
            )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pc.cast(pa.array(ts_us, pa.int64()), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    ).cast(PAGES)


def kg_pages_from_documents(
    sf_dir: str, mod_rem: tuple[int, int] | None = None
):
    """documents.doc_id -> SQL-mirrorable KG pages (1:1 per document).

    mod_rem=(m, r) keeps only doc_id % m == r — deterministic corpus
    halves for the incremental-build query (queries.kg_docs_incremental)."""
    import numpy as np
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    if mod_rem is not None:
        m, r = mod_rem

        def keep(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % m == r, pa.bool_()))

        docs = docs.map_batches(keep, batch_format="pyarrow")
    return docs.map_batches(_kg_batch_to_pages, batch_format="pyarrow")


# ------------------------------------------------------------- SQL mirror

def _sql_list(pool: list[str]) -> str:
    inner = ",".join("'" + p + "'" for p in pool)
    return f"[{inner}]"


# Shared CTE prefix: per-doc derived fields + the raw extraction rows,
# token-for-token the SQL image of kg_doc_fields/kg_doc_sentences and
# functions/extraction.py's patterns on this corpus.
KG_DOCS_CTE = f"""
d AS (
  SELECT doc_id,
    doc_id % 10 AS g,
    (doc_id // 10) % 4 AS j,
    'site' || CAST(doc_id % 10 AS VARCHAR) || '.example' AS grp,
    'https://site' || CAST(doc_id % 10 AS VARCHAR) || '.example/doc'
      || CAST(doc_id AS VARCHAR) AS url,
    make_timestamp(CAST((1672531200 + (doc_id*6291469) % 63072000) AS BIGINT)
                   * 1000000) AS ts,
    ((doc_id*6291469) % 63072000) // 15768000 AS bucket
  FROM documents
), p AS (
  SELECT *,
    {_sql_list(KG_FIRSTS)}[CAST((g*7+j) % 24 AS INT) + 1] AS first,
    {_sql_list(KG_LASTS)}[CAST((g*3+7*j) % 40 AS INT) + 1] AS last,
    {_sql_list(KG_ORGS)}[CAST((g+j+bucket) % 12 AS INT) + 1] AS org,
    {_sql_list(KG_CITIES)}[CAST((g*5+j) % 10 AS INT) + 1] AS city,
    {_sql_list(KG_CITIES)}[CAST((g*2+j) % 10 AS INT) + 1] AS bcity,
    {_sql_list(KG_ROLES)}[CAST((g+j+bucket) % 5 AS INT) + 1] AS role
  FROM d
), pf AS (
  SELECT *,
    CASE WHEN (doc_id // 9) % 10 < 7 THEN first || ' ' || last
         WHEN (doc_id // 9) % 10 < 9 THEN last
         ELSE substr(first, 1, 1) || '. ' || last END AS form,
    {_sql_list(KG_FIRSTS)}[CAST((g*7 + (j+1)%4) % 24 AS INT) + 1] AS first2,
    {_sql_list(KG_LASTS)}[CAST((g*3 + 7*((j+1)%4)) % 40 AS INT) + 1] AS last2,
    {_sql_list(KG_CITIES)}[CAST((g*4+j+bucket) % 10 AS INT) + 1] AS mcity,
    2015 + doc_id % 9 AS myear,
    {_sql_list(KG_ORGS)}[CAST((g+j+bucket-1) % 12 AS INT) + 1] AS prev_org
  FROM p
),
-- one row per (doc, entity surface, merge-component key)
ent AS (
  SELECT doc_id, grp, url, form AS name, 'p|' || last AS comp FROM pf
  UNION ALL SELECT doc_id, grp, url, org, 'o|' || org FROM pf
  UNION ALL SELECT doc_id, grp, url, city, 'c|' || city FROM pf WHERE doc_id % 3 = 0
  UNION ALL SELECT doc_id, grp, url, bcity, 'c|' || bcity FROM pf WHERE doc_id % 4 = 1
  UNION ALL SELECT doc_id, grp, url, org, 'o|' || org FROM pf WHERE doc_id % 5 = 2
  UNION ALL SELECT doc_id, grp, url, first2 || ' ' || last2, 'p|' || last2
    FROM pf WHERE doc_id % 7 = 3
  UNION ALL SELECT doc_id, grp, url, mcity, 'c|' || mcity
    FROM pf WHERE doc_id % 6 = 4
  UNION ALL SELECT doc_id, grp, url, prev_org, 'o|' || prev_org
    FROM pf WHERE doc_id % 8 = 6 AND bucket > 0
), ent_d AS MATERIALIZED (SELECT DISTINCT doc_id, grp, url, name, comp FROM ent),
-- canonical name per component: length-then-lexicographic max
-- (name_sort_key of functions/extraction.py, string-encoded)
canon AS MATERIALIZED (
  SELECT grp, comp,
    substr(max(lpad(CAST(length(name) AS VARCHAR),4,'0') || '|' || name), 6)
      AS cname
  FROM ent_d GROUP BY grp, comp
),
-- raw extracted edges (subject surname keys the subject's component;
-- obj_comp, when set, canonicalizes a PERSON object the same way)
edges0 AS MATERIALIZED (
  SELECT grp, last, 'WORKS_FOR' AS pred, org AS obj,
    CAST(NULL AS VARCHAR) AS obj_comp,
    form || ' works for ' || org || '.' AS fact,
    ts AS valid_at, CAST(NULL AS TIMESTAMP) AS invalid_at,
    ts AS created_at, doc_id
  FROM pf
  UNION ALL
  SELECT grp, last, 'LIVES_IN', city, NULL,
    form || ' lives in ' || city || '.', ts, NULL, ts, doc_id
  FROM pf WHERE doc_id % 3 = 0
  UNION ALL
  SELECT grp, last, 'BORN_IN', bcity, NULL,
    form || ' was born in ' || bcity || '.', NULL, NULL, ts, doc_id
  FROM pf WHERE doc_id % 4 = 1
  UNION ALL
  SELECT grp, last, 'HOLDS_ROLE', org, NULL,
    'As of ' || strftime(ts, '%Y-%m-%d') || ', ' || form || ' is the '
      || role || ' of ' || org || '.',
    date_trunc('day', ts), NULL, ts, doc_id
  FROM pf WHERE doc_id % 5 = 2
  UNION ALL
  SELECT grp, last2, 'SPOUSE_OF', form, 'p|' || last,
    first2 || ' ' || last2 || ' is married to ' || form || '.',
    ts, NULL, ts, doc_id
  FROM pf WHERE doc_id % 7 = 3
  UNION ALL
  SELECT grp, last, 'MOVED_TO', mcity, NULL,
    form || ' moved to ' || mcity || ' in ' || CAST(myear AS VARCHAR) || '.',
    make_timestamp(myear, 1, 1, 0, 0, 0), NULL, ts, doc_id
  FROM pf WHERE doc_id % 6 = 4
  UNION ALL
  -- 'ended' marker: valid_at NULL, extraction-time invalid_at = warc_ts
  SELECT grp, last, 'WORKS_FOR', prev_org, NULL,
    form || ' no longer works for ' || prev_org || '.',
    NULL, ts, ts, doc_id
  FROM pf WHERE doc_id % 8 = 6 AND bucket > 0
),
-- D5/D6 pair-group merge: same (group, canonical subject, pred,
-- canonical obj, fact) rows collapse; min non-null timestamps
merged AS (
  SELECT e0.grp, c.cname AS subj, e0.pred,
    COALESCE(c2.cname, e0.obj) AS obj, e0.fact,
    min(e0.valid_at) AS valid_at, min(e0.invalid_at) AS invalid_at,
    min(e0.created_at) AS created_at
  FROM edges0 e0
  JOIN canon c ON c.grp = e0.grp AND c.comp = 'p|' || e0.last
  LEFT JOIN canon c2 ON c2.grp = e0.grp AND c2.comp = e0.obj_comp
  GROUP BY 1, 2, 3, 4, 5
), mfn AS MATERIALIZED (
  SELECT *, trim(regexp_replace(regexp_replace(lower(fact),
    '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS fnorm
  FROM merged
),
-- T1 marker fold (edges._merge_pair_group:236-276): each 'ended'
-- marker (valid NULL, invalid set) attaches to the LATEST open fact of
-- its (grp, subj, pred, obj) pair with valid_at strictly before the
-- marker time — last in (valid_at, fact_norm) order, the merge_asof
-- backward-strict tie-break — setting that fact's invalid_at to the
-- min marker time; matched markers drop, unmatched ones stay as rows
mk AS MATERIALIZED (SELECT * FROM mfn WHERE valid_at IS NULL AND invalid_at IS NOT NULL),
fx AS MATERIALIZED (SELECT * FROM mfn WHERE valid_at IS NOT NULL),
oth AS MATERIALIZED (SELECT * FROM mfn WHERE valid_at IS NULL AND invalid_at IS NULL),
asg AS (
  SELECT mk.grp, mk.subj, mk.pred, mk.obj, mk.fact AS mfact,
    mk.invalid_at AS m_inv, fx.fact AS tfact,
    row_number() OVER (
      PARTITION BY mk.grp, mk.subj, mk.pred, mk.obj, mk.fact
      ORDER BY fx.valid_at DESC, fx.fnorm DESC) AS rn
  FROM mk JOIN fx ON fx.grp = mk.grp AND fx.subj = mk.subj
    AND fx.pred = mk.pred AND fx.obj = mk.obj
    AND fx.valid_at < mk.invalid_at
), fold AS MATERIALIZED (SELECT * FROM asg WHERE rn = 1),
fold_agg AS MATERIALIZED (
  SELECT grp, subj, pred, obj, tfact, min(m_inv) AS m_inv
  FROM fold GROUP BY 1, 2, 3, 4, 5
),
pre_sweep AS MATERIALIZED (
  SELECT f.grp, f.subj, f.pred, f.obj, f.fact, f.valid_at, f.created_at,
    CASE WHEN fa.m_inv IS NOT NULL
         THEN least(COALESCE(f.invalid_at, fa.m_inv), fa.m_inv)
         ELSE f.invalid_at END AS invalid_at
  FROM fx f LEFT JOIN fold_agg fa ON fa.grp = f.grp AND fa.subj = f.subj
    AND fa.pred = f.pred AND fa.obj = f.obj AND fa.tfact = f.fact
  UNION ALL
  SELECT mk.grp, mk.subj, mk.pred, mk.obj, mk.fact, mk.valid_at,
    mk.created_at, mk.invalid_at
  FROM mk LEFT JOIN (SELECT DISTINCT grp, subj, pred, obj, mfact FROM fold) fd
    ON fd.grp = mk.grp AND fd.subj = mk.subj AND fd.pred = mk.pred
    AND fd.obj = mk.obj AND fd.mfact = mk.fact
  WHERE fd.mfact IS NULL
  UNION ALL
  SELECT grp, subj, pred, obj, fact, valid_at, created_at, invalid_at
  FROM oth
),
-- provenance after the fold: folded markers' episodes re-point to
-- their target fact (n_episodes of kg_edges counts the union)
edoc AS MATERIALIZED (
  SELECT e0.grp, c.cname AS subj, e0.pred,
    COALESCE(c2.cname, e0.obj) AS obj,
    COALESCE(fold.tfact, e0.fact) AS fact, e0.doc_id
  FROM edges0 e0
  JOIN canon c ON c.grp = e0.grp AND c.comp = 'p|' || e0.last
  LEFT JOIN canon c2 ON c2.grp = e0.grp AND c2.comp = e0.obj_comp
  LEFT JOIN fold ON fold.grp = e0.grp AND fold.subj = c.cname
    AND fold.pred = e0.pred AND fold.obj = COALESCE(c2.cname, e0.obj)
    AND fold.mfact = e0.fact
), eps AS MATERIALIZED (
  SELECT grp, subj, pred, obj, fact, count(DISTINCT doc_id) AS n_episodes
  FROM edoc GROUP BY 1, 2, 3, 4, 5
),
-- T2/T3 sweep (edges._sweep_frame:312-379): close(e) = earliest later
-- contradicting valid_at, bounded by e's own (post-fold) invalid_at,
-- skipping candidates whose interval ended at/before e starts; markers
-- (valid NULL) neither close nor get closed
swept AS MATERIALIZED (
  SELECT p.grp, p.subj, p.pred, p.obj, p.fact, p.valid_at, p.created_at,
    e.n_episodes,
    CASE WHEN p.pred IN ('WORKS_FOR','LIVES_IN','HOLDS_ROLE')
              AND p.valid_at IS NOT NULL THEN
      COALESCE((
        SELECT min(n.valid_at) FROM pre_sweep n
        WHERE n.grp = p.grp AND n.subj = p.subj AND n.pred = p.pred
          AND n.valid_at IS NOT NULL AND n.valid_at > p.valid_at
          AND n.obj <> p.obj
          AND (p.invalid_at IS NULL OR n.valid_at < p.invalid_at)
          AND (n.invalid_at IS NULL OR n.invalid_at > p.valid_at)
      ), p.invalid_at)
    ELSE p.invalid_at END AS invalid_at
  FROM pre_sweep p JOIN eps e ON e.grp = p.grp AND e.subj = p.subj
    AND e.pred = p.pred AND e.obj = p.obj AND e.fact = p.fact
)
"""
