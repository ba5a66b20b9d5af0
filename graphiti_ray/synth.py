"""Deterministic Common-Crawl-style synthetic page corpus (FIXTURES.md F1).

Every value is a pure function of ``(row_index, seed)`` via blake2b
hashing — no RNG state — so the corpus can be generated inside
``map_batches`` on any worker, in any order, and always comes out
byte-identical. The corpus embeds known entities/relations (templates
below) so extraction ground truth is computable, alias surface forms
("Ana Barton" / "Barton" / "A. Barton") to exercise near-dup
canonicalization (mirrors /root/reference/README.md:151-173 worked
example), hot domains for skew, and contradicting employer facts across
``warc_ts`` to exercise the temporal invalidation sweep
(/root/reference/graphiti_core/utils/maintenance/edge_operations.py:234-261).

Schema: (url, warc_ts, html, text, lang) == BASELINE.json input_hint.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from .functions.hashing import stable_int
from .schemas import PAGES, TS

# ----------------------------------------------------------- name pools

_F_SYL = ["An", "Bel", "Cor", "Dar", "El", "Fen", "Gal", "Hed", "Ir", "Jor",
          "Kam", "Lor", "Mir", "Ned", "Ol", "Per", "Quin", "Ros", "Sel", "Tor"]
_F_END = ["a", "en", "io", "us", "ia", "o"]
FIRSTS = [a + b for a in _F_SYL for b in _F_END][:60]

_L_SYL = ["Bar", "Cald", "Dren", "Farn", "Gart", "Hol", "Jens", "Kirk", "Lund",
          "Mort", "Nors", "Ostr", "Pell", "Rand", "Sten", "Thorn", "Ulr", "Vance",
          "Walt", "Yor"]
_L_END = ["ton", "son", "well", "by", "field", "wick", "ham", "gate", "more", "land"]
LASTS = [a + b for a in _L_SYL for b in _L_END]  # 200 surnames

_O_SYL = ["Zor", "Apex", "Nov", "Quant", "Veld", "Hex", "Lum", "Cryo", "Syn", "Orb"]
_O_END = ["ex", "ia", "on", "ix", "ara"]
_O_SUF = ["Corp", "Labs", "Systems", "Group", "Industries"]
ORGS = [f"{a}{b} {c}" for a in _O_SYL for b in _O_END for c in _O_SUF][:120]

_C_SYL = ["Dor", "Elm", "Fair", "Gran", "Hart", "Iron", "Jade", "Kings", "Lake", "Mill"]
_C_SUF = ["ville", "burg", "ton", "haven", "port"]
CITIES = [a + b for a in _C_SYL for b in _C_SUF]  # 50 cities

ROLES = ["president", "director", "chief executive", "manager", "treasurer"]

FILLER_EN = [
    "The weather was mild throughout the week.",
    "Local traffic increased slightly this quarter.",
    "Several community events are planned for the season.",
    "Markets remained quiet over the period.",
]
FILLER_DE = ["Das Wetter war diese Woche mild.", "Der Verkehr nahm leicht zu."]
FILLER_FR = ["Le temps était doux cette semaine.", "La circulation a légèrement augmenté."]

BASE_TS = datetime(2023, 1, 1)
SPAN_S = 2 * 365 * 24 * 3600  # two-year window
BUCKET_S = SPAN_S // 4  # employer rotates per ~6-month bucket -> contradictions

PERSONS_PER_DOMAIN = 8
HOT_DOMAIN_PCT = 20  # first two domains hold ~20% of rows (skew fixture)


def _h(seed: int, *parts) -> int:
    return stable_int("|".join(str(p) for p in parts), salt=f"synth{seed}")


def n_domains_for(n_pages: int) -> int:
    return max(4, n_pages // 100)


def domain_of(i: int, n_pages: int, seed: int) -> int:
    nd = n_domains_for(n_pages)
    r = _h(seed, "dom", i) % 100
    if r < HOT_DOMAIN_PCT // 2:
        return 0
    if r < HOT_DOMAIN_PCT:
        return 1
    return 2 + _h(seed, "dom2", i) % (nd - 2)


def person_name(d: int, j: int, seed: int) -> tuple[str, str]:
    """(first, last) of person j in domain d; surnames unique per domain."""
    first = FIRSTS[_h(seed, "pf", d, j) % len(FIRSTS)]
    last = LASTS[(_h(seed, "pl", d) + 7 * j) % len(LASTS)]  # gcd(7,200)=1 -> distinct per j
    return first, last


def person_form(first: str, last: str, which: int) -> str:
    """Alias surface form: 60% full, 20% surname, 20% initial+surname."""
    if which < 6:
        return f"{first} {last}"
    if which < 8:
        return last
    return f"{first[0]}. {last}"


def employer_of(d: int, j: int, bucket: int, seed: int) -> str:
    return ORGS[_h(seed, "emp", d, j, bucket) % len(ORGS)]


def page_row(i: int, n_pages: int, seed: int) -> dict:
    d = domain_of(i, n_pages, seed)
    domain = f"site{d}.example"
    url = f"https://{domain}/p{i}"
    off = _h(seed, "ts", i) % SPAN_S
    ts = BASE_TS + timedelta(seconds=int(off))
    bucket = off // BUCKET_S

    lr = _h(seed, "lang", i) % 100
    lang = "en" if lr < 90 else ("de" if lr < 95 else "fr")

    sents: list[str] = []
    if lang == "en":
        j = _h(seed, "pj", i) % PERSONS_PER_DOMAIN
        first, last = person_name(d, j, seed)
        pform = person_form(first, last, _h(seed, "form", i) % 10)
        org = employer_of(d, j, bucket, seed)
        sents.append(f"{pform} works for {org}.")

        r2 = _h(seed, "s2", i) % 10
        if r2 < 5:
            city = CITIES[_h(seed, "city", d, j) % len(CITIES)]
            sents.append(f"{pform} lives in {city}.")
        if r2 in (2, 3, 7):
            bcity = CITIES[_h(seed, "bcity", d, j) % len(CITIES)]
            sents.append(f"{pform} was born in {bcity}.")
        r3 = _h(seed, "s3", i) % 10
        if r3 < 3:
            role = ROLES[_h(seed, "role", d, j, bucket) % len(ROLES)]
            sents.append(f"As of {ts.date().isoformat()}, {pform} is the {role} of {org}.")
        if r3 == 4:
            k = (j + 1) % PERSONS_PER_DOMAIN
            f2, l2 = person_name(d, k, seed)
            p2 = person_form(f2, l2, _h(seed, "form2", i) % 10)
            sents.append(f"{p2} is married to {pform}.")
        if r3 == 5 and bucket > 0:
            prev_org = employer_of(d, j, bucket - 1, seed)
            if prev_org != org:
                sents.append(f"{pform} no longer works for {prev_org}.")
        if r3 == 6:
            mcity = CITIES[_h(seed, "mcity", d, j, bucket) % len(CITIES)]
            year = 2015 + _h(seed, "my", i) % 9
            sents.append(f"{pform} moved to {mcity} in {year}.")
        sents.append(FILLER_EN[_h(seed, "fill", i) % len(FILLER_EN)])
    elif lang == "de":
        sents.append(FILLER_DE[_h(seed, "fill", i) % len(FILLER_DE)])
    else:
        sents.append(FILLER_FR[_h(seed, "fill", i) % len(FILLER_FR)])

    text = "\n".join(sents)
    if _h(seed, "nullhtml", i) % 10 == 0:
        html = None  # ~10% text-only pages
    else:
        body = "".join(f"<p>{s}</p>" for s in sents)
        html = (
            f"<html><head><title>{domain} page {i}</title></head>"
            f"<body>{body}</body></html>"
        ).encode("utf-8")
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def gen_pages_batch(indices: np.ndarray, n_pages: int, seed: int) -> pa.Table:
    rows = [page_row(int(i), n_pages, seed) for i in indices]
    return pa.Table.from_pylist(rows, schema=PAGES)


def gen_pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    """Driver-side corpus for tests (small n only)."""
    return gen_pages_batch(np.arange(n_pages), n_pages, seed)


def pages_dataset(n_pages: int, seed: int = 42, override_num_blocks: int | None = None):
    """Distributed corpus generation: ray.data.range -> map_batches.

    Each task derives its rows purely from indices — the 100 TB analog is
    ``read_parquet`` over WARC-derived Parquet; this stands in with
    identical downstream schema.
    """
    import ray.data as rd

    ds = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: gen_pages_batch(b["id"], n_pages, seed),
        batch_format="numpy",
        batch_size=4096,
    )
