"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909) — learn the first BPE_ITERS merge rules from the
corpus, then report the learned merge table and the resulting symbol
vocabulary.

A tokenizer-training pass is a standard component of a training-data
pipeline (the reference has no analog; this is part of the
LLM-data-pipeline operator family alongside ops/lmscore.py and
ops/dsir.py).

Exactness contract (so the DuckDB oracle hash-matches):

- Pair counts are exact integers; the best pair per iteration is
  argmax by (count DESC, pair-string ASC) — a total order, so the
  winner is unique and the distributed per-block argmax is safe
  (the global max of a total order is its block's max too).
- A word's symbol sequence is encoded as its tokens joined by TWO
  spaces ("h  e  l  l  o").  Merge application is then a plain
  literal replace on the single-space-padded string:

      trim(replace(' '+seq+' ', ' a  b ', ' ab '))

  With single-space joins, consecutive matches share a separator and
  left-to-right replace misses every second occurrence ("a a a a" ->
  "aa a a"); with double-space joins each match's boundary spaces are
  disjoint, so plain replace() implements exact greedy left-to-right
  BPE ("a  a  a  a" -> "aa  aa") and pandas ``str.replace``, Python
  ``str.replace`` and SQL ``replace`` all agree by construction.

Scale shape:
- ONE streaming pass computes corpus word counts (map-side partial
  combine -> vocab-sized groupby).  Everything after runs over the
  DISTINCT-WORD table, which is Heaps'-law bounded (≪ corpus) — the
  same broadcast-tier argument as ops/lmscore.py.
- Each of the BPE_ITERS iterations is: one vocab-bounded pair-count
  exchange (partial combine per block first), a per-block top-1 +
  driver pick of ONE row, and one streaming vectorized replace over
  the word table.  No stage ever touches the full corpus again.
- The word table is materialized once per iteration; at 100 TB it is
  the tokenizer working set (10^7-10^8 distinct words), far under
  object-store capacity, and the iteration count is a small constant.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .io import read_documents

BPE_ITERS = 8


def _partial_word_counts(batch: pa.Table) -> pa.Table:
    words = pc.list_flatten(
        pc.split_pattern(batch.column("text"), " ")
    ).to_pandas()
    g = words[words != ""].value_counts(sort=False)
    return pa.table(
        {
            "word": pa.array(g.index.to_numpy(), pa.string()),
            "n": pa.array(g.to_numpy(), pa.int64()),
        }
    )


def _init_seq(batch: pa.Table) -> pa.Table:
    # "hello" -> "h  e  l  l  o" (double-space joined chars)
    seq = pc.utf8_rtrim_whitespace(
        pc.replace_substring_regex(batch.column("word"), "(.)", r"\1  ")
    )
    return pa.table(
        {
            "word": batch.column("word"),
            "n": batch.column("n"),
            "seq": pc.cast(seq, pa.string()),
        }
    )


def _partial_pair_counts(batch: pa.Table) -> pa.Table:
    df = batch.select(["n", "seq"]).to_pandas()
    toks = df["seq"].str.split("  ")
    e = toks.explode()
    nxt = e.groupby(level=0).shift(-1)
    mask = nxt.notna()
    if not mask.any():
        return pa.table(
            {"pair": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
    pairs = e[mask] + " " + nxt[mask]
    w = df["n"].loc[pairs.index]
    g = (
        pd.DataFrame({"pair": pairs.to_numpy(), "cnt": w.to_numpy()})
        .groupby("pair", sort=False)["cnt"]
        .sum()
        .reset_index()
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def _block_top1(t: pa.Table) -> pa.Table:
    df = t.to_pandas()
    if not len(df):
        return t
    return pa.Table.from_pandas(
        df.sort_values(["sum(cnt)", "pair"], ascending=[False, True]).head(1),
        preserve_index=False,
    )


def _apply_merge(lhs: str, rhs: str):
    pat = f" {lhs}  {rhs} "
    rep = f" {lhs}{rhs} "

    def f(t: pa.Table) -> pa.Table:
        s = t.column("seq").to_pandas()
        s = (" " + s + " ").str.replace(pat, rep, regex=False).str.strip()
        return t.set_column(
            t.schema.get_field_index("seq"), "seq", pa.array(s, pa.string())
        )

    return f


def _partial_token_counts(t: pa.Table) -> pa.Table:
    df = t.select(["n", "seq"]).to_pandas()
    toks = df["seq"].str.split("  ").explode()
    w = df["n"].loc[toks.index]
    g = (
        pd.DataFrame({"token": toks.to_numpy(), "freq": w.to_numpy()})
        .groupby("token", sort=False)["freq"]
        .sum()
        .reset_index()
    )
    return pa.Table.from_pandas(g, preserve_index=False)


@lru_cache(maxsize=2)
def _train(sf_dir: str):
    """Returns (merges: pandas.DataFrame, words: materialized Dataset)."""
    words = (
        read_documents(sf_dir, ["text"])
        .map_batches(_partial_word_counts, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
        .map_batches(
            lambda t: t.rename_columns(["word", "n"]), batch_format="pyarrow"
        )
        .map_batches(_init_seq, batch_format="pyarrow")
        .materialize()
    )
    merges = []
    for it in range(1, BPE_ITERS + 1):
        top = (
            words.map_batches(_partial_pair_counts, batch_format="pyarrow")
            .groupby("pair")
            .sum("cnt")
            .map_batches(_block_top1, batch_format="pyarrow")
            .to_pandas()  # <= num_blocks single rows
        )
        top = top.sort_values(
            ["sum(cnt)", "pair"], ascending=[False, True]
        ).head(1)
        if not len(top):
            break
        pair, cnt = top["pair"].iloc[0], int(top["sum(cnt)"].iloc[0])
        lhs, rhs = pair.split(" ")
        merges.append(
            {
                "it": it,
                "lhs": lhs,
                "rhs": rhs,
                "merged": lhs + rhs,
                "pair_count": cnt,
            }
        )
        words = words.map_batches(
            _apply_merge(lhs, rhs), batch_format="pyarrow"
        ).materialize()
    mdf = pd.DataFrame(merges).astype(
        {"it": np.int64, "pair_count": np.int64}
    )
    return mdf, words


def bpe_merges(sf_dir: str) -> pd.DataFrame:
    """(it, lhs, rhs, merged, pair_count) — the learned merge rules in
    training order."""
    return _train(sf_dir)[0]


def bpe_vocab(sf_dir: str):
    """(token, freq) — corpus frequency of every symbol after applying
    all BPE_ITERS merges (single chars + surviving merged symbols)."""
    _, words = _train(sf_dir)
    return (
        words.map_batches(_partial_token_counts, batch_format="pyarrow")
        .groupby("token")
        .sum("freq")
        .map_batches(
            lambda t: t.rename_columns(["token", "freq"]),
            batch_format="pyarrow",
        )
    )


# per-worker cache of the deserialized (word -> token count) map
_TOKMAP_CACHE: dict[str, dict] = {}


def bpe_tokenize(sf_dir: str):
    """(doc_id, n_words, n_bpe_tokens): apply the trained merges to the
    whole corpus. The word -> token-count map is the trained tokenizer
    itself (Heaps'-law bounded); it rides the object store via ray.put
    with a per-worker deserialized cache — the same broadcast-tier
    argument as ops/lmscore.py, whose explode->join distributed tier is
    the escape hatch for junk-token vocabularies. Scoring is one
    streaming vectorized pass."""
    import ray

    _, words = _train(sf_dir)
    wdf = words.map_batches(
        lambda t: pa.table(
            {
                "word": t.column("word"),
                "ntok": pc.cast(
                    pc.list_value_length(
                        pc.split_pattern(t.column("seq"), "  ")
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()  # tokenizer-sized (broadcast tier)
    ref = ray.put(dict(zip(wdf["word"], wdf["ntok"].astype(np.int64))))

    def score(batch: pa.Table) -> pa.Table:
        key = ref.hex()
        if key not in _TOKMAP_CACHE:
            _TOKMAP_CACHE.clear()
            _TOKMAP_CACHE[key] = ray.get(ref)
        model = _TOKMAP_CACHE[key]
        toks = pc.split_pattern(batch.column("text"), " ")
        lens = np.asarray(pc.list_value_length(toks), np.int64)
        flat = pc.list_flatten(toks).to_pandas()
        doc_of = np.repeat(np.arange(len(batch)), lens)
        mask = (flat != "").to_numpy()
        nt = np.zeros(len(batch), np.int64)
        nw = np.zeros(len(batch), np.int64)
        np.add.at(
            nt, doc_of[mask], flat[mask].map(model).to_numpy(np.int64)
        )
        np.add.at(nw, doc_of[mask], 1)
        # drop empty/whitespace-only docs: the SQL mirror's inner
        # join + GROUP BY omits them, so a (doc_id, 0, 0) row here
        # would be a row-set mismatch
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(nw, pa.int64()),
                "n_bpe_tokens": pa.array(nt, pa.int64()),
            }
        ).filter(pa.array(nw > 0))

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def _sql_parts(iters: int) -> str:
    parts = [
        """w0 AS (
  SELECT word, count(*)::BIGINT AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
s0 AS (
  SELECT word, n,
         rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS seq
  FROM w0
)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"""p{k} AS (
  SELECT a[i] || ' ' || a[i+1] AS pair, SUM(n)::BIGINT AS cnt
  FROM (SELECT n, string_split(seq, '  ') AS a FROM s{k - 1}),
       UNNEST(generate_series(1, len(a) - 1)) AS t(i)
  GROUP BY pair
),
b{k} AS (
  SELECT string_split(pair, ' ')[1] AS lhs,
         string_split(pair, ' ')[2] AS rhs, cnt
  FROM p{k} ORDER BY cnt DESC, pair LIMIT 1
),
s{k} AS (
  SELECT word, n,
         trim(replace(' ' || seq || ' ',
                      ' ' || b.lhs || '  ' || b.rhs || ' ',
                      ' ' || b.lhs || b.rhs || ' ')) AS seq
  FROM s{k - 1}, b{k} b
)"""
        )
    return "WITH " + ",\n".join(parts)


def _merges_sql(iters: int) -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT {k}::BIGINT AS it, lhs, rhs, lhs || rhs AS merged,"
        f" cnt AS pair_count FROM b{k}"
        for k in range(1, iters + 1)
    )
    return f"{_sql_parts(iters)}\n{rows}"


def _vocab_sql(iters: int) -> str:
    return f"""{_sql_parts(iters)}
SELECT token, SUM(n)::BIGINT AS freq
FROM (SELECT n, unnest(string_split(seq, '  ')) AS token FROM s{iters})
GROUP BY token"""


def _tokenize_sql(iters: int) -> str:
    return f"""{_sql_parts(iters)},
tokmap AS (
  SELECT word, len(string_split(seq, '  '))::BIGINT AS ntok FROM s{iters}
)
SELECT doc_id, COUNT(*)::BIGINT AS n_words,
       SUM(ntok)::BIGINT AS n_bpe_tokens
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
) d JOIN tokmap USING (word)
WHERE word <> ''
GROUP BY doc_id"""


BPE_MERGES_SQL = _merges_sql(BPE_ITERS)
BPE_VOCAB_SQL = _vocab_sql(BPE_ITERS)
BPE_TOKENIZE_SQL = _tokenize_sql(BPE_ITERS)
