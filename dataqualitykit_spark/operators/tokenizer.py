"""Corpus-trained BPE tokenizer: learn merges FROM the corpus, encode to
token ids — the tokenize stage of an LLM training-data pipeline (the
embedded-corpus BPE in semantics.py only counts tokens with a fixed
import-time merge table; this one trains on YOUR data and emits ids for
packing.py's sequence assembly).

Scale shape (the SentencePiece/HF-at-scale recipe, not a toy loop):
  1. ONE distributed aggregation counts pretoken frequencies; only the
     top `max_words` (count desc, word asc — deterministic) reach the
     driver. Exchange carries (word, count) pairs, partial-aggregated
     map-side; driver state is bounded at max_words rows (the dsir
     NB-classifier bounded-model precedent).
  2. ONE distributed distinct over single characters fixes the base-unit
     vocabulary from the WHOLE corpus (not just the top words), so
     encoding the training corpus can never hit an unknown unit.
  3. Merge training runs on the driver over the word-frequency table —
     greedy most-frequent-pair, ties broken lexicographically (fully
     deterministic). Cost is O(n_merges * table size), independent of
     corpus size: the corpus is never rescanned.
  4. Encoding is one Arrow-batched pandas UDF with a bounded per-worker
     cache keyed by pretoken (web text repeats words heavily) over a
     BROADCAST model; output is array<int> — downstream counts stay
     JVM-side (F.size).

Determinism: training ties are lexicographic, the top-K cut orders by
(count desc, word asc), and encoding is a pure function of (model, text)
— the same corpus yields the same model and ids at any partitioning.

Reference parity: the reference has no tokenizer (QualityControl.py is
per-column checks only); this is task-brief LLM-pipeline surface
(token counting / budget sampling run on these counts).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-spirit pretokenizer shared with semantics.py: letter runs, digit
# runs, single other non-space chars; whitespace never tokenizes.
from ..semantics import BPE_PRETOKEN_REGEX

_PRETOKEN_RE = re.compile(BPE_PRETOKEN_REGEX)

UNK_TOKEN = "<unk>"
UNK_ID = 0


@dataclass(frozen=True)
class BpeModel:
    """A trained tokenizer: `merges` in rank order, `vocab` mapping token
    string -> id (UNK_TOKEN=0, then base units sorted, then merge
    products in rank order). Plain picklable data — broadcasts cleanly
    into pandas UDFs."""

    merges: tuple[tuple[str, str], ...]
    vocab: dict[str, int]

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}

    def id_to_token(self) -> dict[int, str]:
        return {i: t for t, i in self.vocab.items()}


def train_merges(
    word_counts: dict[str, int], n_merges: int
) -> tuple[tuple[str, str], ...]:
    """Greedy BPE over a word-frequency table: repeatedly merge the most
    frequent adjacent unit pair; ties break to the lexicographically
    smallest pair. Stops early when no pair repeats. Pure driver-side
    python over the BOUNDED table — the corpus itself is never touched."""
    seqs: dict[str, list[str]] = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in word_counts.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:  # nothing repeats — further merges are noise
            break
        a, b = best[0]
        merges.append((a, b))
        ab = a + b
        for w, s in seqs.items():
            if a not in s:
                continue
            i, out = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return tuple(merges)


def _pretoken_col(text_col: str, lowercase: bool) -> F.Column:
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return F.regexp_extract_all(
        F.coalesce(src, F.lit("")), F.lit(BPE_PRETOKEN_REGEX), F.lit(0)
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 256,
    max_words: int = 65536,
    lowercase: bool = True,
) -> BpeModel:
    """Train a BPE model on a corpus (two bounded Spark jobs + driver
    merge loop; see module docstring for the scale analysis). Words past
    the top `max_words` by frequency don't influence MERGES (standard
    practice — the tail barely moves pair counts) but their characters
    are still base units, so they always encode."""
    pres = df.select(F.explode(_pretoken_col(text_col, lowercase)).alias("w"))
    top = (
        pres.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    word_counts = {r["w"]: r["c"] for r in top}
    units = (
        pres.select(F.explode(F.split(F.col("w"), "")).alias("u"))
        .filter(F.col("u") != "")
        .distinct()
        .collect()
    )
    merges = train_merges(word_counts, n_merges)
    vocab: dict[str, int] = {UNK_TOKEN: UNK_ID}
    for u in sorted(r["u"] for r in units):
        vocab[u] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return BpeModel(merges=merges, vocab=vocab)


def _encoder(model: BpeModel):
    """word -> tuple of token ids, with a bounded dict cache (web text
    repeats words heavily — the cache turns per-doc cost into
    per-DISTINCT-word cost within each executor). A plain dict, not
    functools.lru_cache: cloudpickle can't serialize an lru_cache-wrapped
    local, and the closure ships to workers inside the pandas UDF."""
    ranks = model.ranks
    vocab = model.vocab
    cache: dict[str, tuple[int, ...]] = {}

    def encode_word(w: str) -> tuple[int, ...]:
        hit = cache.get(w)
        if hit is not None:
            return hit
        s = list(w)
        while len(s) >= 2:
            best_rank, best_i = None, -1
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
        out = tuple(vocab.get(t, UNK_ID) for t in s)
        if len(cache) < (1 << 17):
            cache[w] = out
        return out

    return encode_word


def bpe_encode(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    out_col: str = "token_ids",
    lowercase: bool = True,
) -> DataFrame:
    """Adds `out_col`: array<int> BPE token ids of `text_col` (and keeps
    counts JVM-side — use F.size(out_col) for n_tokens). One Arrow pass,
    zero shuffle; the model rides along as a broadcast closure."""
    enc = _encoder(model)

    def batch(texts):  # no type hints (pandas_udf eval-type inference
        # rejects string annotations under `from __future__ import
        # annotations` — the repo-wide convention)
        def ids(t):
            if t is None:
                return None
            src = t.lower() if lowercase else t
            out: list[int] = []
            for w in _PRETOKEN_RE.findall(src):
                out.extend(enc(w))
            return out

        return texts.map(ids)

    udf = F.pandas_udf(batch, returnType="array<int>")
    return df.withColumn(out_col, udf(F.col(text_col)))


def bpe_decode_ids(model: BpeModel, ids) -> str:
    """Token ids -> the concatenation of their token strings (pure-python
    mirror). NOTE: the pretokenizer drops whitespace, so this reconstructs
    the PRETOKEN CONCATENATION, not the original text — the reconstruction
    invariant both the tests and the driver oracle pin."""
    inv = model.id_to_token()
    return "".join(inv[i] for i in ids)


def bpe_reconstruction_check(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-row tokenizer invariants, all computable without trusting the
    encoder: `reconstruct_ok` (decoded token strings == the pretoken
    concatenation Spark computes independently via regexp_extract_all),
    `has_unk`, and `compress_ok` (n_tokens <= n_units: merges only ever
    shrink). The driver oracle aggregates these to constants."""
    inv_vocab = model.id_to_token()

    def decode_batch(ids_series):  # no type hints (see bpe_encode)
        return ids_series.map(
            lambda ids: None
            if ids is None
            else "".join(inv_vocab.get(int(i), "\x00") for i in ids)
        )

    decode_udf = F.pandas_udf(decode_batch, returnType="string")
    enc = bpe_encode(df, model, text_col, "token_ids", lowercase)
    # NULL text stays NULL end-to-end (ids NULL, pretokens NULL) so the
    # null-safe compare counts it as reconstructed, never as a failure
    pre = F.when(
        F.col(text_col).isNotNull(),
        F.array_join(_pretoken_col(text_col, lowercase), ""),
    )
    return (
        enc.withColumn("_decoded", decode_udf(F.col("token_ids")))
        .withColumn("_pre", pre)
        .select(
            "*",
            F.col("_decoded").eqNullSafe(F.col("_pre")).alias("reconstruct_ok"),
            F.coalesce(
                F.array_contains(F.col("token_ids"), UNK_ID), F.lit(False)
            ).alias("has_unk"),
            F.coalesce(
                F.size(F.col("token_ids")) <= F.length(F.col("_pre")),
                F.lit(True),
            ).alias("compress_ok"),
        )
        .drop("_decoded", "_pre")
    )
