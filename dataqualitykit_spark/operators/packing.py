"""Training-sequence preparation — the last mile between a filtered
corpus and a tokenizer-ready dataset: split long documents into
bounded-size chunks, and assign every document its deterministic offset
in the virtual concatenation the trainer will read (the GPT-style
"concatenate everything, slice into fixed-length sequences" packing).
No reference analog (QualityControl.py stops at per-column checks);
task-brief training-data op family.

100 TB shapes:
- chunk_documents is a pure projection + explode — per-doc-local, zero
  corpus exchange; token arrays materialize in their OWN projection so
  the chunk-builder HOF never re-runs the tokenizer per chunk (the
  repo's measured HOF-over-expensive-array re-evaluation trap).
- pack_offsets needs a corpus-wide EXCLUSIVE PREFIX SUM — the naive
  one-window cumsum funnels the whole corpus through a single window
  partition. Instead the sampler's bucket idiom, generalized: partial
  sums per (group, md5-prefix bucket) collect to the driver (bounded:
  16^bucket_chars rows per group), the driver computes per-bucket base
  offsets, and every bucket cumsums ONLY its own rows in parallel.
  Scale the per-bucket row count with `bucket_chars` (2 -> 256 buckets,
  4 -> 65,536) so one bucket's window partition stays executor-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each doc into consecutive chunks of at most `max_tokens`
    whitespace tokens: (id, chunk_id, chunk_text, n_tokens). Chunk text
    is the space-join of its tokens (whitespace NORMALIZES — runs of
    whitespace become single spaces; the token sequence, which is what
    the tokenizer consumes, is preserved exactly). Token-less docs
    (NULL / empty / whitespace) emit no rows."""
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    toks = df.select(
        F.col(id_col).alias("id"), T.words(F.col(text_col)).alias("_toks")
    )
    n = F.size("_toks")
    n_chunks = F.ceil(n / F.lit(max_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(F.col("_toks"), i * max_tokens + 1, max_tokens), " "
        ),
    )
    out = toks.filter(n > 0).select(
        "id", F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.select(
        "id",
        "chunk_id",
        "chunk_text",
        T.word_count(F.col("chunk_text")).cast("long").alias("n_tokens"),
    )


def pack_offsets(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str | None = None,
    token_expr=None,
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic exclusive prefix-sum packing bookkeeping: every row
    gains `offset` (its first token's position in the virtual
    concatenation of its group, ordered by the samplers' stable
    (md5(id), id) key), `seq_id` = offset // seq_len and `seq_pos` =
    offset % seq_len, plus `n_tokens`. A row with seq_pos + n_tokens >
    seq_len spans a sequence boundary — the writer's split point.
    `by=None` packs the whole corpus as one stream; otherwise one stream
    per group (NULL group = its own stream). Row-identical to the
    one-window cumsum form by construction (that form is the oracle)."""
    toks = (
        token_expr
        if token_expr is not None
        else T.token_count_pretokens(F.col(text_col))
    )
    if by is None:
        gkey = F.lit("all")
    else:
        gkey = F.when(F.col(by).isNull(), F.lit("\x00null")).otherwise(
            F.concat(F.lit("v:"), F.col(by).cast("string"))
        )
    base = (
        df.withColumn(
            "_key", F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
        )
        .withColumn("_bkt", F.substring("_key", 1, bucket_chars))
        .withColumn("_g", gkey)
        .withColumn("n_tokens", F.coalesce(toks.cast("long"), F.lit(0)))
    )
    spark = df.sparkSession
    sums = (
        base.groupBy("_g", "_bkt").agg(F.sum("n_tokens").alias("_s")).collect()
    )
    per_group: dict = {}
    for r in sums:
        per_group.setdefault(r["_g"], []).append((r["_bkt"], r["_s"]))
    bases = []
    for g, buckets in per_group.items():
        running = 0
        for b, s in sorted(buckets):
            bases.append((g, b, running))
            running += s
    basedf = spark.createDataFrame(bases, "_g string, _bkt string, _base long")
    w = Window.partitionBy("_g", "_bkt").orderBy("_key", id_col)
    out = (
        base.join(F.broadcast(basedf), ["_g", "_bkt"])
        .withColumn(
            "offset",
            F.col("_base") + F.sum("n_tokens").over(w) - F.col("n_tokens"),
        )
        # `div` = exact LONG division (a double-division round trip loses
        # exactness past 2^53 — reachable offsets at 10^12-doc scale)
        .withColumn("seq_id", F.expr(f"offset div {int(seq_len)}"))
        .withColumn("seq_pos", F.col("offset") % seq_len)
        .drop("_key", "_bkt", "_g", "_base")
    )
    return out
