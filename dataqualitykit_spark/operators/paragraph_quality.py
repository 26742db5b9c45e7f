"""CCNet-style paragraph-level LM quality filtering (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): score each paragraph with the char-bigram LM and drop the
high-perplexity ones — the span-level companion to the doc-level
perplexity gate (a page can be mostly clean prose with one gibberish
nav/ad block; doc-level ppl averages it away, paragraph-level surgery
removes it). No reference analog; task-brief training-data op family.

100 TB shape: ONE Arrow pass over the doc text — the paragraph split,
per-paragraph scoring (the same semantics.perplexity the pipeline's
scorer uses) and reassembly all happen inside the batch, so there is no
explode, no (paragraph, id) exchange, and no groupBy reassembly; the
corpus text crosses the JVM<->Python boundary exactly once. Contrast
dedup.paragraph_dedup, which NEEDS a corpus-wide exchange because its
decision (repeated across docs) is global — a perplexity decision is
per-paragraph-local, so the whole op stays map-side.
"""

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_RESULT_SCHEMA = (
    "struct<cleaned_text: string, n_paras: int, n_dropped: int>"
)


def paragraph_ppl_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ppl: float = 22.0,
) -> DataFrame:
    """Rewrite `text_col` with high-perplexity paragraphs removed.

    Paragraphs are newline-separated; BLANK paragraphs (space-trimmed
    empty, the repo's paragraph convention) are preserved as structure
    and never scored. Non-blank paragraphs with char-bigram perplexity
    > max_ppl are dropped — note non-[a-z ] scripts project to a near
    empty sequence and score the +inf sentinel, so non-Latin paragraphs
    drop under any threshold (CCNet's behavior: the LM defines the
    target distribution). NULL text stays NULL.

    Returns (id, cleaned_text, n_paras — non-blank paragraph count,
    n_dropped)."""
    from ..semantics import perplexity

    def batch(texts):
        cleaned, n_paras, n_dropped = [], [], []
        for t in texts:
            if t is None:
                cleaned.append(None)
                n_paras.append(0)
                n_dropped.append(0)
                continue
            kept, np_, nd = [], 0, 0
            for p in t.split("\n"):
                if p.strip(" ") == "":
                    kept.append(p)
                    continue
                np_ += 1
                if perplexity(p) <= max_ppl:
                    kept.append(p)
                else:
                    nd += 1
            cleaned.append("\n".join(kept))
            n_paras.append(np_)
            n_dropped.append(nd)
        return pd.DataFrame(
            {"cleaned_text": cleaned, "n_paras": n_paras, "n_dropped": n_dropped}
        )

    udf = F.pandas_udf(batch, returnType=_RESULT_SCHEMA)
    out = df.select(
        F.col(id_col).alias("id"), udf(F.col(text_col)).alias("_r")
    )
    return out.select(
        "id",
        F.col("_r.cleaned_text").alias("cleaned_text"),
        F.col("_r.n_paras").alias("n_paras"),
        F.col("_r.n_dropped").alias("n_dropped"),
    )
