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


_LANG_SCHEMA = (
    "struct<doc_lang: string, n_paras_scored: int, n_mismatch: int,"
    " mismatch_frac: double>"
)


def py_lang_consistency(text, min_words=3):
    """Python mirror of lang_consistency for one doc — pytest goldens and
    the Arrow batch share it. Returns (doc_lang, n_scored, n_mismatch,
    frac) or None for NULL text."""
    from ..semantics import langid, tokenize

    if text is None:
        return None
    doc_lang = langid(text)[0]
    scored = mismatch = 0
    for p in text.split("\n"):
        if p.strip(" ") == "" or len(tokenize(p)) < min_words:
            continue
        p_lang = langid(p)[0]
        if p_lang == "und":
            continue
        scored += 1
        if p_lang != doc_lang:
            mismatch += 1
    frac = (mismatch / scored) if scored else 0.0
    return doc_lang, scored, mismatch, frac


def lang_consistency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
) -> DataFrame:
    """Code-switch / language-consistency report: the fraction of a
    doc's paragraphs whose language disagrees with the doc-level
    prediction — mixed-language pages (translated boilerplate, embedded
    foreign quotes, SEO spam stitching corpora) are a standard webtext
    quality signal CCNet/Gopher-class pipelines act on. No reference
    analog; same langid (script ranges -> stopword profiles) the
    pipeline's scorer uses, applied per paragraph.

    A paragraph is SCORED when non-blank (the repo's strip-spaces
    convention), has >= min_words whitespace tokens, and langid does not
    return 'und' — under-evidence paragraphs carry no signal and count
    toward neither side. mismatch_frac = n_mismatch / n_paras_scored
    (0.0 when nothing scored). NULL text -> NULL row values.

    100 TB shape: exactly paragraph_ppl_scrub's — the decision is
    paragraph-local given the doc, so ONE Arrow pass handles split,
    per-paragraph langid, and the aggregate; no explode, no exchange,
    text crosses the Arrow boundary once."""

    def batch(texts):
        langs, scored_l, mism_l, frac_l = [], [], [], []
        for t in texts:
            r = py_lang_consistency(t, min_words)
            if r is None:
                langs.append(None)
                scored_l.append(None)
                mism_l.append(None)
                frac_l.append(None)
            else:
                langs.append(r[0])
                scored_l.append(r[1])
                mism_l.append(r[2])
                frac_l.append(r[3])
        return pd.DataFrame(
            {
                "doc_lang": langs,
                "n_paras_scored": pd.array(scored_l, dtype="Int32"),
                "n_mismatch": pd.array(mism_l, dtype="Int32"),
                "mismatch_frac": pd.array(frac_l, dtype="Float64"),
            }
        )

    udf = F.pandas_udf(batch, returnType=_LANG_SCHEMA)
    out = df.select(F.col(id_col).alias("id"), udf(F.col(text_col)).alias("_r"))
    return out.select(
        "id",
        F.col("_r.doc_lang").alias("doc_lang"),
        F.col("_r.n_paras_scored").alias("n_paras_scored"),
        F.col("_r.n_mismatch").alias("n_mismatch"),
        F.col("_r.mismatch_frac").alias("mismatch_frac"),
    )
