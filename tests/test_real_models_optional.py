"""OPTIONAL-EXTRA test: load REAL fastText + KenLM models through the
production seam (udfs/scoring.scoring_udf loaders) and run the pipeline
green. Skips wherever the libraries are absent (this sandbox); on any
host with `pip install .[models]` it runs for real — no pretrained model
files needed: a tiny supervised fastText model is trained in-test and a
minimal hand-written ARPA feeds KenLM.

This closes the loop the interface-double tests (test_model_seam.py)
leave open: the doubles prove the seam's plumbing, this proves the real
libraries' objects survive cloudpickle into Spark's Python workers and
their outputs land in lang_pred/lang_conf/ppl.
"""

from __future__ import annotations

import pytest

fasttext = pytest.importorskip("fasttext")
kenlm = pytest.importorskip("kenlm")

from pyspark.sql import functions as F  # noqa: E402

from dataqualitykit_spark.config import PipelineConfig  # noqa: E402
from dataqualitykit_spark.fixtures import pages_dataframe  # noqa: E402
from dataqualitykit_spark.pipeline import run_pipeline  # noqa: E402

# a minimal, valid ARPA file — KenLM only needs <unk>/<s>/</s> plus a few
# unigrams to construct a scoring model
_TINY_ARPA = """\\data\\
ngram 1=6

\\1-grams:
-1.5\t<unk>
-1.2\t<s>
-1.2\t</s>
-0.8\tthe
-0.9\tand
-1.0\twater

\\end\\
"""


def _train_fasttext(tmp_path):
    train = tmp_path / "ft_train.txt"
    en = "the water and the green fields were wide and the day was long"
    de = "das wasser und die felder waren weit und der tag war lang"
    lines = []
    for i in range(50):
        lines.append(f"__label__en {en} {i}")
        lines.append(f"__label__de {de} {i}")
    train.write_text("\n".join(lines))
    model = fasttext.train_supervised(
        str(train), epoch=10, minCount=1, dim=16, seed=7, thread=1
    )
    path = tmp_path / "lid_tiny.bin"
    model.save_model(str(path))
    return str(path)


def test_pipeline_green_with_real_models(spark, tmp_path):
    ft_path = _train_fasttext(tmp_path)
    arpa_path = tmp_path / "tiny.arpa"
    arpa_path.write_text(_TINY_ARPA)
    arpa = str(arpa_path)

    # sanity outside Spark first: the real objects expose the production
    # interfaces the seam documents
    labels, probs = fasttext.load_model(ft_path).predict("the water and fields")
    assert labels[0].startswith("__label__")
    assert kenlm.Model(arpa).perplexity("the water and") > 0

    cfg = PipelineConfig(
        # the documented one-liner swap: plain lambdas, pickled by value
        lang_model_loader=lambda: fasttext.load_model(ft_path),
        ppl_model_loader=lambda: kenlm.Model(arpa),
        allowed_langs=("en", "de"),
        max_perplexity=1e9,  # the tiny ARPA's ppl scale is arbitrary
    )
    out = run_pipeline(pages_dataframe(spark, 200), cfg)
    scored = out.filter(F.col("lang_pred").isNotNull())
    assert scored.count() > 0
    langs = {r["lang_pred"] for r in scored.select("lang_pred").distinct().collect()}
    assert langs <= {"en", "de"}, langs
    # real KenLM perplexities: positive, finite, and varying across docs
    ppls = [r["ppl"] for r in scored.select("ppl").distinct().collect()]
    assert all(p is not None and p > 0 for p in ppls)
    assert len(ppls) > 1
    assert out.filter(F.col("keep")).count() > 0
