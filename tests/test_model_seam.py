"""Executable proof of the fastText/KenLM model seam: fake models with the
PRODUCTION interfaces (fastText .predict -> (labels, probs); KenLM
.perplexity -> float) are injected via PipelineConfig loaders, shipped to
the python workers inside the UDF closure, and the pipeline runs green
with their outputs in lang_pred/lang_conf/ppl.

The fakes are defined INSIDE the loader closures on purpose: cloudpickle
then serializes them by value — exactly how a production
`lambda: fasttext.load_model(SparkFiles.get(...))` travels to executors
(nothing from the submitting module needs to be importable on workers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataqualitykit_spark.config import PipelineConfig
from dataqualitykit_spark.fixtures import pages_dataframe
from dataqualitykit_spark.pipeline import run_pipeline


def _lang_loader():
    def load():
        class FakeFastText:
            def predict(self, text: str, k: int = 1):
                assert "\n" not in text  # real fastText rejects newlines
                return (("__label__xx",), (0.77,))

        return FakeFastText()

    return load


def _ppl_loader():
    def load():
        class FakeKenLM:
            def perplexity(self, text: str) -> float:
                return 3.14

        return FakeKenLM()

    return load


def test_pipeline_green_with_injected_models(spark):
    cfg = PipelineConfig(
        lang_model_loader=_lang_loader(),
        ppl_model_loader=_ppl_loader(),
        allowed_langs=("xx",),  # accept the fake model's label
    )
    out = run_pipeline(pages_dataframe(spark, 300), cfg)
    scored = out.filter(F.col("lang_pred").isNotNull())
    rows = scored.select("lang_pred", "lang_conf", "ppl").distinct().collect()
    assert rows, "no scored rows"
    assert {r["lang_pred"] for r in rows} == {"xx"}
    assert {round(r["lang_conf"], 6) for r in rows} == {0.77}
    assert {round(r["ppl"], 6) for r in rows} == {3.14}
    # the model-backed run keeps rows (lang gate passes on the fake label,
    # ppl 3.14 clears max_perplexity) and no row drops for lang/perplexity
    assert out.filter(F.col("keep")).count() > 0
    assert out.filter(F.col("drop_reason").isin("lang", "perplexity")).count() == 0


def test_lang_only_injection_keeps_standins_for_ppl(spark):
    cfg = PipelineConfig(lang_model_loader=_lang_loader(), allowed_langs=("xx",))
    out = run_pipeline(pages_dataframe(spark, 120), cfg)
    scored = out.filter(F.col("lang_pred").isNotNull())
    assert {
        r["lang_pred"] for r in scored.select("lang_pred").distinct().collect()
    } == {"xx"}
    # perplexity still comes from the embedded bigram stand-in (varies)
    assert scored.select("ppl").distinct().count() > 1
