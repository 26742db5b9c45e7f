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


def test_cached_model_keys_on_loader_content():
    """Two loaders defined in the same scope — the documented usage is two
    LAMBDAS (`lambda: fasttext.load_model(...)`, `lambda: kenlm.Model(...)`)
    which share module AND qualname ('<lambda>') — must cache separately;
    repeat lookups must not re-run the loader; and the key must be STABLE
    across re-pickling (cloudpickle hands every Spark task a fresh
    function object, so an id()-based key would reload the model per
    task)."""
    from dataqualitykit_spark.udfs.scoring import _cached_model, _loader_key

    calls = {"a": 0, "b": 0}

    def make(tag):
        def load():
            calls[tag] += 1
            return f"model-{tag}"

        return load

    a, b = make("a"), make("b")
    ka, kb = _loader_key(a), _loader_key(b)
    assert ka != kb  # same qualname, different closures -> different keys
    assert _cached_model(ka, a) == "model-a"
    assert _cached_model(kb, b) == "model-b"
    assert _cached_model(ka, a) == "model-a"
    assert calls == {"a": 1, "b": 1}  # each loader ran exactly once

    # every task receives a re-pickled CLONE of the loader but the SAME
    # driver-computed key (captured in the UDF closure) — the cache must
    # hit on the key, never reload for the fresh function object. (An
    # id()-keyed or re-pickled-bytes-keyed cache would miss here:
    # cloudpickle bytes are not round-trip stable.)
    from pyspark import cloudpickle

    a_clone = cloudpickle.loads(cloudpickle.dumps(a))
    assert a_clone is not a
    assert _cached_model(ka, a_clone) == "model-a"
    assert calls["a"] == 1  # clone did NOT reload


def test_same_scope_lambda_loaders_do_not_collide(spark):
    """End-to-end form of the cache-key fix: both loaders as lambdas in one
    scope (identical module/qualname). Under the old (module, qualname)
    cache key the KenLM slot received the cached fastText object and
    .perplexity blew up; keyed by identity both models serve."""
    lang_load = _lang_loader()
    ppl_load = _ppl_loader()
    cfg = PipelineConfig(
        lang_model_loader=lambda: lang_load(),
        ppl_model_loader=lambda: ppl_load(),
        allowed_langs=("xx",),
    )
    out = run_pipeline(pages_dataframe(spark, 120), cfg)
    scored = out.filter(F.col("lang_pred").isNotNull())
    rows = scored.select("lang_pred", "ppl").distinct().collect()
    assert rows
    assert {r["lang_pred"] for r in rows} == {"xx"}
    assert {round(r["ppl"], 6) for r in rows} == {3.14}
