"""Structured-Streaming composition of the session-5 stateless ops:
justext_extract and scrub_credit_cards are per-row Arrow projections, so
they run UNCHANGED over readStream; these tests pin stream == batch."""

from __future__ import annotations

from dataqualitykit_spark.operators import justext, pii


def _stream_vs_batch(spark, tmp_path, df_schema, rows, apply_fn, name, keys):
    src = str(tmp_path / f"src_{name}")
    batch_df = spark.createDataFrame(rows, df_schema)
    batch_df.write.parquet(src)
    batch = {r["doc_id"]: tuple(r[k] for k in keys) for r in apply_fn(batch_df).collect()}

    stream = spark.readStream.schema(df_schema).parquet(src)
    out = apply_fn(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName(f"s5_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: tuple(r[k] for k in keys)
        for r in spark.sql(f"select * from s5_{name}").collect()
    }
    assert got == batch


def test_streaming_justext(spark, tmp_path):
    good = (
        "the quick brown fox and the lazy dog are in the yard with all of "
        "them watching closely"
    )
    rows = [
        (i, f"<div><a href='/'>nav bar here</a></div><h1>head</h1><p>{good} {i}</p>")
        for i in range(40)
    ] + [(99, None), (100, "<p></p>")]
    params = justext.JusTextParams(
        length_low=20, length_high=60, stopwords_low=0.20, stopwords_high=0.30
    )
    _stream_vs_batch(
        spark,
        tmp_path,
        "doc_id long, html string",
        rows,
        lambda df: justext.justext_extract(df, "html", params),
        "justext",
        ("n_blocks", "n_good", "justext_text"),
    )


def test_streaming_pii_luhn(spark, tmp_path):
    rows = [
        (i, f"doc {i} visa 4532015112830366 bogus 4532015112830367") for i in range(40)
    ] + [(99, None), (100, "clean")]
    _stream_vs_batch(
        spark,
        tmp_path,
        "doc_id long, text string",
        rows,
        pii.scrub_credit_cards,
        "pii",
        ("cc_scrubbed", "n_cc_candidates", "n_cc_valid"),
    )
