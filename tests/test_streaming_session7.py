"""Structured-Streaming composition of the session-7 stateless ops:
html_meta extraction, publish dates, readability, compression ratio and
homoglyph folding are per-row projections (codegen or Arrow), so they run
UNCHANGED over readStream; these tests pin stream == batch."""

from __future__ import annotations

from dataqualitykit_spark.operators import compression, encoding, html_meta, readability


def _stream_vs_batch(spark, tmp_path, df_schema, rows, apply_fn, name, keys):
    src = str(tmp_path / f"src_{name}")
    batch_df = spark.createDataFrame(rows, df_schema)
    batch_df.write.parquet(src)
    batch = {
        r["doc_id"]: tuple(r[k] for k in keys)
        for r in apply_fn(batch_df).collect()
    }

    stream = spark.readStream.schema(df_schema).parquet(src)
    out = apply_fn(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName(f"s7_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: tuple(r[k] for k in keys)
        for r in spark.sql(f"select * from s7_{name}").collect()
    }
    assert got == batch


def test_streaming_html_meta(spark, tmp_path):
    rows = [
        (
            i,
            f'<html lang="en"><title>Doc {i}</title>'
            f'<meta name="description" content="page {i}">'
            f'<meta property="article:published_time" content="2024-01-0{1 + i % 9}T00:00:00Z">',
        )
        for i in range(30)
    ] + [(99, None), (100, "<p>bare</p>")]
    _stream_vs_batch(
        spark,
        tmp_path,
        "doc_id long, html string",
        rows,
        lambda df: html_meta.extract_publish_dates(
            html_meta.extract_html_meta(df, "html"), "html"
        ),
        "htmlmeta",
        ("title", "meta_description", "html_lang", "publish_date_raw", "publish_ts"),
    )


def test_streaming_readability(spark, tmp_path):
    rows = [
        (i, f"Sentence number {i} is here. It has words. Beautiful ones!")
        for i in range(30)
    ] + [(99, None), (100, "")]
    _stream_vs_batch(
        spark,
        tmp_path,
        "doc_id long, text string",
        rows,
        lambda df: readability.readability(df),
        "readability",
        ("n_words", "n_sentences", "n_syllables", "flesch_ease", "fk_grade"),
    )


def test_streaming_compression(spark, tmp_path):
    rows = [(i, ("abcd" if i % 2 else "word salad every time ") * 100) for i in range(30)]
    rows += [(99, None), (100, "")]
    _stream_vs_batch(
        spark,
        tmp_path,
        "doc_id long, text string",
        rows,
        lambda df: compression.compression_ratio(df),
        "compress",
        ("n_bytes", "c_bytes", "compress_ratio"),
    )


def test_streaming_homoglyphs(spark, tmp_path):
    rows = [(i, f"doc {i} рaу оnline сasinо") for i in range(30)]
    rows += [(99, None), (100, "plain")]
    _stream_vs_batch(
        spark,
        tmp_path,
        "doc_id long, text string",
        rows,
        lambda df: encoding.fold_homoglyphs(df),
        "homoglyph",
        ("text_folded", "homoglyph_count"),
    )


def test_dataset_card_and_streaming_counts(spark, tmp_path):
    """dataset_card unit golden + the same aggregation running over
    readStream in complete mode (counts are commutative aggregates)."""
    from dataqualitykit_spark.pipeline import dataset_card

    rows = [
        # lang_pred, keep, n_words
        ("en", True, 10),
        ("en", True, 5),
        ("en", False, 7),
        ("de", False, 3),
        ("de", True, None),  # kept row with NULL n_words counts 0 words
    ]
    schema = "lang_pred string, keep boolean, n_words int"
    df = spark.createDataFrame(rows, schema)
    got = {r["lang_pred"]: r for r in dataset_card(df).collect()}
    assert (got["en"]["docs"], got["en"]["kept"], got["en"]["kept_words"],
            got["en"]["total_words"]) == (3, 2, 15, 22)
    assert got["en"]["keep_rate"] == round(2 / 3, 6)
    assert (got["de"]["docs"], got["de"]["kept"], got["de"]["kept_words"]) == (2, 1, 0)

    src = str(tmp_path / "card_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = dataset_card(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("s7_card")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_s = {
        r["lang_pred"]: r for r in spark.sql("select * from s7_card").collect()
    }
    for lang in ("en", "de"):
        for f in ("docs", "kept", "kept_words", "total_words", "keep_rate"):
            assert got_s[lang][f] == got[lang][f], (lang, f)
