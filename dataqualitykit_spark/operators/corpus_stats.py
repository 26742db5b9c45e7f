"""Corpus-level n-gram statistics — the "what does this corpus actually
say" analysis pass (top boilerplate phrases, contamination candidates,
template discovery) that feeds decontamination lists and
paragraph-scrub thresholds. No reference analog (QualityControl.py's
frequency profiling is per-column categorical, reference
QualityControl.py:1040-1180 — never token n-grams).

100 TB shape — the naive form (explode n-grams, groupBy the STRING)
shuffles the entire corpus's n-gram text. Instead, the repo's
hash-compression idiom (cf. paragraph_scrub, domain_boilerplate_scrub):

1. Count by 52-bit md5 hash: the exchange behind the groupBy carries
   partially aggregated (BIGINT hash, count) pairs only — n-gram
   strings never leave their map task.
2. The global top-k (cnt DESC, hash ASC — a total order both engines
   share) lowers to TakeOrderedAndProject; k rows reach the driver.
3. A second tiny job recovers the winners' strings: filter n-grams
   whose hash is in the k-element plan-literal set (zero-shuffle
   predicate), then groupBy those k hashes with min(ngram) — the only
   strings that ever cross an exchange are the winners'.

md5-13-hex (not xxhash64) so the DuckDB oracle computes the identical
hash — one hash, both engines, and the (astronomically rare) 52-bit
collision behaves IDENTICALLY on both sides: colliding n-grams merge
counts and the lexicographically smallest string represents the bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import words


def _ngram_hash(g: Column) -> Column:
    return F.conv(F.substring(F.md5(g), 1, 13), 16, 10).cast("long")


def _with_ngrams(
    df: DataFrame, text_col: str, n: int, lowercase: bool
) -> DataFrame:
    """Adds _ng: array<string> of word n-grams (space-joined, document
    order); docs with fewer than n tokens contribute none. Arrays
    materialize in their own projections (HOF-over-expensive-array
    re-evaluation trap)."""
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    out = df.withColumn("_toks", words(src))
    if n == 1:
        return out.withColumn("_ng", F.col("_toks")).drop("_toks")
    parts = [F.slice(F.col("_toks"), j + 1, F.size("_toks") - (n - 1)) for j in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p, lambda a, b: F.concat(a, F.lit(" "), b))
    out = out.withColumn(
        "_ng",
        F.when(F.size("_toks") >= n, joined).otherwise(
            F.array().cast("array<string>")
        ),
    )
    return out.drop("_toks")


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Exact global top-k word n-grams by count. Returns (ngram, cnt),
    k rows, deterministically tie-broken at the boundary by
    (cnt DESC, hash ASC). Runs TWO jobs: the bigint count pass (top-k
    collected — k is driver-sized), then the winner-string recovery
    pass; see the module docstring for why the corpus text never
    shuffles."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ng = _with_ngrams(df, text_col, n, lowercase).select(
        F.explode("_ng").alias("_g")
    )
    hashed = ng.select(F.col("_g"), _ngram_hash(F.col("_g")).alias("_h"))
    counts = (
        hashed.select("_h")
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("_h").asc())
        .limit(k)
    )
    winners = counts.collect()  # k rows — a result, not a data collect
    if not winners:
        return df.sparkSession.createDataFrame([], "ngram string, cnt long")
    wh = [r["_h"] for r in winners]
    recovered = (
        hashed.filter(F.col("_h").isin(wh))
        .groupBy("_h")
        .agg(F.min("_g").alias("ngram"))
    )
    cnt_df = df.sparkSession.createDataFrame(
        [(r["_h"], r["cnt"]) for r in winners], "_h long, cnt long"
    )
    return recovered.join(F.broadcast(cnt_df), "_h").select("ngram", "cnt")


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two corpus snapshots over a
    numeric column — the distribution-level drift monitor (the CUSUM
    pass in lineage/metrics watches a SCALAR series; this compares
    SHAPES, e.g. this month's crawl vs last month's quality scores).
    PSI = sum over bins of (p_a - p_b) * ln(p_a / p_b); common reading:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 major shift.

    100 TB shape: bin bounds come from ONE min/max aggregation over
    df_a (or explicit lo/hi — pass them when snapshots should share a
    FIXED grid across many comparisons); each side then bucketizes with
    pure column algebra and aggregates partial counts — two exchanges
    of (bin, count) BIGINT pairs, a broadcast-sized join of <= n_bins
    rows, no driver-side data beyond the two bounds. Empty bins are
    eps-smoothed so the log stays finite (standard PSI practice).

    Returns one row per bin: (bin, n_a, n_b, share_a, share_b,
    psi_term); total PSI = sum(psi_term). NULL values are excluded on
    both sides (count-based shares).
    """
    if lo is None or hi is None:
        row = df_a.agg(
            F.min(col).alias("_lo"), F.max(col).alias("_hi")
        ).first()
        lo = float(row["_lo"]) if lo is None else lo
        hi = float(row["_hi"]) if hi is None else hi
    if not hi > lo:
        hi = lo + 1.0  # degenerate snapshot: one bin catches everything
    width = (hi - lo) / n_bins

    def bucketed(df: DataFrame, alias: str) -> DataFrame:
        x = F.col(col).cast("double")
        b = F.floor((x - F.lit(lo)) / F.lit(width))
        b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b)).cast("int")
        return (
            df.filter(x.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(alias))
        )
    a = bucketed(df_a, "n_a")
    b = bucketed(df_b, "n_b")
    bins = df_a.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        bins.join(a, "bin", "left")
        .join(b, "bin", "left")
        .withColumn("n_a", F.coalesce(F.col("n_a"), F.lit(0)))
        .withColumn("n_b", F.coalesce(F.col("n_b"), F.lit(0)))
    )
    tot = joined.agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    joined = joined.crossJoin(F.broadcast(tot))
    pa = F.greatest(F.col("n_a") / F.col("_ta"), F.lit(eps))
    pb = F.greatest(F.col("n_b") / F.col("_tb"), F.lit(eps))
    return joined.select(
        "bin",
        "n_a",
        "n_b",
        pa.alias("share_a"),
        pb.alias("share_b"),
        ((pa - pb) * F.log(pa / pb)).alias("psi_term"),
    )


def psi_drift_categorical(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    top_k: int = 50,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI over a categorical column (lang/source/domain shares between
    two crawl snapshots). Categories = the top_k most frequent values of
    df_a (count DESC, value ASC — the deterministic tie order the rest
    of the repo uses); everything else, including NULL, folds into the
    '__other__' bucket so the category set is CLOSED and the index is
    comparable across runs.

    100 TB shape: one top-k aggregation on df_a (TakeOrderedAndProject,
    k rows to the driver as plan literals), then two (category, count)
    partial aggregations and a <= k+1-row join — category strings cross
    an exchange only after the map-side fold."""
    cat = F.coalesce(F.col(col).cast("string"), F.lit("__null__"))
    top = [
        r["_c"]
        for r in df_a.groupBy(cat.alias("_c"))
        .count()
        .orderBy(F.col("count").desc(), F.col("_c").asc())
        .limit(top_k)
        .collect()
    ]
    bucket = F.when(cat.isin(top), cat).otherwise(F.lit("__other__"))

    def counted(df: DataFrame, alias: str) -> DataFrame:
        return df.groupBy(bucket.alias("category")).agg(
            F.count(F.lit(1)).alias(alias)
        )

    cats = df_a.sparkSession.createDataFrame(
        [(c,) for c in sorted(set(top) | {"__other__"})], "category string"
    )
    joined = (
        cats.join(counted(df_a, "n_a"), "category", "left")
        .join(counted(df_b, "n_b"), "category", "left")
        .withColumn("n_a", F.coalesce(F.col("n_a"), F.lit(0)))
        .withColumn("n_b", F.coalesce(F.col("n_b"), F.lit(0)))
    )
    tot = joined.agg(F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb"))
    joined = joined.crossJoin(F.broadcast(tot))
    pa = F.greatest(F.col("n_a") / F.col("_ta"), F.lit(eps))
    pb = F.greatest(F.col("n_b") / F.col("_tb"), F.lit(eps))
    return joined.select(
        "category",
        "n_a",
        "n_b",
        pa.alias("share_a"),
        pb.alias("share_b"),
        ((pa - pb) * F.log(pa / pb)).alias("psi_term"),
    )


def ks_2samp(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    n_buckets: int = 256,
    alpha: float = 0.05,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, DISTRIBUTED — the
    reference's scipy.stats.ks_2samp intent (U10 family, a driver
    collect there) without collecting either sample:

        D = max over pooled values of |ECDF_a(x) - ECDF_b(x)|

    Returns ONE row: (n_a, n_b, ks_stat, crit, reject) where crit is
    the large-sample critical value c(alpha) * sqrt((n_a+n_b)/(n_a*n_b)),
    c(alpha) = sqrt(-ln(alpha/2)/2) (Smirnov's asymptotic approximation),
    and reject = ks_stat > crit.

    Scale shape — the textbook form needs one corpus-wide sorted cumsum;
    this is the pack_offsets prefix-sum recipe instead:
      1. per-side groupBy(value) count -> full-outer join: one
         (value, cnt_a, cnt_b) row per DISTINCT pooled value (ties merge
         here, which is exactly the ECDF tie convention);
      2. value-RANGE buckets (one min/max job sizes the grid); per-bucket
         partial counts -> a <= n_buckets-row driver summary -> exclusive
         prefix offsets broadcast back;
      3. within-bucket window cumsum + offset: every bucket computes its
         slice of the global ECDFs IN PARALLEL — no single-partition
         window, shuffles carry (value, two bigints).
    The statistic folds integer counts into cnt/n per row with the same
    IEEE ops any SQL twin uses, so parity is exact."""
    import math as _m

    va = (
        df_a.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    vb = (
        df_b.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    merged = (
        va.join(vb, "v", "full_outer")
        .withColumn("ca", F.coalesce(F.col("ca"), F.lit(0)).cast("long"))
        .withColumn("cb", F.coalesce(F.col("cb"), F.lit(0)).cast("long"))
    )
    spark = df_a.sparkSession
    bounds = merged.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [],
            "n_a long, n_b long, ks_stat double, crit double, reject boolean",
        )
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    span = hi - lo
    if span <= 0:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("v") - F.lit(lo)) / F.lit(span) * n_buckets),
        ).cast("int")
    merged = merged.withColumn("_bk", bucket).localCheckpoint(eager=False)

    # <= n_buckets rows to the driver: per-bucket totals -> exclusive
    # prefix offsets (the pack_offsets recipe)
    partials = {
        r["_bk"]: (r["sa"], r["sb"])
        for r in merged.groupBy("_bk")
        .agg(F.sum("ca").alias("sa"), F.sum("cb").alias("sb"))
        .collect()
    }
    n_a = sum(p[0] for p in partials.values())
    n_b = sum(p[1] for p in partials.values())
    if n_a == 0 or n_b == 0:
        raise ValueError(f"both samples must be non-empty (n_a={n_a}, n_b={n_b})")
    offs, run_a, run_b = [], 0, 0
    for bk in sorted(partials):
        offs.append((bk, run_a, run_b))
        run_a += partials[bk][0]
        run_b += partials[bk][1]
    off_df = spark.createDataFrame(offs, "_bk int, _oa long, _ob long")

    from pyspark.sql import Window as _W

    w = (
        _W.partitionBy("_bk")
        .orderBy("v")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    cum = (
        merged.join(F.broadcast(off_df), "_bk")
        .withColumn("_cuma", F.col("_oa") + F.sum("ca").over(w))
        .withColumn("_cumb", F.col("_ob") + F.sum("cb").over(w))
    )
    d = F.abs(
        F.col("_cuma").cast("double") / F.lit(float(n_a))
        - F.col("_cumb").cast("double") / F.lit(float(n_b))
    )
    ks = cum.agg(F.max(d).alias("ks_stat"))
    c_alpha = _m.sqrt(-_m.log(alpha / 2.0) / 2.0)
    crit = c_alpha * _m.sqrt((n_a + n_b) / (n_a * n_b))
    return ks.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        "ks_stat",
        F.lit(crit).alias("crit"),
        (F.col("ks_stat") > F.lit(crit)).alias("reject"),
    )


def shapiro_francia(
    df: DataFrame,
    col: str,
    tie_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Shapiro-Francia normality statistic W', DISTRIBUTED — the last
    leg of the reference's scipy U10 surface (QualityControl.py calls
    scipy.stats.shapiro on a COLLECTED column; 10^12 rows cannot be
    collected). Shapiro-Francia (Shapiro & Francia 1972; Royston 1993
    shows it is the large-n limit of Shapiro-Wilk) replaces the exact
    SW coefficient vector with Blom normal scores, which makes every
    coefficient a CLOSED FORM of the row's global rank — no length-n
    driver array, no collect:

        m_i = probit((i - 3/8) / (n + 1/4)),   i = global rank of x
        W'  = (sum m_i x_(i))^2 / (sum m_i^2 * sum (x - xbar)^2)

    Scale shape — the global rank is the ks_2samp / pack_offsets
    bucketed prefix-sum recipe: value-range buckets (one min/max job),
    per-bucket counts to the driver (<= n_buckets rows), exclusive
    prefix offsets broadcast back, within-bucket row_number — every
    bucket ranks its slice in parallel; no corpus-wide window, and the
    exchange carries (value, tie_col) only.

    Determinism — the four sums are accumulated in FIXED-POINT micro
    units (each per-row term tie-ruled to 1e-6 then summed as BIGINT,
    the domain_pagerank recipe): integer addition is order-independent,
    so W' is bit-identical across partitionings, re-runs, AND engines —
    a float sum's merge order is scheduler-dependent at cluster scale.
    Cost: ~1e-6 relative quantization on W', far below the statistic's
    sampling noise.

    Ties in ``col`` are broken by ``tie_col`` (must be unique within a
    value; documented deviation — SW/SF assume continuous data where
    ties have probability zero).

    Returns ONE row: (n_obs, w_stat).
    """
    from ..functions.stats import probit_col

    spark = df.sparkSession
    vals = df.select(
        F.col(col).cast("double").alias("v"), F.col(tie_col).alias("t")
    ).filter(F.col("v").isNotNull())

    bounds = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        raise ValueError(f"column {col!r} has no non-null values")
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    span = hi - lo
    if span <= 0:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("v") - F.lit(lo)) / F.lit(span) * n_buckets),
        ).cast("int")
    vals = vals.withColumn("_bk", bucket).localCheckpoint(eager=False)

    partials = {
        r["_bk"]: r["c"]
        for r in vals.groupBy("_bk").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(partials.values())
    if n < 5:
        raise ValueError(f"need >= 5 observations, got {n}")
    offs, run = [], 0
    for bk in sorted(partials):
        offs.append((bk, run))
        run += partials[bk]
    off_df = spark.createDataFrame(offs, "_bk int, _off long")

    from pyspark.sql import Window as _W

    w = _W.partitionBy("_bk").orderBy("v", "t")
    ranked = vals.join(F.broadcast(off_df), "_bk").withColumn(
        "_rank", F.col("_off") + F.row_number().over(w)
    )
    p = (F.col("_rank").cast("double") - F.lit(0.375)) / F.lit(n + 0.25)
    m = probit_col(p)

    def _micro(x: Column) -> Column:
        # shared 1e-6 tie rule, then exact integer accumulation
        return F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long")

    sums = ranked.agg(
        F.sum(_micro(m * F.col("v"))).alias("s_mv"),
        F.sum(_micro(m * m)).alias("s_mm"),
        F.sum(_micro(F.col("v"))).alias("s_v"),
        F.sum(_micro(F.col("v") * F.col("v"))).alias("s_vv"),
    )
    smv = F.col("s_mv").cast("double") / F.lit(1000000.0)
    smm = F.col("s_mm").cast("double") / F.lit(1000000.0)
    sv = F.col("s_v").cast("double") / F.lit(1000000.0)
    svv = F.col("s_vv").cast("double") / F.lit(1000000.0)
    ssq = svv - sv * sv / F.lit(float(n))
    return sums.select(
        F.lit(n).cast("long").alias("n_obs"),
        ((smv * smv) / (smm * ssq)).alias("w_stat"),
    )
