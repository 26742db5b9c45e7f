"""Mergeable sketch profiling — Count-Min heavy-hitter estimation and
HyperLogLog distinct counting as PURE column algebra over engine-portable
md5 hashes.

Why sketches at 100 TB: corpus profiling questions ("how many distinct
domains?", "which URLs dominate?") are asked per-shard, per-day, and
across snapshots. Exact answers need a full groupBy per question; a
sketch is a CONSTANT-size summary whose partial-aggregate merge is the
same operation Spark's map-side combine already performs — the exchange
carries at most (depth x width) counter rows (CMS) or 2^p bucket maxima
(HLL) per map task, regardless of input size, and yesterday's sketch
unions with today's by the same groupBy. The reference has no sketch
surface (its profiling blocks collect whole columns, e.g. the
StatisticalAnomaly driver stats at QualityControl.py:2545-2700); this
family is the scale path for those diagnostics.

Engine parity (the md5-portable recipe, see sampling.hash_split):
every hash is a slice of md5(utf8(str)) interpreted as an integer —
Spark `conv(substring(md5, ...), 16, 10)` == DuckDB
`('0x' || substring(md5, ...))::BIGINT` — and every accumulation is
either an integer sum/max (order-independent, bit-identical across
partitionings AND engines) or a single final float expression evaluated
in the same association order on both sides. The DuckDB oracle twins
compute the IDENTICAL sketch, so the driver check is a full value-hash
match, not a tolerance test.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: exactly representable in a double AND in a
# BIGINT in both engines; the widest slice the portable recipe allows.
_MAX_HEX = 13


def _md5_slice(s: Column, start: int, n_hex: int) -> Column:
    """Integer value of md5(utf8(s))[start : start+n_hex] (1-based hex
    offsets), as a non-negative BIGINT. n_hex <= 13 keeps it exact."""
    if n_hex > _MAX_HEX:
        raise ValueError(f"hex slice {n_hex} > {_MAX_HEX} loses exactness")
    h = F.md5(F.encode(s, "UTF-8"))
    return F.conv(F.substring(h, start, n_hex), 16, 10).cast("long")


def _md5_slice_sql(expr: str, start: int, n_hex: int) -> str:
    """The DuckDB rendering of the same slice (measured-fact recipe:
    '0x'||hex casts to BIGINT)."""
    return (
        f"CAST('0x' || substring(md5(CAST({expr} AS VARCHAR)), "
        f"{start}, {n_hex}) AS BIGINT)"
    )


# --------------------------------------------------------------- CMS
def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 3,
    seed: str = "",
) -> DataFrame:
    """Count-Min sketch of the frequency distribution of ``col``
    (Cormode & Muthukrishnan 2005): ``depth`` independent hash rows of
    ``width`` counters; estimate(v) = min_i counter[i][h_i(v)], always
    an OVERESTIMATE, off by at most 2N/width with prob 1-2^-depth.

    Returns (row, bucket, cnt) — at most depth*width rows. The groupBy
    exchange is capped at depth*width keys per map task by partial
    aggregation: a trillion-row input moves the same few thousand
    counters a 60k-row input does. Sketches over different shards /
    days UNION + re-groupBy into one (linearity of counters).

    Hash row i keys on md5(f"{i}:{seed}:{value}") — deterministic,
    engine-portable, seed-rotatable. NULL values are skipped (count
    them with missing_scan, not a sketch)."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}/{depth}")
    v = F.col(col).cast("string")
    rows = [
        F.struct(
            F.lit(i).alias("row"),
            (
                _md5_slice(
                    F.concat(F.lit(f"{i}:{seed}:"), v), 1, _MAX_HEX
                )
                % width
            ).alias("bucket"),
        )
        for i in range(depth)
    ]
    return (
        df.filter(v.isNotNull())
        .select(F.explode(F.array(*rows)).alias("s"))
        .groupBy(F.col("s.row").alias("row"), F.col("s.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 3,
    seed: str = "",
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for every row of ``values``: recompute the
    depth bucket ids for ``col``, broadcast-join the (<= depth*width
    row) sketch, take the min counter. Missing (row, bucket) pairs mean
    a zero counter -> estimate 0. Adds ``out_col``; keeps all columns
    of ``values``. width/depth/seed MUST match the sketch's."""
    v = F.col(col).cast("string")
    probes = values.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            _md5_slice(
                                F.concat(F.lit(f"{i}:{seed}:"), v),
                                1,
                                _MAX_HEX,
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_p"),
    ).select("*", F.col("_p.row").alias("row"), F.col("_p.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    keys = [c for c in values.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    width: int = 1024,
    depth: int = 3,
    seed: str = "",
) -> DataFrame:
    """Top-k values of ``col`` by exact count, annotated with the CMS
    estimate — (value, exact_cnt, cms_est), cms_est >= exact_cnt always
    (CMS never undercounts). Ties broken by value for determinism.

    Scale note: the exact leg is one groupBy over the distinct values
    (domains ~10^8: fine); the sketch leg's exchange is constant-size.
    In a streaming / multi-snapshot setting keep only the sketch and
    re-rank candidates against it — the sketch is the mergeable state,
    the exact pass is the verifier."""
    sk = cms_sketch(df, col, width, depth, seed)
    exact = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("value"))
        .limit(k)
    )
    est = cms_estimate(sk, exact, "value", width, depth, seed)
    return est.select("value", "exact_cnt", "cms_est").orderBy(
        F.desc("exact_cnt"), F.asc("value")
    )


def cms_sketch_sql(
    table_expr: str,
    col_expr: str,
    width: int,
    depth: int,
    seed: str = "",
) -> str:
    """DuckDB twin of cms_sketch as a CTE body: SELECT row, bucket, cnt
    FROM ... — the identical hash, identical counters."""
    legs = []
    for i in range(depth):
        key = f"'{i}:{seed}:' || CAST({col_expr} AS VARCHAR)"
        legs.append(
            f"SELECT {i} AS row, "
            f"({_md5_slice_sql(key, 1, _MAX_HEX)} % {width}) AS bucket "
            f"FROM {table_expr} WHERE {col_expr} IS NOT NULL"
        )
    union = " UNION ALL ".join(legs)
    return (
        f"SELECT row, bucket, count(*) AS cnt FROM ({union}) GROUP BY 1, 2"
    )


# --------------------------------------------------------------- HLL
def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 12,
    seed: str = "",
) -> DataFrame:
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007) as one
    groupBy over 2^p buckets — ONE row out: (n_buckets, n_zero_buckets,
    exact_hint_unused...) -> (m, v_zero, hll_estimate).

    Shape: bucket = first p bits of md5 (p in {4..13} hex-aligned here:
    we take 3 hex chars = 12 bits and mod 2^p), w = the NEXT 10 hex
    chars = 40 bits; rho(w) = leading zeros + 1, clamped to 39 so the
    indicator sum stays an exact BIGINT in units of 2^-39:

        term_j = 2^(39 - min(M_j, 39));   M_j = max rho in bucket j
        S      = (m - |present|) * 2^39 + sum_present term_j
        E_raw  = (alpha_m * m^2 * 2^39) / S      -- ONE float division
        E      = m * ln(m / V)  if E_raw <= 2.5m and V > 0  (linear
                 counting; V = empty buckets) else E_raw

    Integer max + integer sum are order-independent -> the sketch is
    bit-identical across partitionings and engines; the final division
    and the ln() branch are single float expressions evaluated in the
    same order by the SQL twin (ln ulp wobble absorbed by the round-6
    tie rule the caller applies). Standard error ~ 1.04/sqrt(m) (1.6%
    at p=12); 40-bit hash space caps usable range around 10^10 distinct
    — raise the slice toward 13 hex and re-derive the clamp for more.

    Exchange: <= 2^p (bucket, max-rho) pairs per map task. Mergeable:
    union two bucket frames and re-max."""
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # python float: exact (alpha * 2^24 * 2^39 stays < 2^63 magnitude,
    # and the product is one IEEE mul of the same literals DuckDB sees)
    numer = alpha * float(m) * float(m) * float(1 << 39)

    v = F.col(col).cast("string")
    h = F.md5(F.encode(F.concat(F.lit(seed), v), "UTF-8"))
    bucket = (F.conv(F.substring(h, 1, 3), 16, 10).cast("long") % m).alias(
        "bucket"
    )
    w = F.conv(F.substring(h, 4, 10), 16, 10).cast("long")
    bin40 = F.lpad(F.bin(w), 40, "0")
    rho = (
        F.lit(40)
        - F.length(F.regexp_replace(bin40, "^0*", ""))
        + F.lit(1)
    ).alias("rho")

    per_bucket = (
        df.filter(v.isNotNull())
        .select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_rho"))
    )
    # pow(2, k) is double-exact for k <= 39; cast back to an exact BIGINT
    # (F.shiftleft needs a python-int shift, not a Column)
    term = F.pow(
        F.lit(2.0),
        (F.lit(39) - F.least(F.col("m_rho"), F.lit(39))).cast("double"),
    ).cast("long")
    agg = per_bucket.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(term).alias("s_present"),
    )
    # coalesce: zero input rows -> sum() is NULL; 0 makes S = m * 2^39,
    # which lands in the linear-counting branch and estimates exactly 0
    s_total = (
        (F.lit(m) - F.col("n_present")).cast("long")
        * F.lit(1 << 39).cast("long")
        + F.coalesce(F.col("s_present"), F.lit(0).cast("long"))
    )
    v_zero = (F.lit(m) - F.col("n_present")).cast("long")
    e_raw = F.lit(numer) / s_total.cast("double")
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double"))
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_zero > F.lit(0)), lin
    ).otherwise(e_raw)
    return agg.select(
        F.lit(m).cast("long").alias("n_buckets"),
        v_zero.alias("n_zero_buckets"),
        est.alias("hll_estimate"),
    )


# ------------------------------------------------------------- Bloom
def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int = 4096,
    k: int = 3,
    seed: str = "",
) -> DataFrame:
    """Bloom filter over the distinct values of ``col`` as a (word_idx,
    bits) table — n_bits/32 rows of 32-bit words held in BIGINTs (32,
    not 64, so every mask is pow(2, offset<=31): double-exact, positive,
    sign-bit-free in both engines).

    Bit i_hash positions come from the md5-portable slice:
    h = md5(f"{i}:{seed}:{value}")[0:13hex] % n_bits. The build is one
    groupBy(bit_or) whose exchange is capped at n_bits/32 keys per map
    task by partial aggregation; two blooms over different shards merge
    by union + re-bit_or. NULLs are skipped."""
    if n_bits % 32 or n_bits < 32:
        raise ValueError(f"n_bits must be a positive multiple of 32: {n_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.col(col).cast("string")
    legs = []
    for i in range(k):
        h = _md5_slice(F.concat(F.lit(f"{i}:{seed}:"), v), 1, _MAX_HEX) % n_bits
        legs.append(
            F.struct(
                F.floor(h / F.lit(32.0)).cast("long").alias("word_idx"),
                F.pow(F.lit(2.0), (h % 32).cast("double"))
                .cast("long")
                .alias("mask"),
            )
        )
    return (
        df.filter(v.isNotNull())
        .select(F.explode(F.array(*legs)).alias("s"))
        .groupBy(F.col("s.word_idx").alias("word_idx"))
        .agg(F.bit_or(F.col("s.mask")).alias("bits"))
    )


def bloom_word_array(
    df: DataFrame,
    col: str,
    n_bits: int = 4096,
    k: int = 3,
    seed: str = "",
) -> list[int]:
    """Collect the bloom into a dense python word list (len n_bits/32) —
    BOUNDED driver state like the IVF centroids: n_bits <= ~2^22 keeps
    the literal array a few hundred KB of plan. For benchmark-gram blooms
    past that (10^8+ grams), keep the (word_idx, bits) FRAME and probe by
    broadcast join on word_idx instead of the plan-literal path."""
    words = [0] * (n_bits // 32)
    for r in bloom_build(df, col, n_bits, k, seed).collect():
        words[r["word_idx"]] = r["bits"]
    return words


def bloom_contains_col(
    words: list[int],
    value: Column,
    n_bits: int,
    k: int = 3,
    seed: str = "",
) -> Column:
    """Membership predicate against a PLAN-LITERAL bloom: k md5 slices,
    k array lookups, k bit tests, AND-fold — a pure whole-stage-codegen
    projection with ZERO shuffle and zero join; usable inside array HOFs
    (F.filter over a doc's shingles). False positives are a
    deterministic function of the hashes, so an engine twin computing
    the same bloom reproduces them bit-for-bit."""
    arr = F.array(*[F.lit(int(w)) for w in words])
    cond = None
    for i in range(k):
        h = (
            _md5_slice(
                F.concat(F.lit(f"{i}:{seed}:"), value.cast("string")),
                1,
                _MAX_HEX,
            )
            % n_bits
        )
        word = F.floor(h / F.lit(32.0)).cast("int")
        mask = F.pow(F.lit(2.0), (h % 32).cast("double")).cast("long")
        bit = F.get(arr, word).bitwiseAND(mask) != F.lit(0)
        cond = bit if cond is None else cond & bit
    return cond


def bloom_contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    n_bits: int = 4096,
    k: int = 3,
    seed: str = "",
) -> DataFrame:
    """Benchmark decontamination through a Bloom filter — the sketch
    variant of dedup.contamination_flags (same n-gram rule): the
    benchmark's distinct word n-grams build a bloom ONCE (bounded
    driver state), and the corpus probe is a per-doc array HOF over its
    distinct shingles — NO corpus-side explode, NO join, NO exchange at
    all for the flagging itself; the only cost is the scan. The price
    is a deterministic false-positive rate (~(1-e^(-kn/m))^k); size
    n_bits ~ 10-15 bits/gram to keep it under 1%.

    Returns (id, n_bloom_hits, flagged): n_bloom_hits counts the doc's
    DISTINCT shingles that pass the bloom (true hits + deterministic
    false positives), flagged = n_bloom_hits >= 1."""
    from .dedup import with_shingles

    bench = (
        with_shingles(benchmark, text_col, id_col, n)
        .select(F.explode(F.array_distinct("shingles")).alias("s"))
        .distinct()
    )
    words = bloom_word_array(bench, "s", n_bits, k, seed)
    sh = with_shingles(corpus, text_col, id_col, n)
    # coalesce: a NULL-text doc has NULL shingles -> size() is NULL under
    # ANSI; report 0 hits like the join-based contamination_flags does
    hits = F.coalesce(
        F.size(
            F.filter(
                F.array_distinct("shingles"),
                lambda s: bloom_contains_col(words, s, n_bits, k, seed),
            )
        ),
        F.lit(0),
    )
    # two chained selects so `flagged` references the computed column —
    # inlining `hits` twice would duplicate the k literal-array probes
    # in the plan (observed: 2x codegen size at n_bits=4096)
    return sh.select("id", hits.alias("n_bloom_hits")).select(
        "id",
        "n_bloom_hits",
        (F.col("n_bloom_hits") >= F.lit(1)).alias("flagged"),
    )


def bloom_build_sql(
    table_expr: str,
    col_expr: str,
    n_bits: int,
    k: int,
    seed: str = "",
) -> str:
    """DuckDB twin of bloom_build as a SELECT body: (word_idx, bits)."""
    legs = []
    for i in range(k):
        key = f"'{i}:{seed}:' || CAST({col_expr} AS VARCHAR)"
        h = f"({_md5_slice_sql(key, 1, _MAX_HEX)} % {n_bits})"
        legs.append(
            f"SELECT CAST(floor({h} / 32.0) AS BIGINT) AS word_idx, "
            f"CAST(pow(2.0, {h} % 32) AS BIGINT) AS mask "
            f"FROM {table_expr} WHERE {col_expr} IS NOT NULL"
        )
    union = " UNION ALL ".join(legs)
    return (
        f"SELECT word_idx, bit_or(mask) AS bits FROM ({union}) GROUP BY 1"
    )


def hll_distinct_sql(
    table_expr: str,
    col_expr: str,
    p: int = 12,
    seed: str = "",
) -> str:
    """DuckDB twin of hll_distinct — same buckets, same rho, same exact
    integer sum, same single float division / ln branch, same column
    names. Returns a full SELECT statement."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer = alpha * float(m) * float(m) * float(1 << 39)
    key = f"'{seed}' || CAST({col_expr} AS VARCHAR)"
    h = f"md5({key})"
    bucket = f"(CAST('0x' || substring({h}, 1, 3) AS BIGINT) % {m})"
    w = f"CAST('0x' || substring({h}, 4, 10) AS BIGINT)"
    bin40 = f"lpad(bin({w}), 40, '0')"
    rho = f"(40 - length(regexp_replace({bin40}, '^0*', '')) + 1)"
    return f"""
        WITH pb AS (
          SELECT {bucket} AS bucket, max({rho}) AS m_rho
          FROM {table_expr} WHERE {col_expr} IS NOT NULL
          GROUP BY 1
        ), ag AS (
          SELECT count(*) AS n_present,
                 sum(CAST(pow(2.0, 39 - least(m_rho, 39)) AS BIGINT))
                   AS s_present
          FROM pb
        )
        SELECT CAST({m} AS BIGINT) AS n_buckets,
               CAST({m} - n_present AS BIGINT) AS n_zero_buckets,
               CASE WHEN ({numer!r} / CAST(({m} - n_present) * {1 << 39}
                            + coalesce(s_present, 0) AS DOUBLE)) <= {2.5 * m!r}
                         AND ({m} - n_present) > 0
                    THEN {float(m)!r}
                         * ln({float(m)!r} / CAST({m} - n_present AS DOUBLE))
                    ELSE {numer!r} / CAST(({m} - n_present) * {1 << 39}
                            + coalesce(s_present, 0) AS DOUBLE)
               END AS hll_estimate
        FROM ag"""


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Union + re-bit_or: blooms built with IDENTICAL (n_bits, k, seed)
    over different shards/crawls merge into the bloom of the union —
    bit_or is associative/commutative, so the merged words are
    bit-identical to a single build over all rows."""
    if not blooms:
        raise ValueError("need at least one bloom")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_save(
    bloom: DataFrame, path: str, n_bits: int, k: int, seed: str = ""
) -> None:
    """Persist a bloom with its parameters STAMPED on every row — a
    cross-run probe or merge with mismatched (n_bits, k, seed) would be
    silent garbage, so bloom_load validates them instead of trusting the
    caller. The words parquet is tiny (n_bits/32 rows)."""
    bloom.select(
        F.lit(n_bits).alias("n_bits"),
        F.lit(k).alias("k"),
        F.lit(seed).alias("seed"),
        "word_idx",
        "bits",
    ).write.mode("overwrite").parquet(path)


def bloom_load(
    spark, path: str, expect: tuple[int, int, str] | None = None
):
    """-> (words frame, n_bits, k, seed). Raises when the stored params
    disagree internally (mixed writes) or with `expect`."""
    df = spark.read.parquet(path)
    metas = df.select("n_bits", "k", "seed").distinct().collect()
    if len(metas) != 1:
        raise ValueError(f"mixed bloom parameters in {path}: {metas}")
    n_bits, k, seed = metas[0]["n_bits"], metas[0]["k"], metas[0]["seed"]
    if expect is not None and (n_bits, k, seed) != expect:
        raise ValueError(
            f"bloom {path} has (n_bits={n_bits}, k={k}, seed={seed!r}), "
            f"expected {expect}"
        )
    return df.select("word_idx", "bits"), n_bits, k, seed


def bloom_update(
    spark, path: str, df: DataFrame, col: str
) -> DataFrame:
    """Cross-crawl accumulator: load the persisted bloom, absorb the new
    shard's values, save back. The result equals a fresh build over the
    union of every shard ever absorbed (bit_or associativity) — the
    'seen before' store an incremental decontamination / dedup pass
    probes between crawls. Returns the merged words frame."""
    old, n_bits, k, seed = bloom_load(spark, path)
    merged = bloom_merge(old, bloom_build(df, col, n_bits, k, seed))
    # materialize BEFORE overwriting the path being read (lazy plans
    # would read-after-truncate); n_bits/32 rows is driver-trivial
    rows = merged.collect()
    fresh = spark.createDataFrame(rows, "word_idx long, bits long")
    bloom_save(fresh, path, n_bits, k, seed)
    return fresh
