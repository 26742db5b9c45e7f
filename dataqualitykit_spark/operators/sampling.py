"""Deterministic token-budget sampling — "give me ~N tokens per language
from this corpus, reproducibly" — the standard curriculum/mixture step
between filtering and training. No reference analog (S5 in SURVEY.md is
plain row sampling via df.sample); task-brief training-data operator.

Semantics: within each `by` group, docs are ordered by the pseudo-random
but fully deterministic key (md5(id), id) and kept while the running
token total stays <= budget — i.e. the kept set is a reproducible random
prefix whose token mass is the budget (the first doc past the line is
dropped, not truncated).

100 TB shape — a naive one-window cumsum puts an entire language in ONE
window partition (billions of rows through a single task); instead a
DISTRIBUTED PREFIX-SUM CUT:

1. one partial-aggregated pass sums tokens per (group, 256 md5-prefix
   buckets); the 256*|groups| summary collects to the driver (bounded
   and tiny — same contract as the ANN query batches),
2. the driver prefix-sums each group's buckets in hex order and finds
   the cutoff bucket + remaining budget,
3. full buckets keep every row via a broadcast semi-join; ONLY the
   cutoff bucket (1/256 of one group) runs a window cumsum.

Because the bucket is the first two hex chars of the SAME md5 key the
window orders by, (bucket, key, id) ordering == global (key, id)
ordering, so the three-phase result is row-identical to the one-window
form (the DuckDB oracle runs the one-window form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as T


def _spark_str(g) -> str:
    """Render a python group value the way Spark's CAST(col AS STRING)
    renders it, so dict budget keys match the frame-side key. Booleans
    are the known divergence (Spark 'true' vs python 'True'); str/int
    agree; float str() matches Spark for plain doubles. Reject exotic
    key types loudly rather than silently budgeting the group 0."""
    if isinstance(g, bool):
        return "true" if g else "false"
    if not isinstance(g, (str, int, float)):
        raise TypeError(
            f"budget/proportions group key {g!r} has unsupported type "
            f"{type(g).__name__}; use str/bool/int/float/None keys that "
            "render identically to Spark's CAST(col AS STRING)"
        )
    return str(g)


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "lang",
    token_expr=None,
) -> DataFrame:
    """Keep a deterministic ~budget_tokens prefix per `by` group.

    `budget_tokens` is one int for every group, or a dict mapping group
    VALUES (None allowed for the NULL group) to per-group budgets — the
    mixture form sample_to_mixture builds on; groups absent from the
    dict are dropped entirely (budget 0).

    Returns the input rows (all columns) plus `n_tokens`. `id_col` must
    be unique per row (it seeds the order key). Rows with a NULL `by`
    value form their OWN group with its own budget. `token_expr` overrides
    the token counter (default: whitespace tokens — the cheap hot-path
    estimate; pass functions.text.token_count_bpe for BPE counts)."""
    toks = (
        token_expr
        if token_expr is not None
        else T.token_count_pretokens(F.col(text_col))
    )
    # internal NULL-SAFE group key: plain joins on the raw `by` column
    # would never match NULL=NULL and silently drop the whole NULL group
    # (e.g. lang detection failed); distinct prefixes make the sentinel
    # collision-free
    gkey = F.when(F.col(by).isNull(), F.lit("\x00null")).otherwise(
        F.concat(F.lit("v:"), F.col(by).cast("string"))
    )
    base = (
        df.withColumn(
            "_key", F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
        )
        .withColumn("_bkt", F.substring("_key", 1, 2))
        .withColumn("_g", gkey)
        .withColumn("n_tokens", F.coalesce(toks.cast("long"), F.lit(0)))
    )
    spark = df.sparkSession

    if isinstance(budget_tokens, dict):
        # sentinel-keyed view of the caller's raw-group-value budgets.
        # The frame-side key is CAST(col AS STRING), so python keys must
        # be rendered the way Spark renders them — notably booleans are
        # lowercase ('true', not str(True)='True'); a mismatch would
        # silently assign the group budget 0.
        bmap = {
            ("\x00null" if g is None else f"v:{_spark_str(g)}"): int(q)
            for g, q in budget_tokens.items()
        }
        budget_of = lambda g: bmap.get(g, 0)  # noqa: E731
    else:
        budget_of = lambda g: budget_tokens  # noqa: E731

    sums = base.groupBy("_g", "_bkt").agg(F.sum("n_tokens").alias("_s")).collect()
    per_group: dict = {}
    for r in sums:
        per_group.setdefault(r["_g"], []).append((r["_bkt"], r["_s"]))
    full_rows, cut_rows = [], []
    for g, buckets in per_group.items():
        budget = budget_of(g)
        running = 0
        for b, s in sorted(buckets):
            if running + s <= budget:
                full_rows.append((g, b))
                running += s
            else:
                cut_rows.append((g, b, budget - running))
                break  # later buckets start past the budget

    full = spark.createDataFrame(full_rows, "_g string, _bkt string")
    kept_full = base.join(F.broadcast(full), ["_g", "_bkt"], "left_semi")

    cut = spark.createDataFrame(cut_rows, "_g string, _bkt string, _rem long")
    w = Window.partitionBy("_g", "_bkt").orderBy("_key", id_col)
    kept_cut = (
        base.join(F.broadcast(cut), ["_g", "_bkt"])
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") <= F.col("_rem"))
        .drop("_rem", "_cum")
    )
    return (
        kept_full.unionByName(kept_cut)
        .drop("_key", "_bkt", "_g")
    )


def top_fraction_by_score(
    df: DataFrame,
    frac: float,
    score_col: str = "score",
    id_col: str = "doc_id",
    by: str | None = None,
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 1024,
) -> DataFrame:
    """Keep EXACTLY ceil(frac * n_group) top-score rows per `by` group —
    the classifier-filter step of a DCLM/FineWeb-style pipeline ("keep
    the top 25% by quality score per language"), deterministic under ties
    via the (score DESC, md5(id), id) total order. `by=None` pools the
    corpus into one group. Returns the kept input rows unchanged.

    100 TB shape — the naive form is a row_number window per group,
    which funnels an entire language through ONE window partition.
    Instead, the same HISTOGRAM-PREFIX CUT idiom as
    sample_to_token_budget: (1) one partial-aggregated pass counts rows
    per (group, score-bin) over `bins` fixed-width bins on [lo, hi]
    (scores clamped; bin(x) is monotone in x, so bin order == score
    order across bins); the bins*|groups| summary collects to the driver
    (bounded — `by` cardinality must be modest, same contract as the
    sampler), (2) the driver walks each group's bins in DESCENDING score
    order to find the fully-kept bins and the threshold bin's remaining
    quota, (3) fully-kept bins pass via a broadcast semi-join; ONLY the
    threshold bin (1/bins of one group) runs a row_number window ordered
    by (true score DESC NULLS LAST, md5(id), id). Row-identical to the
    one-window form by construction — that form IS the DuckDB oracle.

    Cross-engine note: keep_n = ceil(frac * n) is IEEE-double arithmetic
    on both sides; use binary-exact fractions (0.25, 0.5, 0.125) when a
    SQL mirror must agree at group sizes where frac*n lands on an
    integer. NULL scores sort last (dropped first)."""
    gkey = (
        F.when(F.col(by).isNull(), F.lit("\x00null")).otherwise(
            F.concat(F.lit("v:"), F.col(by).cast("string"))
        )
        if by is not None
        else F.lit("all")
    )
    span = float(hi) - float(lo)
    clamped = F.least(
        F.greatest(F.coalesce(F.col(score_col), F.lit(float(lo))), F.lit(float(lo))),
        F.lit(float(hi)),
    )
    bin_col = F.least(
        F.floor((clamped - F.lit(float(lo))) / F.lit(span) * bins),
        F.lit(bins - 1),
    ).cast("int")
    base = (
        df.withColumn("_g", gkey)
        .withColumn(
            "_key", F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
        )
        .withColumn("_bin", bin_col)
    )
    spark = df.sparkSession

    import math as _math

    sums = base.groupBy("_g", "_bin").count().collect()
    per_group: dict = {}
    for r in sums:
        per_group.setdefault(r["_g"], []).append((r["_bin"], r["count"]))
    full_rows, cut_rows = [], []
    for g, bs in per_group.items():
        n = sum(c for _, c in bs)
        keep_n = min(n, _math.ceil(frac * n))
        cum = 0
        for b, c in sorted(bs, reverse=True):  # descending score bins
            if cum + c <= keep_n:
                full_rows.append((g, b))
                cum += c
                if cum == keep_n:
                    break
            else:
                if keep_n - cum > 0:
                    cut_rows.append((g, b, keep_n - cum))
                break  # lower bins are all dropped

    full = spark.createDataFrame(full_rows, "_g string, _bin int")
    kept_full = base.join(F.broadcast(full), ["_g", "_bin"], "left_semi")
    cut = spark.createDataFrame(cut_rows, "_g string, _bin int, _quota long")
    w = Window.partitionBy("_g", "_bin").orderBy(
        F.col(score_col).desc_nulls_last(), F.col("_key").asc(), F.col(id_col).asc()
    )
    kept_cut = (
        base.join(F.broadcast(cut), ["_g", "_bin"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_quota", "_rn")
    )
    return kept_full.unionByName(kept_cut).drop("_g", "_key", "_bin")


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment: `split` column from the
    md5 of (salt || id) mapped to [0, 1) and bucketed by cumulative
    fraction — the standard leakage-safe holdout split (an id always
    lands in the same split, across runs AND across machines; salt
    rotates the assignment). Zero shuffle, zero state: one projection,
    whole-stage codegen. Fractions must sum to <= 1.0; ids falling past
    the last cumulative bound get the LAST split name (so {'train': .9,
    'val': .1} is exhaustive by construction).

    u = first 13 md5 hex chars / 16^13 — 52 bits of the hash, exactly
    representable in a double, engine-portable (the DuckDB oracle
    computes the identical u)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    key = F.md5(
        F.encode(
            F.concat(F.lit(salt), F.col(id_col).cast("string")), "UTF-8"
        )
    )
    u = F.conv(F.substring(key, 1, 13), 16, 10).cast("double") / F.lit(
        float(16**13)
    )
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        branch = u < F.lit(cum)
        expr = (
            F.when(branch, F.lit(name))
            if expr is None
            else expr.when(branch, F.lit(name))
        )
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def score_buckets(
    df: DataFrame,
    fractions: list[tuple[str, float]] | tuple[tuple[str, float], ...] = (
        ("head", 0.25),
        ("middle", 0.25),
        ("tail", 0.5),
    ),
    score_col: str = "ppl",
    id_col: str = "doc_id",
    by: str | None = "lang",
    ascending: bool = True,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 1024,
) -> DataFrame:
    """CCNet-style score bucketing: label every row `head` / `middle` /
    `tail` by its EXACT per-group rank position — within each `by`
    group, rows ordered by (score asc if `ascending` else desc,
    md5(id), id) fall into buckets at cumulative boundaries
    ceil(cumfrac_i * n_group) (CCNet, Wenzek et al. 2020 §4.4: corpora
    partitioned by per-language perplexity terciles; the head feeds
    training, the tail feeds filtering studies). The last bucket absorbs
    any remainder, so labels are exhaustive. Adds a `bucket` column;
    rows/columns otherwise unchanged. NULL scores order LAST within the
    group (worst under ascending=lower-is-better).

    100 TB shape — the naive form is one rank window per group, which
    funnels an entire language through ONE task; instead the same
    HISTOGRAM-PREFIX CUT idiom as its siblings above: (1) one
    partial-aggregated count per (group, score-bin) collects a bounded
    bins x |groups| summary to the driver, (2) the driver walks bins in
    score order accumulating counts against the bucket boundaries —
    bins entirely inside one bucket label via a tiny broadcast map,
    (3) ONLY the <= len(fractions)-1 boundary-straddling bins per group
    run a rank window (each 1/bins of one group), offset by the bin's
    known starting rank. Row-identical to the one-window form by
    construction (that form is the DuckDB oracle).

    Cross-engine note: boundaries are ceil(cumfrac * n) in IEEE doubles
    with cumfrac the PYTHON running sum of the given fractions — a SQL
    mirror must use those exact cumulative literals (0.25 + 0.25 is
    exact; thirds are not — prefer binary-exact fractions when parity
    at boundary group sizes matters)."""
    import math as _math

    names = [n for n, _ in fractions]
    fracs = [f for _, f in fractions]
    if len(names) < 2:
        raise ValueError("need >= 2 buckets")
    if sum(fracs) > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {sum(fracs)} > 1")
    gkey = (
        F.when(F.col(by).isNull(), F.lit("\x00null")).otherwise(
            F.concat(F.lit("v:"), F.col(by).cast("string"))
        )
        if by is not None
        else F.lit("all")
    )
    span = float(hi) - float(lo)
    clamped = F.least(
        F.greatest(F.coalesce(F.col(score_col), F.lit(float(hi if ascending else lo))), F.lit(float(lo))),
        F.lit(float(hi)),
    )
    bin_col = F.least(
        F.floor((clamped - F.lit(float(lo))) / F.lit(span) * bins),
        F.lit(bins - 1),
    ).cast("int")
    base = (
        df.withColumn("_g", gkey)
        .withColumn("_key", F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")))
        .withColumn("_bin", bin_col)
        .withColumn("_null_s", F.col(score_col).isNull())
    )
    spark = df.sparkSession

    # NULL scores rank after every real score in the group regardless of
    # direction, so they count as a virtual bin past the end.
    sums = base.groupBy("_g", "_bin", "_null_s").count().collect()
    per_group: dict = {}
    for r in sums:
        b = bins if r["_null_s"] else r["_bin"]
        per_group.setdefault(r["_g"], {})
        per_group[r["_g"]][b] = per_group[r["_g"]].get(b, 0) + r["count"]
    whole_rows, cut_rows = [], []  # (_g,_bin,label) / (_g,_bin,start_rank)
    for g, bcounts in per_group.items():
        n = sum(bcounts.values())
        cumfrac, bounds = 0.0, []
        for f in fracs[:-1]:
            cumfrac += f
            bounds.append(min(n, _math.ceil(cumfrac * n)))
        bounds.append(n)  # last bucket absorbs the remainder
        order = sorted(bcounts, reverse=not ascending)
        if not ascending and bins in bcounts:
            # virtual NULL bin still ranks last under descending order
            order = [b for b in order if b != bins] + [bins]
        rank = 0  # rows ranked before this bin
        for b in order:
            c = bcounts[b]
            lo_i = next(i for i, k in enumerate(bounds) if rank < k or k == n)
            hi_i = next(i for i, k in enumerate(bounds) if rank + c <= k or k == n)
            if lo_i == hi_i:
                whole_rows.append((g, b, names[lo_i]))
            else:
                cut_rows.append((g, b, rank))
            rank += c
    # map the virtual NULL bin back to a joinable key
    nb = F.when(F.col("_null_s"), F.lit(bins)).otherwise(F.col("_bin"))
    base = base.withColumn("_jbin", nb)
    whole = spark.createDataFrame(whole_rows, "_g string, _jbin int, bucket string")
    labeled_whole = base.join(F.broadcast(whole), ["_g", "_jbin"], "inner")
    if cut_rows:
        cut = spark.createDataFrame(cut_rows, "_g string, _jbin int, _start long")
        sort_score = (
            F.col(score_col).asc_nulls_last()
            if ascending
            else F.col(score_col).desc_nulls_last()
        )
        w = Window.partitionBy("_g", "_jbin").orderBy(
            sort_score, F.col("_key").asc(), F.col(id_col).asc()
        )
        # driver-computed (group -> boundary list) shipped as a literal
        # map; boundary bins are few, the lookup is tiny
        bound_items = []
        for g, bcounts in per_group.items():
            n = sum(bcounts.values())
            cumfrac = 0.0
            bs = []
            for f in fracs[:-1]:
                cumfrac += f
                bs.append(min(n, _math.ceil(cumfrac * n)))
            bs.append(n)
            bound_items.append((g, bs))
        bmap = F.map_from_arrays(
            F.array(*[F.lit(g) for g, _ in bound_items]),
            F.array(
                *[
                    F.array(*[F.lit(int(k)) for k in bs])
                    for _, bs in bound_items
                ]
            ),
        )
        # the window rank lands in its own projection FIRST (a window
        # function can't nest inside the HOF lambda below), then the
        # label is picked by counting bucket boundaries below the rank
        lbls = F.array(*[F.lit(nm) for nm in names])
        pick = F.try_element_at(
            lbls,
            (
                F.size(
                    F.filter(
                        F.try_element_at(bmap, F.col("_g")),
                        lambda k: k < F.col("_rnk"),
                    )
                )
                + F.lit(1)
            ).cast("int"),
        )
        labeled_cut = (
            base.join(F.broadcast(cut), ["_g", "_jbin"], "inner")
            .withColumn("_rnk", F.col("_start") + F.row_number().over(w))
            .withColumn("bucket", pick)
            .drop("_start", "_rnk")
        )
        out = labeled_whole.unionByName(labeled_cut)
    else:
        out = labeled_whole
    return out.drop("_g", "_key", "_bin", "_jbin", "_null_s")


def gumbel_weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "gumbel",
    key_col: str | None = None,
) -> DataFrame:
    """Sample exactly k rows WITHOUT replacement with probability
    proportional to exp(weight / temperature) — the Gumbel-top-k trick
    (Vieira 2014; Kool et al. 2019), and the sampling step of DSIR (Xie
    et al. 2023) that importance-RESAMPLES rather than top-k-truncates.
    No reference analog (QualityControl.py:2104-2130 samples uniformly
    via df.sample).

    Deterministic and engine-portable: the per-row uniform is
    u = (first 13 md5 hex chars of salt||id + 0.5) / 2^52 — the
    hash_split trick, +0.5 keeping u strictly inside (0, 1) while
    staying double-exact — and the perturbed key is
    weight/temperature - ln(-ln(u)). Same (salt, id, weight) always
    draws the same sample, across runs, machines, and the DuckDB
    oracle; rotating `salt` redraws.

    100 TB shape: one zero-shuffle projection computes the key, then
    global top-k lowers to TakeOrderedAndProject — each partition keeps
    its local top k and only k rows per partition reach the driver-side
    merge; no full sort, no exchange of the corpus. k is assumed
    driver-sized (a sample, not a partition of the corpus — use
    top_fraction_by_score for constant-fraction cuts).

    NULL weights are excluded (a NULL perturbed key cannot be ranked);
    ties (2^-52 events) break by id for a total order. Set `key_col`
    to also keep the perturbed key."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = F.md5(
        F.encode(
            F.concat(F.lit(salt), F.col(id_col).cast("string")), "UTF-8"
        )
    )
    u = (
        F.conv(F.substring(key, 1, 13), 16, 10).cast("double") + F.lit(0.5)
    ) / F.lit(float(16**13))
    gumbel = -F.log(-F.log(u))
    perturbed = F.col(weight_col).cast("double") / F.lit(
        float(temperature)
    ) + gumbel
    out = (
        df.filter(F.col(weight_col).isNotNull())
        .withColumn("_gk", perturbed)
        .orderBy(F.col("_gk").desc(), F.col(id_col).asc())
        .limit(k)
    )
    if key_col is not None:
        return out.withColumnRenamed("_gk", key_col)
    return out.drop("_gk")


def cap_per_group(
    df: DataFrame,
    max_rows: int,
    by: str = "domain",
    id_col: str = "url",
) -> DataFrame:
    """Keep at most `max_rows` rows per `by` group, deterministically —
    the FineWeb-style per-domain output cap (no single host may dominate
    the corpus regardless of how many of its pages pass quality).

    Row selection order is (md5(id), id) — the same stable pseudo-random
    order every sampler in this module uses, so the kept subset is
    reproducible across runs and engines. NULL group values form their
    own capped group.

    100 TB shape: a thin wrapper over sample_to_token_budget with a
    constant per-row cost of 1 — budget == row count — inheriting its
    distributed prefix-sum cut: per-(group, 256-bucket) partial counts,
    a tiny driver prefix, and a row_number window over ONLY the cutoff
    bucket (~1/256 of one group). The naive row_number-per-group window
    would funnel every hot domain through one task; this never windows
    more than the boundary bucket."""
    return sample_to_token_budget(
        df, max_rows, id_col=id_col, by=by, token_expr=F.lit(1)
    ).drop("n_tokens")


def sample_to_mixture(
    df: DataFrame,
    proportions: dict,
    by: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    token_expr=None,
    total_tokens: int | None = None,
) -> DataFrame:
    """Compose a corpus matching target per-group TOKEN proportions —
    the mixture-weights step of training-set assembly ("50% en, 25% de,
    25% fr"): per-group quotas quota_g = floor(frac_g * T), each applied
    as the deterministic (md5(id), id)-ordered prefix cut.

    T = `total_tokens` when given; otherwise the LARGEST feasible total,
    T = min over target groups of available_g / frac_g — the binding
    group is taken whole, every other group downsamples to proportion.
    Groups absent from `proportions` are dropped. Returns the kept rows
    plus n_tokens.

    Cross-engine note (same as hash_split): use binary-exact fractions
    (0.5, 0.25, 0.125) so the SQL mirror's division/floor arithmetic is
    the identical IEEE sequence — avail/frac, min, frac*T, floor are all
    single double ops with no accumulation-order freedom.

    100 TB shape: ONE partial-aggregated per-group token sum (driver
    summary = |groups| rows) to size the quotas, then the sampler's
    histogram-prefix cut per group — never a whole-group window."""
    import math

    toks = (
        token_expr
        if token_expr is not None
        else T.token_count_pretokens(F.col(text_col))
    )
    in_groups = [g for g in proportions if g is not None]
    member = F.col(by).isin(*in_groups) if in_groups else F.lit(False)
    if None in proportions:
        member = member | F.col(by).isNull()
    filtered = df.filter(member)
    if total_tokens is None:
        avail_rows = (
            filtered.groupBy(by)
            .agg(F.sum(F.coalesce(toks.cast("long"), F.lit(0))).alias("_a"))
            .collect()
        )
        avail = {r[by]: r["_a"] for r in avail_rows}
        # a requested group with frac > 0 but NO rows makes the target
        # proportions unsatisfiable (T = avail_g/frac_g = 0); raise
        # rather than silently recomputing T from the remaining groups
        # and emitting a corpus that violates the requested mixture
        # (the usual cause is a typo'd group key)
        empty = [
            g for g, frac in proportions.items() if frac > 0 and g not in avail
        ]
        if empty:
            raise ValueError(
                f"proportions groups {empty!r} have no rows in the corpus "
                f"(available groups: {sorted(map(repr, avail))}); the "
                "requested mixture is unsatisfiable — fix the key or pass "
                "an explicit total_tokens"
            )
        feasible = [
            avail[g] / frac for g, frac in proportions.items() if frac > 0
        ]
        t_total = min(feasible) if feasible else 0.0
    else:
        t_total = float(total_tokens)
    quotas = {
        g: int(math.floor(frac * t_total)) for g, frac in proportions.items()
    }
    return sample_to_token_budget(
        filtered,
        quotas,
        text_col=text_col,
        id_col=id_col,
        by=by,
        token_expr=token_expr,
    )
