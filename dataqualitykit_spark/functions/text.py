"""Native column-algebra text metrics — the whole-stage-codegen hot path.

Every function here returns a pyspark Column built ONLY from built-in
`pyspark.sql.functions` (no Python on executors), and each is the exact
JVM mirror of a pure-Python function in ``dataqualitykit_spark.semantics``
(asserted by tests/test_text_metrics.py on adversarial inputs).

Re-imagines the reference's per-column checks (NullValues QualityControl.py:16-69,
RangeValidity :642-1051) as vectorized flag/metric columns over web text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import MISSING_TOKENS, WS_CHARS, WS_REGEX
from ..semantics import BOILERPLATE_MARKERS, LANG_PROFILES, STOPWORDS_EN

# Java regex: ASCII \s semantics pinned by the explicit class (config.WS_REGEX)
_SYMBOL_REGEX = r"[^A-Za-z0-9 \t\n\r\x0b\f]"


def is_missing(col: Column) -> Column:
    """Reference missing predicate (QualityControl.py:53-57): NULL, '',
    whitespace-only, or a literal missing token."""
    return (
        col.isNull()
        | (F.btrim(col, F.lit(WS_CHARS)) == F.lit(""))
        | col.isin(*MISSING_TOKENS)
    )


def words(col: Column) -> Column:
    """ASCII-whitespace tokens, empties removed — mirrors semantics.tokenize."""
    return F.filter(F.split(col, WS_REGEX), lambda w: w != F.lit(""))


def word_count(col: Column) -> Column:
    return F.size(words(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def mean_word_length(col: Column) -> Column:
    """Average token length; 0.0 for token-less text."""
    w = words(col)
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        / F.size(w)
    )


def symbol_count(col: Column) -> Column:
    """Chars outside [A-Za-z0-9 + ASCII whitespace].

    Computed as length minus length-after-removal: regexp_count compiles to
    size(regexp_extract_all(...)) in Spark 4, which materializes an array
    of every match per document — measured as a dominant cost in the
    metric projection. The class matches single chars, so chars-removed ==
    match count, with no allocation."""
    return F.length(col) - F.length(F.regexp_replace(col, _SYMBOL_REGEX, ""))


def symbol_ratio(col: Column) -> Column:
    return symbol_count(col) / F.greatest(F.length(col), F.lit(1))


def stopword_hits(col: Column, lang: str = "en") -> Column:
    """Count of tokens whose lowercase form is in the language's stopword set."""
    sw = sorted(LANG_PROFILES.get(lang, STOPWORDS_EN))
    return F.size(F.filter(words(col), lambda w: F.lower(w).isin(*sw)))


def stopword_density(col: Column, lang: str = "en") -> Column:
    return stopword_hits(col, lang) / F.greatest(word_count(col), F.lit(1))


def nonempty_lines(col: Column) -> Column:
    return F.filter(
        F.split(col, r"\n"),
        lambda ln: F.btrim(ln, F.lit(WS_CHARS)) != F.lit(""),
    )


def line_count(col: Column) -> Column:
    return F.size(nonempty_lines(col))


def distinct_line_count(col: Column) -> Column:
    return F.size(F.array_distinct(nonempty_lines(col)))


def distinct_line_ratio(col: Column) -> Column:
    """distinct non-empty lines / non-empty lines; 1.0 when no lines."""
    n = line_count(col)
    return F.when(n == 0, F.lit(1.0)).otherwise(
        distinct_line_count(col) / n.cast("double")
    )


def boilerplate_hits(col: Column) -> Column:
    """How many distinct boilerplate markers the lowercased text contains."""
    low = F.lower(col)
    hit = None
    for marker in BOILERPLATE_MARKERS:
        term = F.when(low.contains(F.lit(marker)), F.lit(1)).otherwise(F.lit(0))
        hit = term if hit is None else hit + term
    return hit


def content_hash(col: Column) -> Column:
    """md5 hex of utf-8 bytes — matches semantics.content_hash and DuckDB md5()."""
    return F.md5(F.encode(col, "UTF-8"))


def html_to_text(col: Column) -> Column:
    """Extract visible text from an HTML string column — the `html:binary`
    input column's decode step (BASELINE.json input_hint; decode binary
    with F.decode(col, 'UTF-8') first). Column twin of
    semantics.html_to_text: same regex chain (script/style/comment strip,
    block tags to newlines, tag strip, literal entity bank, whitespace
    normalization), all native regexp_replace — no UDF, no shuffle."""
    from ..semantics import HTML_ENTITIES, HTML_STRIP_STEPS, HTML_WS_STEPS

    out = col
    for pat, repl in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    for pat, repl in HTML_WS_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


# robots meta exclusion: <meta name="robots" content="... noindex ...">
# in either attribute order, quotes optional, case-insensitive. Shared
# verbatim with the DuckDB oracle (inline (?i) works in Java regex AND
# RE2); X-Robots-Tag response headers are out of scope (no header column
# in the input contract).
ROBOTS_NOINDEX_PATTERNS = (
    r"""(?i)<meta[^>]*name\s*=\s*["']?robots["']?[^>]*content\s*=\s*["'][^"']*noindex""",
    r"""(?i)<meta[^>]*content\s*=\s*["'][^"']*noindex[^"']*["'][^>]*name\s*=\s*["']?robots""",
)


def has_noindex(html: Column) -> Column:
    """True when the page's robots meta declares noindex — the standard
    crawl-pipeline exclusion (the site explicitly opted out of indexing;
    respecting it is table stakes for a training corpus). Pure regexp
    projection over the raw html string; NULL-safe False. Apply at
    extraction time, BEFORE html_to_text drops the markup — the labeled
    pipeline input (url, text, lang) no longer carries the meta tags."""
    hit = F.lit(False)
    for pat in ROBOTS_NOINDEX_PATTERNS:
        hit = hit | html.rlike(pat)
    return F.coalesce(hit, F.lit(False))


def domain_of(url: Column) -> Column:
    """scheme://HOST/... -> host (lowercased); '' when no authority part."""
    from ..semantics import URL_DOMAIN_REGEX

    return F.lower(F.regexp_extract(url, URL_DOMAIN_REGEX, 1))


# BPE-ish pre-tokenizer (GPT-2 style, simplified to RE2/Java-portable form):
# contractions, letter runs, digit runs, punctuation runs, whitespace runs.
BPE_TOKEN_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\x0b\f]+"


def token_count_pretokens(col: Column) -> Column:
    """Cheap token ESTIMATE: matches of the BPE-ish pre-tokenizer regex
    (whitespace-run tokens excluded, like GPT-2 pretokenization). One
    regex pass — use for filtering thresholds; token_count_bpe for budgets."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_REGEX))


def token_count_bpe(col: Column) -> Column:
    """REAL byte-pair-encoding token count: the learned merge table
    (semantics.BPE_MERGES, trained at import on the embedded corpus) is
    applied in rank order as a chain of literal JVM string replaces over
    the marker representation — no UDF, whole-stage codegen friendly,
    value-identical to semantics.bpe_token_count and the DuckDB oracle.

    ~130 sequential replace passes per row: fine for token BUDGETING runs;
    the one-regex-pass token_count_pretokens estimate is the cheap path
    for keep/drop thresholds."""
    from ..semantics import (
        _BPE_C,
        _BPE_P,
        _BPE_U,
        BPE_PRETOKEN_REGEX,
        bpe_merge_patterns,
    )

    pres = F.regexp_extract_all(F.lower(col), F.lit(BPE_PRETOKEN_REGEX), 0)
    units = F.transform(
        pres,
        lambda p: F.array_join(
            F.transform(
                F.regexp_extract_all(p, F.lit("."), 0),
                lambda c: F.concat(F.lit(_BPE_U), c, F.lit(_BPE_C)),
            ),
            "",
        ),
    )
    s = F.array_join(units, _BPE_P)
    for find, repl in bpe_merge_patterns():
        s = F.replace(s, F.lit(find), F.lit(repl))
    return (F.length(s) - F.length(F.replace(s, F.lit(_BPE_U), F.lit("")))).cast(
        "int"
    )


# --------------------------------------------------------------------------
# URL canonicalization (web-pipeline op: normalize BEFORE the url-dedup
# window so trivially-different mirrors collapse). Pattern text shared via
# semantics.py with the python mirror and the generated DuckDB oracle SQL.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# Link density (jusText / boilerplate heuristic, Pomikálek 2011): the
# fraction of a page's visible characters that sit inside <a> anchors.
# Navigation / link-farm pages score near 1.0, prose near 0.0 — a standard
# extraction-time keep/drop signal. Like has_noindex this runs over the RAW
# html BEFORE html_to_text drops the markup (the pipeline's labeled input
# (url, text, lang) no longer carries the anchors).
# --------------------------------------------------------------------------

# group 2 = anchor inner html. (?is): case-insensitive + dot-matches-newline
# — both flags carry identical semantics in Java regex and RE2, so the
# DuckDB oracle runs the SAME pattern text. `(\s[^>]*)?` (not `[^>]*`)
# so <a> with no attributes matches without eating its closing '>'. Lazy
# (.*?) stops at the FIRST </a> in both engines; an unclosed <a> therefore
# contributes nothing on either side.
ANCHOR_INNER_REGEX = r"(?is)<a(\s[^>]*)?>(.*?)</a>"
# tag stripper shared by both legs; '(?s)' so multi-line tags still strip
TAG_STRIP_REGEX = r"(?s)<[^>]*>"


def visible_char_count(html: Column) -> Column:
    """Characters left after stripping every <...> tag (whitespace kept —
    identical convention on both sides of the oracle)."""
    return F.length(F.regexp_replace(html, TAG_STRIP_REGEX, ""))


def anchor_char_count(html: Column) -> Column:
    """Total characters of anchor inner text (nested tags stripped) across
    every closed <a>...</a> on the page; 0 when anchor-free."""
    inner = F.regexp_extract_all(html, F.lit(ANCHOR_INNER_REGEX), F.lit(2))
    return F.aggregate(
        F.transform(
            inner, lambda m: F.length(F.regexp_replace(m, TAG_STRIP_REGEX, ""))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def link_density(html: Column) -> Column:
    """anchor-text chars / visible chars over raw html; NULL when the page
    has no visible characters (or NULL html — rlike/regexp null-propagate).

    100 TB shape: a pure projection (two regex passes over the page
    bytes), zero shuffle, whole-stage codegen. The anchor array is the
    transform's INPUT (evaluated once), not an outer-scope reference
    inside the lambda — so the measured HOF re-evaluation trap
    (PLANS.md round 5) does not apply here."""
    anchor_chars = anchor_char_count(html)
    visible = visible_char_count(html)
    return F.when(
        visible > 0, anchor_chars.cast("double") / visible.cast("double")
    ).otherwise(F.lit(None).cast("double"))


def normalize_url(col: Column) -> Column:
    """Column twin of semantics.normalize_url (same pattern constants,
    Java $-backreference dialect)."""
    from ..semantics import (
        URL_DANGLING_REGEX,
        URL_FRAGMENT_REGEX,
        URL_HEAD_REGEX,
        URL_TRACKING_REGEXES,
        URL_TRAILING_SLASH_REGEX,
    )

    head = F.regexp_extract(col, URL_HEAD_REGEX, 0)
    rest = col.substr(F.length(head) + 1, F.length(col))
    u = F.concat(F.lower(head), rest)
    u = F.regexp_replace(u, URL_FRAGMENT_REGEX, "")
    for pat, repl in URL_TRACKING_REGEXES:
        u = F.regexp_replace(u, pat, repl)
    u = F.regexp_replace(u, URL_DANGLING_REGEX, "")
    u = F.regexp_replace(u, URL_TRAILING_SLASH_REGEX, "$1")
    return u
