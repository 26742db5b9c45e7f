"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1).

Schema matches BASELINE.json input_hint exactly:
(url string, warc_ts timestamp, html binary, text string, lang string).

Every row is a pure function of (seed, row index): class assignment comes
from md5(url) so it is reproducible from the key alone, and content comes
from random.Random(md5(url)) — no global RNG state, no ordering
dependence. One hot domain takes ~30% of rows (skew exercise); ~3% of urls
get a second crawl snapshot (url-dedup exercise); one class repeats a
canonical text under many urls (content-dedup exercise).
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

from ..semantics import (
    BOILERPLATE_MARKERS,
    MOJIBAKE_MAP,
    STOPWORDS_DE,
    STOPWORDS_EN,
    _TRAIN_TEXT,
)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_CONTENT_WORDS = sorted(set(_TRAIN_TEXT.split()))
_STOP_EN = sorted(STOPWORDS_EN)
_STOP_DE = sorted(STOPWORDS_DE)
_DE_WORDS = sorted(
    "haus wasser himmel stadt land jahr zeit mensch kind arbeit leben welt "
    "tag nacht weg berg fluss wald feld garten schule buch sprache".split()
)
_RU_WORDS = sorted(
    "дом вода небо город страна год время человек работа жизнь мир день "
    "ночь дорога гора река лес поле сад школа книга язык слово рука".split()
)

_DOMAINS = (
    ["hot-domain.example"] * 30
    + ["medium-a.example"] * 10
    + ["medium-b.example"] * 8
    + [f"tail-{i}.example" for i in range(52)]
)

_CLASSES = (
    ["clean"] * 31
    + ["near_dup"] * 4
    + ["missing"] * 6
    + ["short"] * 5
    + ["long_symbols"] * 5
    + ["repeated_lines"] * 5
    + ["boilerplate"] * 5
    + ["keyword_stuffing"] * 5
    + ["gibberish"] * 5
    + ["wrong_lang"] * 6
    + ["pii"] * 6
    + ["toxic"] * 4
    + ["mojibake"] * 4
    + ["dupe_content"] * 4
    + ["tiny_words"] * 5
)
assert len(_CLASSES) == 100

_BASE_TS = datetime(2024, 1, 1)

# near-dup cluster: every row is this base with its last 3 words swapped —
# word-3-shingle Jaccard vs base ~0.95, well above the 0.8 LSH threshold,
# while each row stays a distinct exact-hash document
_ND_RNG = random.Random(1234)
_NEAR_DUP_BASE = " ".join(
    _ND_RNG.choice(_STOP_EN if i % 5 < 2 else _CONTENT_WORDS) for i in range(120)
)

_CANONICAL_DUP = (
    "this is the shared canonical page text that appears under many urls and "
    "it is long enough to pass all of the other quality rules because it has "
    "the usual english words with the normal mix of stopwords and it keeps a "
    "sensible length for each of the words it uses so that only the duplicate "
    "content rule can drop it from the corpus"
)


def _md5_int(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _english_sentence(rng: random.Random, n: int) -> str:
    words = []
    for _ in range(n):
        # ~40% stopwords: realistic density, passes stopword/lang/ppl rules
        pool = _STOP_EN if rng.random() < 0.4 else _CONTENT_WORDS
        words.append(rng.choice(pool))
    return " ".join(words)


def _german_sentence(rng: random.Random, n: int) -> str:
    words = []
    for _ in range(n):
        pool = _STOP_DE if rng.random() < 0.4 else _DE_WORDS
        words.append(rng.choice(pool))
    return " ".join(words)


def _make_text(cls: str, rng: random.Random) -> str | None:
    if cls == "clean":
        return _english_sentence(rng, rng.randint(60, 220))
    if cls == "missing":
        return rng.choice([None, "", "   ", "\t\n", "NA", "N/A", "null", "none"])
    if cls == "short":
        return _english_sentence(rng, rng.randint(1, 8))
    if cls == "long_symbols":
        base = _english_sentence(rng, 60)
        syms = " ".join("#$%&*!@^" for _ in range(80))
        return base + " " + syms
    if cls == "repeated_lines":
        line = _english_sentence(rng, 10)
        unique = [_english_sentence(rng, 10) for _ in range(3)]
        lines = [line] * 9 + unique
        rng.shuffle(lines)
        return "\n".join(lines)
    if cls == "boilerplate":
        base = _english_sentence(rng, 40)
        markers = rng.sample(BOILERPLATE_MARKERS, 3)
        return base + " " + " ".join(markers) + " " + _english_sentence(rng, 40)
    if cls == "keyword_stuffing":
        kw = rng.sample(_CONTENT_WORDS, 12)
        return " ".join(rng.choice(kw) for _ in range(120))
    if cls == "gibberish":
        # stopwords mixed in so ONLY the perplexity rule catches these
        letters = "qxzjvkwfyqxzjv"
        words = [
            rng.choice(_STOP_EN)
            if i % 5 == 0
            else "".join(rng.choice(letters) for _ in range(rng.randint(4, 11)))
            for i in range(90)
        ]
        return " ".join(words)
    if cls == "wrong_lang":
        # half German (stopword-profile leg), half Russian (script leg)
        if rng.random() < 0.5:
            return _german_sentence(rng, rng.randint(60, 150))
        return " ".join(rng.choice(_RU_WORDS) for _ in range(rng.randint(60, 150)))
    if cls == "pii":
        mid = (
            f"contact {rng.choice(['bob','sue','ana'])}@example.com or call "
            f"{rng.randint(200, 989)}-555-{rng.randint(1000, 9999)} from host "
            f"10.0.{rng.randint(0, 255)}.{rng.randint(1, 254)} ssn "
            f"{rng.randint(100, 899)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}"
        )
        return _english_sentence(rng, 60) + " " + mid + " " + _english_sentence(rng, 60)
    if cls == "toxic":
        tox = rng.choice(["darnit", "frick", "heck"])
        return _english_sentence(rng, 50) + f" {tox} " + _english_sentence(rng, 50)
    if cls == "mojibake":
        # inject the exact byte sequences the scrub bank repairs (shared
        # constants -- no literal mojibake that an editor could re-encode)
        caf = "caf" + MOJIBAKE_MAP[0][0]
        quote = MOJIBAKE_MAP[5][0]
        return (
            _english_sentence(rng, 50)
            + f" the {caf} was nice {quote} she said \x80 "
            + _english_sentence(rng, 50)
        )
    if cls == "dupe_content":
        return _CANONICAL_DUP
    if cls == "near_dup":
        words = _NEAR_DUP_BASE.split()
        words[-3:] = [rng.choice(_CONTENT_WORDS) for _ in range(3)]
        return " ".join(words)
    if cls == "tiny_words":
        return " ".join(rng.choice("a b c d e f g h i j".split()) for _ in range(80))
    raise ValueError(cls)


def generate_pages(n: int, seed: int = 42) -> list[dict]:
    """n base pages (plus ~3% second-snapshot rows), fully deterministic."""
    rows: list[dict] = []
    for i in range(n):
        key = f"{seed}:{i}"
        h = _md5_int(key)
        domain = _DOMAINS[h % len(_DOMAINS)]
        url = f"https://{domain}/page/{seed}/{i}"
        uh = _md5_int(url)
        cls = _CLASSES[uh % 100]
        rng = random.Random(uh)
        text = _make_text(cls, rng)
        ts = _BASE_TS + timedelta(minutes=uh % 525_600)
        html = None
        if text is not None:
            html = b"<html><body>" + text.encode("utf-8", "replace") + b"</body></html>"
        claimed = "en" if cls != "wrong_lang" or rng.random() < 0.5 else "de"
        rows.append(
            {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": claimed}
        )
        if uh % 33 == 0:  # second crawl snapshot of the same url
            text2 = _make_text(cls, rng) if cls != "dupe_content" else text
            # half the snapshots arrive under a tracking-param url variant:
            # identical page under normalize_urls=True, a distinct document
            # otherwise (url-canonicalization exercise)
            url2 = url + "?utm_source=feed&gclid=x99" if uh % 2 == 0 else url
            rows.append(
                {
                    "url": url2,
                    "warc_ts": ts + timedelta(days=7),
                    "html": html,
                    "text": text2,
                    "lang": claimed,
                }
            )
    return rows


def pages_dataframe(spark, n: int, seed: int = 42):
    return spark.createDataFrame(generate_pages(n, seed), schema=PAGES_SCHEMA)
