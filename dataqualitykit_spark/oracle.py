"""Slow, obviously-correct single-process oracle for the full pipeline.

Computes keep / drop_reason / scrubbed_text for a list of page dicts using
ONLY the shared semantics module — no Spark. The golden-fixture tests
(tests/test_pipeline_oracle.py) compare the Spark pipeline against this
row-for-row: keep/drop F1 (target 1.0) and byte-equal scrubbed text
(BASELINE.json correctness gates).

Dedup mirrors pipeline.with_dedup_flags exactly:
- url keep-most-recent, total order (warc_ts DESC, scrubbed ASC);
- content-hash keep-one among alive docs, order (url ASC, warc_ts ASC).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Any

from .config import DEFAULT_CONFIG, PipelineConfig
from .semantics import content_hash, doc_reasons

_EPOCH = datetime(1970, 1, 1)


@dataclass
class OracleRow:
    url: str
    warc_ts: datetime | None
    text: str | None
    scrubbed_text: str
    reasons: list[str]
    keep: bool = False
    drop_reason: str | None = None


def run_oracle(
    rows: list[dict[str, Any]], cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[OracleRow]:
    out: list[OracleRow] = []
    for r in rows:
        reasons, scrubbed = doc_reasons(r.get("text"), cfg)
        out.append(
            OracleRow(
                url=r["url"],
                warc_ts=r.get("warc_ts"),
                text=r.get("text"),
                scrubbed_text=scrubbed,
                reasons=list(reasons),
            )
        )

    # url keep-most-recent
    if cfg.dedup_url and any(r.warc_ts is not None for r in out):
        by_url: dict[str, list[OracleRow]] = {}
        for r in out:
            by_url.setdefault(r.url, []).append(r)
        for group in by_url.values():
            if len(group) > 1:
                group.sort(key=lambda r: ((r.warc_ts or _EPOCH),), reverse=True)
                # tie-break scrubbed ASC within equal ts (rare)
                group.sort(
                    key=lambda r: (-(r.warc_ts or _EPOCH).timestamp(), r.scrubbed_text)
                )
                for r in group[1:]:
                    r.reasons.append("dup_url")

    # content keep-one among alive docs
    if cfg.dedup_content:
        alive = [r for r in out if not r.reasons]
        alive.sort(key=lambda r: (r.url, (r.warc_ts or _EPOCH)))
        seen: set[str] = set()
        for r in alive:
            h = content_hash(r.scrubbed_text)
            if h in seen:
                r.reasons.append("dup_content")
            else:
                seen.add(h)

    for r in out:
        r.keep = not r.reasons
        r.drop_reason = r.reasons[0] if r.reasons else None
    return out
