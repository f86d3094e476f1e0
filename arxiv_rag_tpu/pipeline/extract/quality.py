"""Extraction quality scoring + validation.

Keeps the reference's *objective* — a 0..1 score used to pick the best
extraction strategy and to gate downstream stages — with the same
signal families as ``pdf_extractor.py:7595-7770`` (chars/page density
vs the ~2,500 expectation at :7618, word-ratio, garbage-character rate,
structure hints) and the validator severity model of
``pdf_extractor.py:7397-7455`` / ``extraction_improver.py:332-420``.
The implementation is fresh and much smaller: one pass of counters over
the text, no regex army.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

EXPECTED_CHARS_PER_PAGE = 2500.0  # reference: pdf_extractor.py:7618

_WORD_RE = re.compile(r"[A-Za-z]{2,}")
_COMMON_WORDS = frozenset(
    "the of and to in a is that for we with as on this by are be it from"
    " an our which can at or has not have model all results using data"
    " method section figure table between where these both than each".split()
)


@dataclass
class QualityReport:
    score: float
    chars_per_page: float
    word_ratio: float
    garbage_ratio: float
    ascii_ratio: float
    common_word_hits: int
    issues: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.score >= 0.5 and not any(i.startswith("critical:") for i in self.issues)


def score_text(text: str, num_pages: int = 1) -> QualityReport:
    """0..1 quality score for an extraction candidate."""
    n = len(text)
    num_pages = max(1, num_pages)
    if n == 0:
        return QualityReport(0.0, 0.0, 0.0, 1.0, 0.0, 0, ["critical:empty"])

    # single pass counters
    letters = digits = spaces = garbage = ascii_printable = 0
    replacement = 0
    for ch in text:
        o = ord(ch)
        if ch.isalpha():
            letters += 1
        elif ch.isdigit():
            digits += 1
        elif ch.isspace():
            spaces += 1
        if 0x20 <= o < 0x7F:
            ascii_printable += 1
        if o == 0xFFFD:
            replacement += 1
            garbage += 1
        elif o < 0x20 and ch not in "\n\t\r":
            garbage += 1
        elif 0xE000 <= o <= 0xF8FF:  # private use area = failed glyph map
            garbage += 1

    words = _WORD_RE.findall(text[:20000])
    lowered = [w.lower() for w in words[:4000]]
    common_hits = sum(1 for w in lowered if w in _COMMON_WORDS)

    chars_per_page = n / num_pages
    word_chars = sum(len(w) for w in words)
    sample_len = min(n, 20000)
    word_ratio = word_chars / max(1, sample_len)
    garbage_ratio = garbage / n
    ascii_ratio = ascii_printable / n

    # component scores
    density = min(1.0, chars_per_page / EXPECTED_CHARS_PER_PAGE)
    # below ~200 chars/page is almost certainly a failed extraction
    if chars_per_page < 200:
        density *= 0.3
    wordiness = min(1.0, word_ratio / 0.6)
    cleanliness = max(0.0, 1.0 - garbage_ratio * 20.0)
    # real English text has common words; formula-only garbage doesn't
    commonness = min(1.0, common_hits / max(8.0, len(lowered) * 0.08)) if lowered else 0.0

    score = 0.35 * density + 0.25 * wordiness + 0.25 * cleanliness + 0.15 * commonness
    # heavy garbage gates the whole score, not just its component
    if garbage_ratio > 0.02:
        score *= max(0.0, 1.0 - garbage_ratio * 4.0)

    issues: list[str] = []
    if chars_per_page < 100:
        issues.append("critical:too_little_text")
    if garbage_ratio > 0.10:
        issues.append("critical:garbage_text")
    elif garbage_ratio > 0.02:
        issues.append("warning:some_garbage")
    if word_ratio < 0.2:
        issues.append("warning:low_word_ratio")
    if replacement > n * 0.01:
        issues.append("warning:replacement_chars")
    return QualityReport(
        score=max(0.0, min(1.0, score)),
        chars_per_page=chars_per_page,
        word_ratio=word_ratio,
        garbage_ratio=garbage_ratio,
        ascii_ratio=ascii_ratio,
        common_word_hits=common_hits,
        issues=issues,
    )


@dataclass
class ValidationResult:
    valid: bool
    severity: str  # ok | warning | error
    issues: list[str]


def validate_extraction(
    pages: list[str],
    min_quality: float = 0.5,
    min_chars_per_page: float = 200.0,
    max_empty_page_frac: float = 0.3,
) -> ValidationResult:
    """Document-level validation (reference: QualityValidator,
    ``extraction_improver.py:546-665`` — thresholds relaxed to realistic
    levels; the reference's 0.95 gate rejected most real papers)."""
    issues: list[str] = []
    if not pages:
        return ValidationResult(False, "error", ["no pages extracted"])
    text = "\n".join(pages)
    rep = score_text(text, num_pages=len(pages))
    empty = sum(1 for p in pages if len(p.strip()) < 20)
    if rep.score < min_quality:
        issues.append(f"quality {rep.score:.2f} < {min_quality}")
    if rep.chars_per_page < min_chars_per_page:
        issues.append(f"chars/page {rep.chars_per_page:.0f} < {min_chars_per_page:.0f}")
    if empty / len(pages) > max_empty_page_frac:
        issues.append(f"{empty}/{len(pages)} pages empty")
    severity = "ok" if not issues else ("warning" if rep.score >= 0.35 else "error")
    return ValidationResult(not issues, severity, issues)
