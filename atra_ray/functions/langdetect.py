"""Language identification (SURVEY.md M17).

The reference uses whatlang over the document's text nodes
(atra/src/toolkit/language_detection.rs:97-253; ≤1 MB sample). whatlang is a
trigram classifier; no equivalent wheel ships in this environment, so we use
a deterministic function-word scorer over a fixed language set — the same
family of evidence, fully reproducible, and vectorizable. Returns ISO-639-3
codes like the reference's `isolang` mapping, or "und" when no evidence.

The sample cap (1 MB of text) matches language_detection.rs:103.
"""

from __future__ import annotations

import re

__all__ = ["detect_language", "LANG_STOPWORDS"]

MAX_SAMPLE_CHARS = 1_000_000

# high-frequency function words per language (ISO-639-3 keys). Disjoint
# enough for a deterministic argmax on real prose; ties break by code order.
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "eng": frozenset(
        "the and of to in is that it was for on are with as be at by this "
        "have from or had not but what all were when we there can an your "
        "which their said if will each about how them then she many some so".split()
    ),
    "deu": frozenset(
        "der die das und ist von zu mit den nicht sie ein eine auf für im "
        "dem des sich auch als an es nach wie bei aus um noch wird sind "
        "einer durch werden hat dass wenn aber wir mehr über".split()
    ),
    "fra": frozenset(
        "le la les de des un une et est dans que qui pour pas sur avec ne "
        "se ce il elle au aux par plus mais ou comme sont nous vous leur "
        "cette ses être fait tout été sans deux même".split()
    ),
    "spa": frozenset(
        "el la los las de del un una y es en que no se por con para su al "
        "lo como más pero sus le ya o este sí porque esta entre cuando muy "
        "sin sobre también hasta hay donde quien desde todo".split()
    ),
    "ita": frozenset(
        "il lo la gli le di che e è un una per non sono in con si da come "
        "ma anche più questo questa del della nel alla sono essere stato "
        "hanno molto quando dove perché tutti".split()
    ),
    "por": frozenset(
        "o os as de do da dos das um uma e é que não se em para com por "
        "mais mas como foi são tem seu sua ou ao pelo pela isso ele ela "
        "também já está entre depois sem mesmo".split()
    ),
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def detect_language(text: str | None) -> str:
    if not text:
        return "und"
    words = _WORD_RE.findall(text[:MAX_SAMPLE_CHARS].lower())
    if not words:
        return "und"
    best_lang, best_score = "und", 0
    for lang in sorted(LANG_STOPWORDS):
        score = sum(1 for w in words if w in LANG_STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang
