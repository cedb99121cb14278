"""Language identification (SURVEY.md M17).

The reference uses whatlang over the document's text nodes
(atra/src/toolkit/language_detection.rs:97-253; ≤1 MB sample). whatlang
works in two stages — SCRIPT detection by Unicode ranges, then a
per-script classifier (trigram profiles for Latin/Cyrillic, direct mapping
for single-language scripts) with a confidence value. We mirror that
shape: ``detect_script`` counts characters per Unicode script;
single-language scripts map directly (kana→jpn, hangul→kor, han→cmn);
multi-language scripts run a function-word scorer (the
highest-signal subset of a trigram profile, fully deterministic).
``detect_language_info`` returns (lang, script, confidence) like
whatlang's ``Info``; ``detect_language`` keeps the plain-code contract.
Codes are ISO-639-3, or "und" when no evidence.

The sample cap (1 MB of text) matches language_detection.rs:103.
"""

from __future__ import annotations

import re

__all__ = [
    "detect_language",
    "detect_language_info",
    "detect_script",
    "LANG_STOPWORDS",
]

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

# Cyrillic function words (rus; ukr markers would extend this table)
_CYR_STOPWORDS: dict[str, frozenset[str]] = {
    "rus": frozenset(
        "и в не на я быть он с что а по как это она к но они мы из у "
        "который то за свой весь год от так о для ты же все тот мочь вот "
        "человек только или если уже при был даже есть чтобы раз два "
        "себя ничего ей может они тут где надо ней стал ним".split()
    ),
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# (script, start, end) Unicode ranges — counted like whatlang's
# script_detection tables (language_detection.rs / whatlang scripts.rs)
_SCRIPT_RANGES = (
    ("cyrillic", 0x0400, 0x04FF),
    ("hiragana", 0x3040, 0x309F),
    ("katakana", 0x30A0, 0x30FF),
    ("han", 0x4E00, 0x9FFF),
    ("hangul", 0xAC00, 0xD7A3),
    ("greek", 0x0370, 0x03FF),
    ("arabic", 0x0600, 0x06FF),
    ("hebrew", 0x0590, 0x05FF),
    ("thai", 0x0E00, 0x0E7F),
    ("devanagari", 0x0900, 0x097F),
)


def detect_script(text: str) -> tuple[str, int, int]:
    """Dominant script -> (script, count, total_letters) — fully
    vectorized (one numpy pass over the codepoints; the per-char Python
    loop was the extraction pipeline's second-biggest cost). Latin =
    ASCII letters + Latin-1/Extended letters (U+00C0-U+024F minus the
    two arithmetic signs)."""
    import numpy as np

    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if len(cp) == 0:
        return "und", 0, 0
    latin = (
        ((cp >= 0x41) & (cp <= 0x5A))
        | ((cp >= 0x61) & (cp <= 0x7A))
        | ((cp >= 0xC0) & (cp <= 0x24F) & (cp != 0xD7) & (cp != 0xF7))
    )
    counts: dict[str, int] = {}
    n_latin = int(latin.sum())
    if n_latin:
        counts["latin"] = n_latin
    total = n_latin
    for name, lo, hi in _SCRIPT_RANGES:
        n = int(((cp >= lo) & (cp <= hi)).sum())
        if n:
            counts[name] = n
        total += n
    if not counts:
        return "und", 0, 0
    best = max(sorted(counts), key=lambda k: counts[k])
    return best, counts[best], total


def _score_stopwords(
    words: list[str], table: dict[str, frozenset[str]]
) -> tuple[str, float]:
    """argmax language by function-word hits; confidence = normalized
    hit-margin over the runner-up (whatlang's confidence shape)."""
    best_lang, best, second = "und", 0, 0
    for lang in sorted(table):
        score = sum(1 for w in words if w in table[lang])
        if score > best:
            best_lang, best, second = lang, score, best
        elif score > second:
            second = score
    if best == 0:
        return "und", 0.0
    return best_lang, (best - second) / best


def detect_language_info(text: str | None) -> tuple[str, str, float]:
    """(iso639-3 lang, script, confidence in [0,1])."""
    if not text:
        return "und", "und", 0.0
    sample = text[:MAX_SAMPLE_CHARS]
    script, script_n, total = detect_script(sample)
    if script == "und":
        return "und", "und", 0.0
    dominance = script_n / total if total else 0.0
    # single-language scripts map directly (whatlang does the same for
    # e.g. Hangul/Greek; kana unambiguously marks Japanese even in
    # kanji-heavy text)
    if script in ("hiragana", "katakana"):
        return "jpn", script, dominance
    if script == "han":
        # han + any kana = Japanese; pure han = Mandarin
        import numpy as np

        cp = np.frombuffer(sample.encode("utf-32-le"), dtype=np.uint32)
        if bool(((cp >= 0x3040) & (cp <= 0x30FF)).any()):
            return "jpn", script, dominance
        return "cmn", script, dominance
    if script == "hangul":
        return "kor", script, dominance
    if script == "greek":
        return "ell", script, dominance
    if script == "arabic":
        return "ara", script, dominance
    if script == "hebrew":
        return "heb", script, dominance
    if script == "thai":
        return "tha", script, dominance
    if script == "devanagari":
        return "hin", script, dominance
    words = _WORD_RE.findall(sample.lower())
    if not words:
        return "und", script, 0.0
    if script == "cyrillic":
        lang, conf = _score_stopwords(words, _CYR_STOPWORDS)
        return (lang, script, conf) if lang != "und" else ("rus", script, 0.3)
    lang, conf = _score_stopwords(words, LANG_STOPWORDS)
    return lang, script, conf


def detect_language(text: str | None) -> str:
    return detect_language_info(text)[0]
