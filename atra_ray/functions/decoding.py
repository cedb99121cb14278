"""Encoding detection + decode (SURVEY.md M9) — the byte-identical-critical
kernel of the north rule.

The reference's precedence (atra/src/decoding/mod.rs:83-257):

1. charset from the MIME header parameter         (we have no HTTP headers)
2. for HTML: every ``<meta charset=…>`` label found in a lossy parse,
   each tried in document order; a decode that produced replacement
   characters is rejected and the next candidate is tried
3. BOM sniffing (UTF-8 / UTF-16LE / UTF-16BE)
4. chardetng guess (TLD-hinted); if the guess decodes with errors, a strict
   UTF-8 retry wins when it is clean
5. plain UTF-8 with replacement as the final fallback

We reproduce 2-3 exactly. Step 4 is a chardetng-ANALOG statistical
detector (``statistical_guess``): strict UTF-8 wins when valid; otherwise
candidate legacy encodings are strict-decoded and scored by
character-class plausibility (common-Russian-letter frequencies for the
Cyrillic pair cp1251/koi8-r, kana vs Han weighting for the CJK family,
C1-control = mojibake penalty), with a TLD hint adding a bonus to the
locale's encodings — the same evidence classes chardetng's trained model
uses (decoding/mod.rs:171-257 feeds the TLD the same way). Like
chardetng, the detector refuses to guess on weak evidence (< 2% non-ASCII
bytes), falling back to lossy UTF-8. Encoding labels resolve through the
WHATWG label table (subset below) exactly as ``Encoding::for_label`` does
— in particular ``iso-8859-1`` maps to windows-1252.
"""

from __future__ import annotations

import codecs
import re

__all__ = [
    "decode_bytes",
    "meta_charsets",
    "whatwg_codec",
    "statistical_guess",
]

# WHATWG encoding label -> python codec name (subset of
# https://encoding.spec.whatwg.org/#names-and-labels; the full table is what
# encoding_rs::Encoding::for_label implements)
_WHATWG_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "cp1252", "latin1": "cp1252", "latin-1": "cp1252",
    "l1": "cp1252", "ascii": "cp1252", "us-ascii": "cp1252",
    "windows-1252": "cp1252", "cp1252": "cp1252", "ansi_x3.4-1968": "cp1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "koi8-r": "koi8-r",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis", "sjis": "shift_jis",
    "ms_kanji": "shift_jis", "windows-31j": "cp932",
    "euc-jp": "euc_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "euc_kr",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?charset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""", re.IGNORECASE
)

_REPLACEMENT = "�"


def whatwg_codec(label: str) -> str | None:
    return _WHATWG_LABELS.get(label.strip().lower())


def meta_charsets(body: bytes, window: int = 4096) -> list[str]:
    """Charset labels declared in ``<meta charset>`` / ``http-equiv`` tags,
    in document order. The reference lossy-parses the whole document
    (decoding/mod.rs:108-131); a bounded head-scan is equivalent for
    well-formed pages and O(1) per row."""
    return [m.group(1).decode("ascii", "ignore") for m in _META_CHARSET_RE.finditer(body[:window])]


def _bom_codec(body: bytes) -> tuple[str, int] | None:
    if body.startswith(codecs.BOM_UTF8):
        return "utf-8", 3
    if body.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le", 2
    if body.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be", 2
    return None


def _try_decode(body: bytes, codec: str) -> tuple[str, bool]:
    text = body.decode(codec, errors="replace")
    return text, _REPLACEMENT in text


# ---------------------------------------------------------------------------
# chardetng-analog statistical detection (M9 step 4)
# ---------------------------------------------------------------------------

# candidate legacy encodings, in tie-break order (most common on the web
# first — the same inventory chardetng scores)
_DETECT_CANDIDATES = (
    "cp1251", "koi8-r", "shift_jis", "euc_jp", "gb18030", "big5",
    "euc_kr", "cp1252", "iso8859-2",
)

# TLD -> encodings that get the locale bonus (decoding/mod.rs:171-257 feeds
# chardetng the TLD the same way)
_TLD_HINTS = {
    "ru": ("cp1251", "koi8-r"), "by": ("cp1251",), "ua": ("cp1251",),
    "bg": ("cp1251",), "rs": ("cp1251",), "kz": ("cp1251",),
    "jp": ("shift_jis", "euc_jp"),
    "cn": ("gb18030",), "sg": ("gb18030",),
    "tw": ("big5",), "hk": ("big5",),
    "kr": ("euc_kr",),
    "pl": ("iso8859-2",), "cz": ("iso8859-2",), "hu": ("iso8859-2",),
    "sk": ("iso8859-2",),
}

# the 24 most frequent Russian letters (lowercase) — cp1251-Russian decoded
# with the WRONG Cyrillic codec (koi8-r) yields improbable letters/case
_COMMON_RU = frozenset("оеаинтсрвлкмдпуяыьгзбчйхжшюцщэф")
_COMMON_LATIN_EXT = frozenset("éèêëàâäçîïôöùûüñáíóúãõåæøßœ")
# ~100 highest-frequency Chinese characters: the wrong CJK codec (e.g.
# euc-kr hanja pages) decodes to IMPROBABLE ideographs, the right one to
# these — same class-frequency evidence chardetng encodes in its models
_COMMON_HANZI = frozenset(
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得"
    "就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日"
    "于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同"
    "三已老从动两长知民样现分将外但身些与高意进把法此实回二理美点月"
    "明器食示字母世界料建性区海通教西强据造百原取持台费越书数搜索页"
    "网络结果图片信息站词语系统时间工作问题部门电提质气活程度量场需"
)


def _plausibility(text: str) -> float:
    """Mean per-NON-ASCII-char plausibility of a decoded candidate
    (first-match class precedence; set lookups beat numpy here — decoded
    candidates are short and np.isin's sort overhead dominates small
    inputs). Positive classes: coherent natural-language script runs;
    negative: C1 controls (the classic mojibake tell), box/symbol salad.
    Hangul is scored mix-aware: real Korean is predominantly hangul, so
    hangul diluted below 70% of the non-ASCII chars (the signature of a
    wrong-codec CJK decode) scores low."""
    score = 0.0
    n = 0
    n_hangul = 0
    for ch in text:
        o = ord(ch)
        if o < 0x80:
            continue
        n += 1
        if ch in _COMMON_RU:
            score += 1.0
        elif 0x0400 <= o <= 0x04FF:  # other Cyrillic (rare letters, caps)
            score += 0.25
        elif 0x3040 <= o <= 0x30FF:  # hiragana/katakana
            score += 1.0
        elif ch in _COMMON_HANZI:
            score += 1.0
        elif 0x4E00 <= o <= 0x9FFF:  # CJK ideographs (uncommon)
            score += 0.55
        elif 0xAC00 <= o <= 0xD7A3:  # hangul (scored in the mix pass)
            n_hangul += 1
        elif 0x3000 <= o <= 0x303F or 0xFF00 <= o <= 0xFFEF:  # CJK punct
            score += 0.4
        elif ch in _COMMON_LATIN_EXT:
            score += 0.8
        elif 0x00C0 <= o <= 0x017F:  # other accented latin
            score += 0.3
        elif o == 0xFFFD:  # replacement char: decode damage
            score -= 1.0
        elif 0x0080 <= o <= 0x009F:  # C1 controls: mojibake
            score -= 2.0
        elif o in (0xA4, 0xA6, 0xA8, 0xB4, 0xB8):  # currency/diacritic salad
            score -= 0.5
        else:
            score -= 0.2
    if n_hangul:
        score += n_hangul * (1.0 if n_hangul / n >= 0.7 else 0.3)
    return score / n if n else 0.0


def statistical_guess(
    body: bytes, tld: str | None = None, sample: int = 65536
) -> str | None:
    """Best-scoring candidate codec, or None when evidence is weak (< 2%
    non-ASCII bytes — like chardetng, we refuse to guess mostly-ASCII
    bodies into a legacy encoding over one stray byte). Candidates must
    STRICT-decode (invalid sequences disqualify); the TLD of the page's
    host adds a +0.5 locale bonus."""
    head = body[:sample]
    non_ascii = sum(1 for b in head if b >= 0x80)
    # absolute AND relative evidence floors: a handful of stray bytes in
    # ASCII text is mojibake/corruption, not a legacy encoding
    if non_ascii < 8 or non_ascii / len(head) < 0.02:
        return None
    hinted = _TLD_HINTS.get((tld or "").lower(), ())
    # the fixed-size sample may cut a multibyte sequence at its tail, which
    # would strict-disqualify the TRUE codec of a large CJK page; only a
    # boundary cut is forgiven (an invalid byte in the interior still
    # disqualifies), and only when the body actually extends past the sample
    truncated = len(body) > len(head)
    # chardetng keeps UTF-8 in the race: a body that is ALMOST valid UTF-8
    # (e.g. one corrupt byte in accented text) must fall back to lossy
    # UTF-8, not get mojibake-guessed into a single-byte codec. The lossy
    # UTF-8 decode's own plausibility is the bar every candidate must beat
    # (replacement chars score -1 each, so genuinely non-UTF-8 bodies set
    # a very low bar).
    utf8_floor = _plausibility(head.decode("utf-8", errors="replace"))
    best_codec, best_score = None, max(0.35, utf8_floor)
    for codec in _DETECT_CANDIDATES:
        try:
            text = head.decode(codec)
        except UnicodeDecodeError as e:
            # multibyte sequence cut by the sample window: decode the clean
            # prefix instead (gb18030 sequences are up to 4 bytes)
            if truncated and e.start >= len(head) - 4:
                text = head[: e.start].decode(codec, errors="ignore")
            else:
                continue
        except ValueError:
            continue
        s = _plausibility(text) + (0.5 if codec in hinted else 0.0)
        if s > best_score:
            best_codec, best_score = codec, s
    return best_codec


def decode_bytes(
    body: bytes | None, is_html: bool, tld: str | None = None
) -> tuple[str | None, str, bool]:
    """Decode a page body -> (text, encoding_used, had_errors).

    Mirrors atra's ``decode`` (decoding/mod.rs:83-257) under the precedence
    documented in the module docstring. ``had_errors`` is true when the
    winning decode produced U+FFFD replacement characters (atra's
    ``had_errors`` flag)."""
    if body is None or len(body) == 0:
        return None, "none", False
    body = bytes(body)

    if is_html:
        for label in meta_charsets(body):
            codec = whatwg_codec(label)
            if codec is None:
                continue
            text, had_errors = _try_decode(body, codec)
            if not had_errors:
                return text, codec, False
            # like the reference: a meta-charset decode with errors is
            # rejected and the search continues (decoding/mod.rs:133-163)

    bom = _bom_codec(body)
    if bom is not None:
        codec, skip = bom
        text, had_errors = _try_decode(body[skip:], codec)
        return text, codec, had_errors

    try:
        return body.decode("utf-8"), "utf-8", False
    except UnicodeDecodeError:
        pass
    # M9 step 4: statistical guess (chardetng analog). Only clean strict
    # decodes qualify, so the reference's "guess-with-errors loses to a
    # clean strict UTF-8 retry" rule is subsumed (strict UTF-8 already
    # failed above).
    guess = statistical_guess(body, tld)
    if guess is not None:
        # the guess was validated on the head sample only: an invalid byte
        # past the sample window must NOT raise out of the decode (the
        # reference's chardetng path never raises) — decode lossily with
        # the guessed codec and carry the had_errors flag instead
        try:
            return body.decode(guess), guess, False
        except UnicodeDecodeError:
            text, had_errors = _try_decode(body, guess)
            return text, guess, had_errors
    text, _ = _try_decode(body, "utf-8")
    return text, "utf-8", True
