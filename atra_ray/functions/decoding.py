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
FULL WHATWG label table below exactly as ``Encoding::for_label`` does —
in particular ``iso-8859-1`` maps to windows-1252, and ``x-user-defined``
maps the high half onto U+F780-F7FF.
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

# WHATWG encoding label -> python codec name — the full label table of
# https://encoding.spec.whatwg.org/#names-and-labels (what
# encoding_rs::Encoding::for_label resolves through, decoding/mod.rs:83-169),
# expressed as (python codec, labels...) groups. Labels the spec maps to
# the replacement encoding (iso-2022-kr, hz-gb-2312, …) are intentionally
# absent: an unknown label falls through to the next precedence step,
# which is strictly safer than decoding to garbage.
_LABEL_GROUPS = (
    ("utf-8", "utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "x-unicode20utf8"),
    ("cp1252", "windows-1252", "cp1252", "x-cp1252", "iso-8859-1", "iso8859-1",
     "iso88591", "iso_8859-1", "iso_8859-1:1987", "iso-ir-100", "latin1",
     "latin-1", "l1", "ascii", "us-ascii", "ansi_x3.4-1968", "cp819", "ibm819",
     "csisolatin1"),
    ("cp1250", "windows-1250", "cp1250", "x-cp1250"),
    ("cp1251", "windows-1251", "cp1251", "x-cp1251"),
    ("cp1253", "windows-1253", "cp1253", "x-cp1253"),
    ("cp1254", "windows-1254", "cp1254", "x-cp1254", "iso-8859-9", "iso8859-9",
     "iso88599", "iso_8859-9", "iso_8859-9:1989", "iso-ir-148", "latin5", "l5",
     "csisolatin5"),
    ("cp1255", "windows-1255", "cp1255", "x-cp1255"),
    ("cp1256", "windows-1256", "cp1256", "x-cp1256"),
    ("cp1257", "windows-1257", "cp1257", "x-cp1257"),
    ("cp1258", "windows-1258", "cp1258", "x-cp1258"),
    ("cp866", "ibm866", "866", "cp866", "csibm866"),
    ("iso8859-2", "iso-8859-2", "iso8859-2", "iso88592", "iso_8859-2",
     "iso_8859-2:1987", "iso-ir-101", "latin2", "l2", "csisolatin2"),
    ("iso8859-3", "iso-8859-3", "iso8859-3", "iso88593", "iso_8859-3",
     "iso_8859-3:1988", "iso-ir-109", "latin3", "l3", "csisolatin3"),
    ("iso8859-4", "iso-8859-4", "iso8859-4", "iso88594", "iso_8859-4",
     "iso_8859-4:1988", "iso-ir-110", "latin4", "l4", "csisolatin4"),
    ("iso8859-5", "iso-8859-5", "iso8859-5", "iso88595", "iso_8859-5",
     "iso_8859-5:1988", "iso-ir-144", "cyrillic", "csisolatincyrillic"),
    ("iso8859-6", "iso-8859-6", "iso8859-6", "iso88596", "iso_8859-6",
     "iso_8859-6:1987", "iso-8859-6-e", "iso-8859-6-i", "iso-ir-127", "arabic",
     "asmo-708", "ecma-114", "csiso88596e", "csiso88596i", "csisolatinarabic"),
    ("iso8859-7", "iso-8859-7", "iso8859-7", "iso88597", "iso_8859-7",
     "iso_8859-7:1987", "iso-ir-126", "greek", "greek8", "elot_928",
     "ecma-118", "sun_eu_greek", "csisolatingreek"),
    ("iso8859-8", "iso-8859-8", "iso8859-8", "iso88598", "iso_8859-8",
     "iso_8859-8:1988", "iso-8859-8-e", "iso-ir-138", "hebrew", "visual",
     "csiso88598e", "csisolatinhebrew", "iso-8859-8-i", "csiso88598i",
     "logical"),
    ("iso8859-10", "iso-8859-10", "iso8859-10", "iso885910", "iso-ir-157",
     "latin6", "l6", "csisolatin6"),
    ("iso8859-13", "iso-8859-13", "iso8859-13", "iso885913"),
    ("iso8859-14", "iso-8859-14", "iso8859-14", "iso885914"),
    ("iso8859-15", "iso-8859-15", "iso8859-15", "iso885915", "iso_8859-15",
     "latin9", "l9", "csisolatin9"),
    ("iso8859-16", "iso-8859-16"),
    ("koi8-r", "koi8-r", "koi8", "koi", "koi8_r", "cskoi8r"),
    ("koi8-u", "koi8-u", "koi8-ru"),
    ("mac-roman", "macintosh", "mac", "x-mac-roman", "csmacintosh"),
    ("mac-cyrillic", "x-mac-cyrillic", "x-mac-ukrainian"),
    ("cp874", "windows-874", "dos-874", "tis-620", "iso-8859-11",
     "iso8859-11", "iso885911"),
    ("shift_jis", "shift_jis", "shift-jis", "sjis", "ms_kanji", "csshiftjis",
     "x-sjis", "ms932"),
    ("cp932", "windows-31j"),
    ("euc_jp", "euc-jp", "x-euc-jp", "cseucpkdfmtjapanese"),
    ("iso2022_jp", "iso-2022-jp", "csiso2022jp"),
    ("gbk", "gbk", "gb2312", "gb_2312", "gb_2312-80", "chinese", "csgb2312",
     "csiso58gb231280", "iso-ir-58", "x-gbk"),
    ("gb18030", "gb18030"),
    ("big5", "big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5"),
    # WHATWG EUC-KR is defined as the windows-949 superset (encoding_rs
    # EUC_KR == cp949); Python's euc_kr codec rejects the ~8.8k extension
    # sequences cp949 decodes
    ("cp949", "euc-kr", "euc_kr", "cseuckr", "csksc56011987", "iso-ir-149",
     "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601",
     "windows-949"),
    ("utf-16-le", "utf-16", "utf-16le", "csunicode", "ucs-2", "unicode",
     "unicodefeff", "iso-10646-ucs-2"),
    ("utf-16-be", "utf-16be"),
    ("x-user-defined", "x-user-defined"),
)
_WHATWG_LABELS = {
    label: group[0] for group in _LABEL_GROUPS for label in group[1:]
}

# x-user-defined has no python codec: bytes 0x80-0xFF map to U+F780-F7FF
_XUD_TABLE = {i: 0xF780 + (i - 0x80) for i in range(0x80, 0x100)}

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
    if codec == "x-user-defined":
        # latin-1 never fails; high half translates to the PUA block
        return body.decode("latin-1").translate(_XUD_TABLE), False
    text = body.decode(codec, errors="replace")
    return text, _REPLACEMENT in text


# ---------------------------------------------------------------------------
# chardetng-analog statistical detection (M9 step 4)
# ---------------------------------------------------------------------------

# candidate legacy encodings, in tie-break order (most common on the web
# first — the same inventory chardetng scores; ties in plausibility go to
# the EARLIER candidate, so koi8-r precedes koi8-u and cp1250 precedes
# the byte-compatible iso8859-2/cp1252 for the Central-European letters)
_DETECT_CANDIDATES = (
    "cp1251", "koi8-r", "koi8-u", "shift_jis", "euc_jp", "gb18030", "big5",
    "cp949", "cp1250", "cp1252", "iso8859-2", "cp866",
    "iso8859-7", "cp1255", "cp1256", "cp874", "cp1254",
)

# TLD -> encodings that get the locale bonus (decoding/mod.rs:171-257 feeds
# chardetng the TLD the same way)
_TLD_HINTS = {
    "ru": ("cp1251", "koi8-r", "cp866"), "by": ("cp1251",),
    "ua": ("cp1251", "koi8-u"),
    "bg": ("cp1251",), "rs": ("cp1251",), "kz": ("cp1251",),
    "jp": ("shift_jis", "euc_jp"),
    "cn": ("gb18030",), "sg": ("gb18030",),
    "tw": ("big5",), "hk": ("big5",),
    "kr": ("cp949",),
    "pl": ("cp1250", "iso8859-2"), "cz": ("cp1250", "iso8859-2"),
    "hu": ("cp1250", "iso8859-2"), "sk": ("cp1250", "iso8859-2"),
    "ro": ("cp1250", "iso8859-2"), "hr": ("cp1250", "iso8859-2"),
    "gr": ("iso8859-7",), "il": ("cp1255",),
    "sa": ("cp1256",), "eg": ("cp1256",), "ae": ("cp1256",),
    "th": ("cp874",), "tr": ("cp1254",),
}

# the 24 most frequent Russian letters (lowercase) — cp1251-Russian decoded
# with the WRONG Cyrillic codec (koi8-r) yields improbable letters/case
_COMMON_RU = frozenset("оеаинтсрвлкмдпуяыьгзбчйхжшюцщэф")
_COMMON_LATIN_EXT = frozenset("éèêëàâäçîïôöùûüñáíóúãõåæøßœ")
# Central/East-European Latin letters (cp1250/iso8859-2 locales): scored
# like the Western set so a correct cp1250 decode beats the cp1252
# mojibake that maps č/ř/ů onto è/ø/ù
_COMMON_LATIN_CE = frozenset("ąćęłńśżźěščřžůďťňýĺľőűāēīūģķļņ")
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
    prev_nonascii = False
    for ch in text:
        o = ord(ch)
        if o < 0x80:
            prev_nonascii = False
            continue
        n += 1
        # word coherence (chardetng models this as class transitions): a
        # non-Latin letter sandwiched alone inside ASCII words is the
        # signature of single-byte mojibake (e.g. Czech cp1250 bytes
        # decoded as cp1251 turn á/í/é into isolated б/н/й), while real
        # Cyrillic/Greek/Semitic text runs in whole words. Word-initial
        # chars legitimately follow ASCII spaces, so the discount is
        # partial. Accented LATIN letters are normally isolated inside
        # ASCII words, so the Latin classes are not discounted.
        run = 1.0 if prev_nonascii else 0.35
        prev_nonascii = True
        if ch in _COMMON_RU:
            score += 1.0 * run
        elif 0x0400 <= o <= 0x04FF:  # other Cyrillic (rare letters, caps)
            score += 0.25 * run
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
        elif ch in _COMMON_LATIN_EXT or ch in _COMMON_LATIN_CE:
            score += 0.8
        elif 0x00C0 <= o <= 0x017F:  # other accented latin
            score += 0.3
        elif 0x03B1 <= o <= 0x03C9:  # greek lowercase
            score += 1.0 * run
        elif 0x0370 <= o <= 0x03FF:  # other greek
            score += 0.3 * run
        elif 0x05D0 <= o <= 0x05EA:  # hebrew letters
            score += 1.0 * run
        elif 0x0621 <= o <= 0x064A:  # arabic letters
            score += 1.0 * run
        elif 0x0E01 <= o <= 0x0E4E:  # thai
            score += 1.0 * run
        elif o == 0xFFFD:  # replacement char: decode damage
            score -= 1.0
        elif 0x0080 <= o <= 0x009F:  # C1 controls: mojibake
            score -= 2.0
        elif 0x2500 <= o <= 0x25FF:  # box drawing/blocks: koi8 mojibake tell
            score -= 1.0
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
