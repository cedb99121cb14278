"""Decode precedence tests — atra/src/decoding/mod.rs:83-257 semantics."""

import codecs

from atra_ray.functions.decoding import decode_bytes, meta_charsets, whatwg_codec


def test_meta_charset_wins():
    body = '<html><head><meta charset="iso-8859-1"></head><body>caf\xe9</body></html>'.encode("cp1252")
    text, enc, err = decode_bytes(body, is_html=True)
    assert enc == "cp1252"  # WHATWG: iso-8859-1 label -> windows-1252
    assert "café" in text
    assert not err


def test_meta_charset_with_errors_is_rejected():
    # declared charset produces replacement chars -> falls through to utf-8
    body = '<html><head><meta charset="shift_jis"></head><body>ok</body></html>'.encode("utf-8")
    # inject a byte sequence invalid in shift_jis but valid utf-8
    body = body.replace(b"ok", "ありがとう".encode("utf-8"))
    text, enc, err = decode_bytes(body, is_html=True)
    assert "ありがとう" in text
    assert not err


def test_bom_utf16le():
    body = codecs.BOM_UTF16_LE + "<html><body>héllo</body></html>".encode("utf-16-le")
    text, enc, err = decode_bytes(body, is_html=True)
    assert enc == "utf-16-le"
    assert "héllo" in text
    assert not err


def test_bom_utf8():
    body = codecs.BOM_UTF8 + "plain".encode()
    text, enc, err = decode_bytes(body, is_html=False)
    assert text == "plain"
    assert not err


def test_invalid_utf8_lossy_fallback():
    body = b"<html><body>a\xffb</body></html>"
    text, enc, err = decode_bytes(body, is_html=True)
    assert enc == "utf-8"
    assert err
    assert "a�b" in text


def test_clean_utf8_no_errors():
    text, enc, err = decode_bytes("héllo wörld".encode(), is_html=False)
    assert (text, enc, err) == ("héllo wörld", "utf-8", False)


def test_whatwg_label_table():
    assert whatwg_codec("ISO-8859-1") == "cp1252"
    assert whatwg_codec("UTF-8") == "utf-8"
    assert whatwg_codec("Shift-JIS") == "shift_jis"
    assert whatwg_codec("nonsense") is None


def test_meta_charsets_scan_order():
    body = b'<meta charset="utf-8"><meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
    assert meta_charsets(body) == ["utf-8", "iso-8859-1"]


def test_empty_body():
    assert decode_bytes(b"", is_html=True) == (None, "none", False)
    assert decode_bytes(None, is_html=True) == (None, "none", False)
