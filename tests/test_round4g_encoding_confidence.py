"""Round-4: chardet-parity confidence scoring for encoding detection
(VERDICT r3 #8) — (encoding, confidence) pairs with the reference's
<50% → default fallback (src/schema_validata.py:583-626)."""

import codecs
import logging

from schema_validata_spark.sources.readers import (
    detect_file_encoding, detect_file_encoding_confidence)


def _w(tmp_path, name, data: bytes):
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_bom_is_certain(tmp_path):
    p = _w(tmp_path, "b.csv", codecs.BOM_UTF8 + "a,b\n1,2\n".encode())
    assert detect_file_encoding_confidence(p) == ("UTF-8", 1.0)


def test_ascii_and_utf8(tmp_path):
    p = _w(tmp_path, "a.csv", b"a,b\n1,2\n")
    assert detect_file_encoding_confidence(p) == ("UTF-8", 1.0)
    p2 = _w(tmp_path, "u.csv", "naïve,café\n1,2\n".encode("utf-8"))
    enc, conf = detect_file_encoding_confidence(p2)
    assert enc == "UTF-8" and conf == 0.99


def test_cp1252_smart_quotes_high_confidence(tmp_path):
    """cp1252 curly quotes land in 0x80-0x9F; the score must treat
    them as printable so real cp1252 text clears the 50% bar and
    reads as ISO-8859-1 (Spark's charset list; shared letter range)."""
    text = "col\n“quoted” caf\xe9 — dash\n" * 20
    p = _w(tmp_path, "w.csv", text.encode("cp1252"))
    enc, conf = detect_file_encoding_confidence(p)
    assert enc == "ISO-8859-1"
    assert conf > 0.5
    assert detect_file_encoding(p) == "ISO-8859-1"


def test_latin1_text_high_confidence(tmp_path):
    p = _w(tmp_path, "l.csv", "prix,año\n1,café\n".encode("latin-1") * 10)
    enc, conf = detect_file_encoding_confidence(p)
    assert enc == "ISO-8859-1" and conf > 0.5


def test_utf16_interleave_and_strict(tmp_path):
    p = _w(tmp_path, "s.csv", "a,b\n1,2\n".encode("utf-16-le"))
    enc, conf = detect_file_encoding_confidence(p)
    assert enc == "UTF-16LE" and conf > 0.9
    # CJK utf-16 has no NUL interleave — strict-decode heuristic
    p2 = _w(tmp_path, "c.csv", "名前,値\nあ,1\n".encode("utf-16-be"))
    enc2, conf2 = detect_file_encoding_confidence(p2)
    assert enc2 == "UTF-16BE" and conf2 == 0.8


def test_binary_junk_falls_back_to_default(tmp_path, caplog):
    """Mostly-control bytes score under 50% — the reference's chardet
    low-confidence branch: warn and use the default."""
    junk = bytes(range(0x00, 0x09)) * 40 + b"\xff\xfe\xfd" * 5
    p = _w(tmp_path, "j.bin", junk[3:])     # avoid accidental BOM
    enc, conf = detect_file_encoding_confidence(p)
    assert conf <= 0.5
    with caplog.at_level(logging.WARNING):
        assert detect_file_encoding(p) == "UTF-8"
    assert "low" in caplog.text


def test_empty_file_defaults_utf8(tmp_path):
    p = _w(tmp_path, "e.csv", b"")
    assert detect_file_encoding_confidence(p) == ("UTF-8", 1.0)


def test_utf8_with_stray_nul_stays_utf8(tmp_path):
    """A valid UTF-8 dump with one stray NUL (C/DB exporters) must not
    mojibake into ISO-8859-1 — UTF-8 at slightly lower confidence."""
    data = "naïve,café\n1,2\n".encode("utf-8") * 10 + b"\x00"
    p = _w(tmp_path, "nul.csv", data)
    enc, conf = detect_file_encoding_confidence(p)
    assert enc == "UTF-8" and conf == 0.9
    assert detect_file_encoding(p) == "UTF-8"
