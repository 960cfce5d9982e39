"""T0 — pure-function unit tests on hand-written nasties (SURVEY SS5.2).

No Spark. Exercises both implementations (oracle + sparkdu.parse) on the
same inputs and asserts the spec'd behavior AND cross-implementation parity.
"""

import pytest

from oracle import extract as orc
from sparkdu import parse as sp

NASTIES = {
    "plain": b"<html><body><p>Hello world</p></body></html>",
    "entities": b"<p>Tom &amp; Jerry &#233; caf&eacute;&nbsp;!</p>",
    "broken_tag": b"<div><p>unclosed <b>bold <p>next para</div>",
    "nested_table": b"<table><tr><td><table><tr><td>inner</td></tr></table>out</td></tr></table>",
    "rtl_nbsp": "<p>مرحبا world</p>".encode(),
    "cdata_script": b"<script><![CDATA[ <p>not text</p> ]]></script><p>real</p>",
    "mismatched_close": b"<div><p>a</span></p></div>",
    "no_body": b"just naked text <p>in p</p> trailing",
    "comment": b"<p>a<!-- <p>ghost</p> -->b</p>",
    "link_heavy": b'<div><a href="/x">one</a> <a href="/y">two</a></div>',
    "boiler_nested": b"<nav><ul><li>home</li></ul></nav><p>content</p>",
    "empty": b"",
    "null_byte": b"<p>a\x00b</p>",
    "latin1_meta": '<meta charset="iso-8859-1"><p>caf\xe9</p>'.encode("latin-1"),
    "utf16_bom": "<p>你好</p>".encode("utf-16"),  # BOM + LE
    "bad_charset": b'<meta charset="not-a-codec"><p>ok</p>',
    "self_closing": b"<p>a<br/>b</p><div/>",
    "attr_dupes": b'<p id="one" id="two" data-x>text</p>',
    "title_in_head": b"<head><title>STRIP ME</title></head><body><p>keep</p></body>",
    "inline_across": b"<p>foo <b>bar</b> <a href=x>baz</a> qux</p>",
}


def _both(b):
    o = orc.extract_page("u", b)
    s_text, s_nb, s_spans, _ = sp.extract_doc(b)
    assert o["extracted_text"].encode() == s_text.encode()
    assert o["n_blocks"] == s_nb
    assert [(d["node_id"], d["start"], d["end"]) for d in o["spans"]] == list(s_spans)
    return o


@pytest.mark.parametrize("name", sorted(NASTIES))
def test_parity_nasty(name):
    _both(NASTIES[name])


def test_plain():
    assert _both(NASTIES["plain"])["extracted_text"] == "Hello world"


def test_entities_unescaped_and_nbsp_collapsed():
    assert _both(NASTIES["entities"])["extracted_text"] == "Tom & Jerry é café !"


def test_boiler_nested_stripped():
    assert _both(NASTIES["boiler_nested"])["extracted_text"] == "content"


def test_link_heavy_dropped():
    # link_density = 1.0 > 0.5 -> boilerplate
    assert _both(NASTIES["link_heavy"])["extracted_text"] == ""


def test_head_title_stripped():
    assert _both(NASTIES["title_in_head"])["extracted_text"] == "keep"


def test_script_cdata_ignored():
    assert _both(NASTIES["cdata_script"])["extracted_text"] == "real"


def test_inline_reassembly():
    assert _both(NASTIES["inline_across"])["extracted_text"] == "foo bar baz qux"


def test_empty_doc():
    o = _both(NASTIES["empty"])
    assert o["extracted_text"] == "" and o["n_blocks"] == 0 and o["spans"] == []


def test_utf16_bom_decode():
    assert _both(NASTIES["utf16_bom"])["extracted_text"] == "你好"


def test_latin1_meta_decode():
    assert _both(NASTIES["latin1_meta"])["extracted_text"] == "café"


def test_truncation_marker():
    big = b"<p>x</p>" + b" " * (sp.MAX_HTML_BYTES + 10)
    o = _both(big)
    assert o["extracted_text"].endswith("\n" + orc.TRUNCATION_MARKER)
    assert o["n_blocks"] == 1


def test_truncation_empty_doc():
    big = b" " * (sp.MAX_HTML_BYTES + 10)
    assert _both(big)["extracted_text"] == orc.TRUNCATION_MARKER


def test_span_validity_property():
    # T3: extracted_text[start:end] == node text, '\n' separators
    for b in NASTIES.values():
        o = orc.extract_page("u", b)
        txt = o["extracted_text"]
        nodes = {n["node_id"]: n for n in o["nodes"]}
        for s in o["spans"]:
            assert txt[s["start"] : s["end"]] == nodes[s["node_id"]]["text"]
            if s["end"] < len(txt):
                assert txt[s["end"]] == "\n"


def test_normalization_idempotent():
    for b in NASTIES.values():
        o = orc.extract_page("u", b)
        for n in o["nodes"]:
            assert orc.normalize_text(n["text"]) == n["text"]


def test_constant_parity():
    """Tag sets / caps duplicated per the import firewall must stay equal."""
    assert orc.VOID_TAGS == sp.VOID_TAGS
    assert orc.SKIP_TAGS == sp.SKIP_TAGS
    assert orc.BOILER_TAGS == sp.BOILER_TAGS
    assert orc.BLOCK_TAGS == sp.BLOCK_TAGS
    assert orc.MAX_HTML_BYTES == sp.MAX_HTML_BYTES
    assert orc.TRUNCATION_MARKER == sp.TRUNCATION_MARKER


def test_import_firewall():
    """sparkdu must never import the oracle; no row-at-a-time udf anywhere."""
    import pathlib

    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / "sparkdu"
    for f in pkg.rglob("*.py"):
        src = f.read_text()
        assert not re.search(r"^\s*(import oracle|from oracle)", src, re.M), f
        assert "functions.udf(" not in src and "F.udf(" not in src, f


def test_corpus_parity_500():
    """T1 core at the pure-python level over the synthetic corpus."""
    from sparkdu import fixtures

    for r in fixtures.gen_rows(200):
        o = orc.extract_page(r["url"], r["html"])
        t, nb, spans, _ = sp.extract_doc(r["html"])
        assert o["extracted_text"].encode("utf-8") == t.encode("utf-8"), r["url"]
        assert o["n_blocks"] == nb
