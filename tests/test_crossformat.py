"""Cross-format extraction consistency: the SAME logical document rendered
as HTML, as PAGE-XML, and as a born-digital PDF must extract to
BYTE-IDENTICAL text through each format's pipeline leg (north rule:
byte-identical extracted text per document; SURVEY §2 S2/P7/W1 on all
three native-format legs).

All three renderers are hand-written HERE — independent of the sparkdu
synth generators (sparkdu/pagexml.py, sparkdu/pdf.py) and of each other —
so three-way agreement is evidence, not an encoder/decoder tautology.
Each renderer also plants format-specific boilerplate (an HTML <footer>,
a PAGE-XML page-number region, a small-type PDF footer run) that the
respective classification rule must strip; PAGE-XML additionally lists
regions in REVERSED document order so only honoring ReadingOrder indices
reproduces the display order.
"""

import datetime

import pytest

from sparkdu.api import ExtractConfig, extract_pages
from sparkdu.pagexml import pagexml_doc_text, pagexml_nodes
from sparkdu.pdf import pdf_doc_text, pdf_runs

from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# the logical corpus: per document, a list of PARTS (pages), each part a
# list of display-order content block strings. ASCII single-spaced except
# doc 1, whose accented chars are latin-1-safe (the PDF literal-string
# byte range) and NFC-composed (the HTML normalization is then identity).
# ---------------------------------------------------------------------
LOGICAL_DOCS = [
    [["City Report",
      "Alpha bravo charlie delta echo.",
      "Foxtrot golf hotel india juliet.",
      "Lima mike november oscar papa."]],
    [["Café menu (du jour)",
      "Déjà vu sur la côte."]],
    [["Part One", "First part body text here."],
     ["Part Two", "Second part body text, longer than the first."]],
    # normalization adversary (VERDICT r4 #6): every accent is latin-1
    # (the PDF literal-string byte range); the HTML renderer emits this
    # doc with NFD-DECOMPOSED combining marks as numeric entities and
    # &nbsp; in place of spaces, so the HTML leg only matches if its
    # unescape -> NFC -> \s-collapse path (SPEC F1/F2; \s includes
    # U+00A0) converges to the literal bytes the XML/PDF legs carry.
    [["Résumé détails",
      "Déjà café açaí noël.",
      "Voilà précis à propos."]],
]

EXPECTED = ["\n".join(b for part in doc for b in part)
            for doc in LOGICAL_DOCS]


# ----------------------------- HTML ----------------------------------

def _adversarial_html(s: str) -> str:
    """Re-encode logical text the nastiest way HTML allows while staying
    the SAME logical document: NFD-decompose, emit every combining mark
    as a numeric entity, and swap alternating spaces for &nbsp; (U+00A0
    is \\s in Python str regexes, so the spec collapse maps it back)."""
    import unicodedata

    out = []
    for i, ch in enumerate(unicodedata.normalize("NFD", s)):
        if unicodedata.combining(ch):
            out.append(f"&#x{ord(ch):X};")
        elif ch == " " and i % 2 == 0:
            out.append("&nbsp;")
        else:
            out.append(ch)
    return "".join(out)


def render_html(doc: list, adversarial: bool = False) -> bytes:
    """First block of each part is an <h2>, the rest <p>; parts separated
    by <hr> (the spec v1.1 pagination rule); a <footer> plants boilerplate
    the v1 rule must strip via anc_boiler."""
    enc = _adversarial_html if adversarial else (lambda s: s)
    out = ["<html><body>"]
    for pi, part in enumerate(doc):
        if pi:
            out.append("<hr>")
        out.append(f"<h2>{enc(part[0])}</h2>")
        for b in part[1:]:
            out.append(f"<p>{enc(b)}</p>")
    out.append("<footer>Copyright 2099 Example Corp</footer>")
    out.append("</body></html>")
    return "".join(out).encode("utf-8")


# --------------------------- PAGE-XML --------------------------------

def render_pagexml(doc: list) -> bytes:
    """One <Page> per part. Regions appear in REVERSED document order with
    ReadingOrder indices carrying the true display order, and the region
    y-coordinates DECREASE with reading index — so neither parse order nor
    the geometric y-fallback reproduces the display order; only honoring
    ReadingOrder can. A page-number region (no ReadingOrder entry) plants
    boilerplate the rtype filter must strip."""
    ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
    pages = []
    for pi, part in enumerate(doc):
        refs, regions = [], []
        for j, text in enumerate(part):
            rid = f"r{pi}_{j}"
            rtype = "heading" if j == 0 else "paragraph"
            y = 1000 - 80 * j
            refs.append(
                f'<RegionRefIndexed index="{j}" regionRef="{rid}"/>')
            regions.append(
                f'<TextRegion id="{rid}" type="{rtype}">'
                f'<Coords points="100,{y} 900,{y} 900,{y + 60} 100,{y + 60}"/>'
                f"<TextEquiv><Unicode>{_xml_escape(text)}</Unicode>"
                f"</TextEquiv></TextRegion>")
        regions.append(
            f'<TextRegion id="pn{pi}" type="page-number">'
            f'<Coords points="450,1300 550,1300 550,1340 450,1340"/>'
            f"<TextEquiv><Unicode>42</Unicode></TextEquiv></TextRegion>")
        pages.append(
            '<Page imageWidth="1000" imageHeight="1400">'
            "<ReadingOrder><OrderedGroup id="
            f'"g{pi}">{"".join(refs)}</OrderedGroup></ReadingOrder>'
            f'{"".join(reversed(regions))}</Page>')
    return (f'<?xml version="1.0" encoding="UTF-8"?>'
            f'<PcGts xmlns="{ns}">{"".join(pages)}</PcGts>').encode("utf-8")


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


# ------------------------------ PDF ----------------------------------

def _pdf_assemble(objs: dict, root_id: int = 1) -> bytes:
    """Classic-xref assembly (trivial offset bookkeeping; the object
    bodies the parser interprets are hand-written below)."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid in sorted(objs):
        offsets[oid] = len(out)
        out += b"%d 0 obj\n" % oid + objs[oid] + b"\nendobj\n"
    xref_off = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % n
    for oid in range(1, n):
        out += b"%010d 00000 n \n" % offsets[oid]
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n, root_id, xref_off))
    return bytes(out)


def _pdf_str(s: str) -> bytes:
    b = s.encode("latin-1")
    return (b"(" + b.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(").replace(b")", b"\\)") + b")")


def render_pdf(doc: list) -> bytes:
    """One page object per part (a /Pages tree with /Count and /Kids). The
    heading shows at 14 pt, body at 12 pt, top-to-bottom via decreasing
    Td y; a 7 pt footer run plants boilerplate the size>=9 rule must
    strip."""
    objs = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
    kids, next_id = [], 3
    for part in doc:
        ops = [b"BT", b"/F1 14 Tf", b"72 720 Td", _pdf_str(part[0]) + b" Tj",
               b"/F1 12 Tf"]
        for b in part[1:]:
            ops.append(b"0 -24 Td")
            ops.append(_pdf_str(b) + b" Tj")
        ops += [b"ET", b"BT", b"/F1 7 Tf", b"1 0 0 1 280 24 Tm",
                b"(Page 42) Tj", b"ET"]
        content = b"\n".join(ops)
        pid, cid = next_id, next_id + 1
        next_id += 2
        kids.append(b"%d 0 R" % pid)
        objs[pid] = (b"<< /Type /Page /Parent 2 0 R "
                     b"/MediaBox [0 0 612 792] /Contents %d 0 R >>" % cid)
        objs[cid] = (b"<< /Length %d >>\nstream\n" % len(content)
                     + content + b"\nendstream")
    objs[2] = (b"<< /Type /Pages /Kids [ %s ] /Count %d >>"
               % (b" ".join(kids), len(doc)))
    return _pdf_assemble(objs)


# ----------------------------- the gate -------------------------------

@pytest.fixture(scope="module")
def legs(spark):
    """Run all three pipeline legs over the rendered corpus once."""
    ts = datetime.datetime(2026, 1, 1)
    pages = spark.createDataFrame(
        [(f"https://cross.test/{i}", ts, render_html(d, adversarial=(i == 3)))
         for i, d in enumerate(LOGICAL_DOCS)],
        "url string, warc_ts timestamp, html binary")
    html = {int(r["url"].rsplit("/", 1)[1]): r["extracted_text"]
            for r in extract_pages(
                spark, pages, ExtractConfig(model_path=None)).collect()}

    xml_df = spark.createDataFrame(
        [(i, render_pagexml(d)) for i, d in enumerate(LOGICAL_DOCS)],
        "doc_id long, xml binary")
    regions = pagexml_nodes(xml_df).filter(
        (F.col("kind") == "region")
        & F.col("rtype").isin("paragraph", "heading"))
    pagexml = {r["doc_id"]: r["doc_text"]
               for r in pagexml_doc_text(regions).collect()}

    pdf_df = spark.createDataFrame(
        [(i, render_pdf(d)) for i, d in enumerate(LOGICAL_DOCS)],
        "doc_id long, pdf binary")
    runs = pdf_runs(pdf_df).filter(F.col("size") >= 9.0)
    pdf = {r["doc_id"]: r["doc_text"]
           for r in pdf_doc_text(runs).collect()}

    doc0_docorder = [r["text"] for r in regions.filter(F.col("doc_id") == 0)
                     .orderBy("node_id").collect()]
    return html, pagexml, pdf, doc0_docorder


def test_three_legs_byte_identical(legs):
    html, pagexml, pdf, _ = legs
    for i, want in enumerate(EXPECTED):
        assert html[i].encode("utf-8") == want.encode("utf-8"), f"html {i}"
        assert pagexml[i].encode("utf-8") == want.encode("utf-8"), f"xml {i}"
        assert pdf[i].encode("utf-8") == want.encode("utf-8"), f"pdf {i}"


def test_boilerplate_stripped_everywhere(legs):
    for leg in legs[:3]:
        joined = "\n".join(leg.values())
        assert "Copyright 2099" not in joined
        assert "42" not in joined


def test_rtl_text_html_pagexml_identical(spark):
    """RTL adversary (VERDICT r4 #6): Hebrew blocks with an RLM control
    (U+200F — a Cf char, NOT \\s, so the collapse must preserve it), the
    HTML side carrying every char as a numeric entity plus &nbsp;/&rlm;
    named forms. Two-leg gate only: the PDF leg's ISO 32000-1 literal
    strings are latin-1-bounded in this subset (full Unicode show-text
    needs font CMaps, out of scope and documented in sparkdu/pdf.py), so
    RTL byte-identity is proven HTML <-> PAGE-XML."""
    import datetime as _dt

    rtl_doc = [["שלום עולם", "דג‏סקר כאן."]]
    html_src = ("<html><body><h2>"
                + "".join(f"&#x{ord(c):X};" for c in rtl_doc[0][0])
                + "</h2><p>"
                + "".join("&nbsp;" if c == " " else
                          ("&rlm;" if c == "‏" else f"&#{ord(c)};")
                          for c in rtl_doc[0][1])
                + "</p></body></html>").encode("utf-8")
    pages = spark.createDataFrame(
        [("https://rtl.test/0", _dt.datetime(2026, 1, 1), html_src)],
        "url string, warc_ts timestamp, html binary")
    html_text = extract_pages(
        spark, pages, ExtractConfig(model_path=None)
    ).collect()[0]["extracted_text"]

    xml_df = spark.createDataFrame(
        [(0, render_pagexml(rtl_doc))], "doc_id long, xml binary")
    regions = pagexml_nodes(xml_df).filter(
        (F.col("kind") == "region")
        & F.col("rtype").isin("paragraph", "heading"))
    xml_text = pagexml_doc_text(regions).collect()[0]["doc_text"]

    want = "\n".join(rtl_doc[0])
    assert html_text.encode("utf-8") == want.encode("utf-8")
    assert xml_text.encode("utf-8") == want.encode("utf-8")
    assert "‏" in html_text  # the Cf control survived the collapse


def test_reading_order_not_document_order(legs):
    """The PAGE-XML renderer lists regions in REVERSED document order, so
    the parsed node_id order must be the reverse of the display order —
    the byte-identity above can then only hold because the assembly
    honored the ReadingOrder indices, not the parse order."""
    _, _, _, doc0_docorder = legs
    assert doc0_docorder == list(reversed(LOGICAL_DOCS[0][0]))
