"""PDF ingest gates (sparkdu/pdf.py).

The fixture key (scan_pdf_runs) cross-checks parser vs generator —
same-author twins — so the load-bearing gates here are HAND-WRITTEN
vectors: content streams typed out against ISO 32000-1 with their run
rows derived by hand (text-matrix positions, escapes, TJ concatenation,
MediaBox inheritance), plus the malformed-rejection matrix and the
zero-exchange plan shape of the Spark stage."""

import zlib

import pytest

from sparkdu.pdf import (
    _parse_hex_string,
    _parse_literal_string,
    _parse_value,
    parse_pdf,
)


def _assemble(objs: dict, root_id: int = 1) -> bytes:
    """Classic-xref assembly for hand vectors. Trivial bookkeeping only —
    every byte of the OBJECT BODIES (the part the parser interprets) is
    hand-written by the tests."""
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
    out += b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        n, root_id, xref_off)
    return bytes(out)


HAND_CONTENT = b"""BT
/F1 12 Tf
72 720 Td
(Hello \\(World\\) \\101) Tj
0 -14 Td
[(ab) -120 (cd)] TJ
20 TL
T*
<48692021> Tj
1 0 0 1 300 400 Tm
(at300) Tj
10 -20 Td
(moved) Tj
5 -30 TD
(td) Tj
T*
(tstar) Tj
ET
BT
/F1 7 Tf
1 0 0 1 280 24 Tm
(Page 1) Tj
ET"""

# hand-derived truth for HAND_CONTENT: (x, y, size, text)
HAND_RUNS = [
    (72.0, 720.0, 12.0, "Hello (World) A"),   # \( \) and octal \101
    (72.0, 706.0, 12.0, "abcd"),              # TJ concatenation
    (72.0, 686.0, 12.0, "Hi !"),              # TL 20 then T*; hex string
    (300.0, 400.0, 12.0, "at300"),            # absolute Tm
    (310.0, 380.0, 12.0, "moved"),            # Td composes onto Tm
    (315.0, 350.0, 12.0, "td"),               # TD moves AND sets TL=30
    (315.0, 320.0, 12.0, "tstar"),            # T* uses the TD leading
    (280.0, 24.0, 7.0, "Page 1"),
]


def _one_page_pdf(content: bytes, filt: bytes = b"",
                  length: bytes = b"") -> bytes:
    stream = b"<< /Length %s%s >>\nstream\n" % (
        length or b"%d" % len(content), filt) + content + b"\nendstream"
    return _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R >>",
        4: stream,
    })


def test_hand_vector_runs_exact():
    p = parse_pdf(_one_page_pdf(HAND_CONTENT))
    assert p is not None and p["pages"] == [(612.0, 792.0)]
    got = [(r["x"], r["y"], r["size"], r["text"]) for r in p["runs"]]
    assert got == HAND_RUNS
    assert [r["run_id"] for r in p["runs"]] == list(range(8))
    assert all(r["part_id"] == 0 for r in p["runs"])
    assert all((r["page_w"], r["page_h"]) == (612.0, 792.0)
               for r in p["runs"])


def test_hand_vector_flate_and_indirect_length():
    """Same content flate-compressed with an INDIRECT /Length object must
    parse to identical runs."""
    comp = zlib.compress(HAND_CONTENT)
    stream = (b"<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n"
              + comp + b"\nendstream")
    pdf = _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R >>",
        4: stream,
        5: b"%d" % len(comp),
    })
    p = parse_pdf(pdf)
    assert p is not None
    assert [(r["x"], r["y"], r["size"], r["text"]) for r in p["runs"]] \
        == HAND_RUNS


def test_mediabox_inheritance_and_contents_array():
    """Two pages WITHOUT their own /MediaBox inherit the root /Pages box;
    page 1's content is split across TWO streams (/Contents array) whose
    concatenation forms one stream."""
    c0 = b"BT /F1 10 Tf 50 500 Td (p0) Tj ET"
    c1a = b"BT /F1 10 Tf 60 400 Td (p1a) Tj"
    c1b = b"0 -12 Td (p1b) Tj ET"
    pdf = _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /MediaBox [0 0 500 600] "
           b"/Kids [ 3 0 R 4 0 R ] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents [ 6 0 R 7 0 R ] >>",
        5: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c0), c0),
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1a), c1a),
        7: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1b), c1b),
    })
    p = parse_pdf(pdf)
    assert p is not None and p["pages"] == [(500.0, 600.0)] * 2
    got = [(r["part_id"], r["x"], r["y"], r["text"]) for r in p["runs"]]
    assert got == [
        (0, 50.0, 500.0, "p0"),
        (1, 60.0, 400.0, "p1a"),
        (1, 60.0, 388.0, "p1b"),   # Td state carries across the boundary
    ]
    # a page with NO effective MediaBox anywhere fails the whole document
    pdf_nobox = pdf.replace(b" /MediaBox [0 0 500 600]", b"")
    assert parse_pdf(pdf_nobox) is None


BASE = _one_page_pdf(HAND_CONTENT)


@pytest.mark.parametrize("mutate", [
    lambda b: b[: len(b) // 2],                               # truncated
    lambda b: b[len(b"%PDF-1.4\n"):],                         # no header
    lambda b: b.replace(b"/Root 1 0 R", b"/Size 6"),          # no /Root
    lambda b: b.replace(b"/Length %d" % len(HAND_CONTENT),
                        b"/Length 99999"),                    # bad length
    lambda b: b.replace(b">>\nstream", b"/Filter /LZWDecode >>\nstream"),
    lambda b: b.replace(b"/Pages 2 0 R", b"/Pages 1 0 R"),    # tree cycle
    # startxref pointing into the body, not at an xref table
    lambda b: b[: b.rindex(b"startxref")] + b"startxref\n9\n%%EOF\n",
])
def test_malformed_fail_whole(mutate):
    assert parse_pdf(mutate(BASE)) is None


def test_quote_show_operators():
    """' and \" both advance to the next line (TL leading) then show; \"'s
    word/char-spacing operands don't move the anchor."""
    content = (b"BT\n/F1 11 Tf\n14 TL\n100 600 Td\n(l1) Tj\n"
               b"(l2) '\n-2 1 (l3) \"\nET")
    p = parse_pdf(_one_page_pdf(content))
    assert p is not None
    assert [(r["x"], r["y"], r["size"], r["text"]) for r in p["runs"]] == [
        (100.0, 600.0, 11.0, "l1"),
        (100.0, 586.0, 11.0, "l2"),
        (100.0, 572.0, 11.0, "l3"),
    ]


def test_ctm_composes_into_run_anchor():
    """q/Q/cm: the emitted anchor is the translation of Tm x CTM."""
    content = (b"q\n1 0 0 1 10 20 cm\n"
               b"BT /F1 12 Tf 50 100 Td (a) Tj ET\n"
               b"Q\n"
               b"BT /F1 12 Tf 50 100 Td (b) Tj ET\n"
               b"2 0 0 3 0 0 cm\n"
               b"BT /F1 12 Tf 10 10 Td (c) Tj ET")
    p = parse_pdf(_one_page_pdf(content))
    assert p is not None
    assert [(r["x"], r["y"], r["text"]) for r in p["runs"]] == [
        (60.0, 120.0, "a"),    # translate(10,20) CTM
        (50.0, 100.0, "b"),    # Q restored identity
        (20.0, 30.0, "c"),     # scale(2,3) CTM
    ]


def test_harmless_ops_skipped():
    """Colors / paths / dash state / marked content are operand-stack
    noise — they must not move or drop text."""
    content = (b"0.5 g\n/GS1 gs\n10 10 m 100 100 l S\n"
               b"30 30 200 40 re f\n/MC BMC\n"
               b"BT /F1 12 Tf 1 0 0 1 50 50 Tm 0.1 Tc 2 Tw (x) Tj ET\n"
               b"EMC")
    p = parse_pdf(_one_page_pdf(content))
    assert p is not None
    assert [(r["x"], r["y"], r["size"], r["text"]) for r in p["runs"]] == [
        (50.0, 50.0, 12.0, "x")
    ]


@pytest.mark.parametrize("content", [
    b"BT /F1 12 Tf 10 10 Td (x) Tj XX ET",   # unknown op in text object
    b"/Im1 Do",                               # form XObject: may hold text
    b"BI /W 1 /H 1 ID \x00 EI",               # inline image: desyncs lexer
    b"(orphan) Tj",                           # show outside BT/ET
])
def test_unsupported_operators_fail_whole(content):
    """ADVICE r4: text shown via/after unsupported operators must not be
    silently discarded as stack noise — the document fails whole."""
    assert parse_pdf(_one_page_pdf(content)) is None


def test_page_without_contents_is_valid_empty_page():
    """/Contents is optional (ISO 32000-1 Table 30): a page without it is
    a valid EMPTY page — zero runs, dims still counted, document OK."""
    c1 = b"BT /F1 10 Tf 60 400 Td (p1) Tj ET"
    pdf = _assemble({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /MediaBox [0 0 500 600] "
           b"/Kids [ 3 0 R 4 0 R ] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        5: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
    })
    p = parse_pdf(pdf)
    assert p is not None and p["pages"] == [(500.0, 600.0)] * 2
    assert [(r["part_id"], r["text"]) for r in p["runs"]] == [(1, "p1")]


def test_incremental_update_prev_chain():
    """Trailer /Prev chains merge newest-first: an appended update that
    replaces the content stream (object 4) must win over the original."""
    import re as _re

    new_c = b"BT /F1 12 Tf 30 40 Td (updated) Tj ET"
    obj = (b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
           % (len(new_c), new_c))
    out = bytearray(BASE)
    obj_off = len(out)
    out += obj
    xref_off = len(out)
    prev_off = int(_re.search(rb"startxref\s+(\d+)", BASE[-256:]).group(1))
    out += b"xref\n4 1\n%010d 00000 n \n" % obj_off
    out += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (prev_off, xref_off))
    p = parse_pdf(bytes(out))
    assert p is not None
    assert [(r["x"], r["y"], r["text"]) for r in p["runs"]] == [
        (30.0, 40.0, "updated")
    ]


def test_incremental_update_freed_object_and_prev_cycle():
    import re as _re

    prev_off = int(_re.search(rb"startxref\s+(\d+)", BASE[-256:]).group(1))
    # (a) newer section FREES object 4 (the /Contents): resolving it must
    # fail the document whole, not fall back to the older live entry
    out = bytearray(BASE)
    xref_off = len(out)
    out += b"xref\n4 1\n0000000000 65535 f \n"
    out += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (prev_off, xref_off))
    assert parse_pdf(bytes(out)) is None
    # (b) /Prev pointing at the SAME section = cycle: fail whole
    out = bytearray(BASE)
    xref_off = len(out)
    out += b"xref\n0 0\n"
    out += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (xref_off, xref_off))
    assert parse_pdf(bytes(out)) is None


def _hand_pdf15(content: bytes = b"BT /F1 12 Tf 72 700 Td (xs) Tj ET",
                w_literal: bytes = b"[1 2 2]",
                break_objstm_header: bool = False,
                predictor: int = 0) -> bytes:
    """Minimal hand-built PDF 1.5: catalog/pages/page packed in an
    UNCOMPRESSED object stream, content stream in the body, raw xref
    stream. Every structural byte below is typed against ISO 32000-1
    §7.5.7/§7.5.8 — independent of the synth generator."""
    import zlib as _z

    packed = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"),
    ]
    hdr, bodies, off = [], [], 0
    for num, body in packed:
        n = num + 90 if break_objstm_header else num
        hdr.append(b"%d %d" % (n, off))
        bodies.append(body)
        off += len(body) + 1
    header = b" ".join(hdr) + b"\n"
    stm_payload = header + b" ".join(bodies)
    objstm = (b"<< /Type /ObjStm /N 3 /First %d /Length %d >>\nstream\n"
              % (len(header), len(stm_payload)) + stm_payload
              + b"\nendstream")
    cont = (b"<< /Length %d >>\nstream\n" % len(content) + content
            + b"\nendstream")

    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    for oid, body in ((4, cont), (5, objstm)):
        offs[oid] = len(out)
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    xref_off = len(out)
    w1, w2, w3 = 1, 2, 2  # packing widths; w_literal may LIE in the dict
    rows = [
        (0, 0, 65535), (2, 5, 0), (2, 5, 1), (2, 5, 2),  # 0 free; 1-3 ObjStm
        (1, offs[4], 0), (1, offs[5], 0), (1, xref_off, 0),  # 4,5,6 body
    ]
    raw = b"".join(t.to_bytes(w1, "big") + a.to_bytes(w2, "big")
                   + b_.to_bytes(w3, "big") for t, a, b_ in rows)
    if predictor >= 10:
        # single Up-filtered row block: prepend filter byte 2 per row
        cols = w1 + w2 + w3
        enc, prev = bytearray(), bytes(cols)
        for r in range(0, len(raw), cols):
            row = raw[r:r + cols]
            enc.append(2)
            enc += bytes((row[j] - prev[j]) & 0xFF for j in range(cols))
            prev = row
        data = _z.compress(bytes(enc))
        parms = (b"/DecodeParms << /Predictor %d /Columns %d >> "
                 % (predictor, cols))
        filt = b"/Filter /FlateDecode "
    else:
        data, parms, filt = raw, b"", b""
    out += (b"6 0 obj\n<< /Type /XRef /W %s /Size 7 %s%s"
            b"/Root 1 0 R /Length %d >>\nstream\n"
            % (w_literal, parms, filt, len(data)) + data
            + b"\nendstream\nendobj\n")
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def test_xref_stream_and_objstm_hand_vector():
    """PDF 1.5 cross-reference stream + object stream, typed by hand:
    catalog/pages/page resolve through ObjStm type-2 entries."""
    p = parse_pdf(_hand_pdf15())
    assert p is not None and p["pages"] == [(612.0, 792.0)]
    assert [(r["x"], r["y"], r["size"], r["text"]) for r in p["runs"]] == [
        (72.0, 700.0, 12.0, "xs")
    ]


def test_xref_stream_png_predictor():
    """Same document with the xref stream rows Up-predicted (/Predictor
    12) and FlateDecoded — decode must invert RFC 2083 filtering."""
    p = parse_pdf(_hand_pdf15(predictor=12))
    assert p is not None
    assert [r["text"] for r in p["runs"]] == ["xs"]


def test_png_unpredict_inverts_all_filters():
    import random as _random

    from sparkdu.pdf import _png_filter_rows, _png_unpredict

    for seed in range(5):
        rng = _random.Random(seed)
        raw = bytes(rng.randrange(256) for _ in range(5 * 13))
        enc = _png_filter_rows(raw, 5, _random.Random(seed + 100))
        assert _png_unpredict(enc, 12, 5) == raw


@pytest.mark.parametrize("mutate", [
    lambda: _hand_pdf15(w_literal=b"[1 2]"),       # /W must have 3 ints
    lambda: _hand_pdf15(break_objstm_header=True),  # ObjStm num mismatch
    lambda: _hand_pdf15().replace(b"/Type /XRef", b"/Type /XXXX"),
    lambda: _hand_pdf15(predictor=12).replace(
        b"/Predictor 12", b"/Predictor 5"),         # TIFF predictor: out
    lambda: _hand_pdf15().replace(b"/Size 7", b"/Size 9"),  # short data
])
def test_pdf15_malformed_fail_whole(mutate):
    assert parse_pdf(mutate()) is None


def test_hybrid_xrefstm_precedence():
    """Hybrid-reference file (§7.5.8.4): an appended classic section with
    ZERO entries but an /XRefStm whose entries re-point the content
    stream — the stream's entry must win over the /Prev chain."""
    import re as _re

    new_c = b"BT /F1 12 Tf 10 20 Td (hybrid) Tj ET"
    prev_off = int(_re.search(rb"startxref\s+(\d+)", BASE[-256:]).group(1))
    out = bytearray(BASE)
    new4_off = len(out)
    out += (b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (len(new_c), new_c))
    xstm_off = len(out)
    rows = [(1, new4_off, 0), (1, xstm_off, 0)]
    raw = b"".join(t.to_bytes(1, "big") + a.to_bytes(2, "big")
                   + b_.to_bytes(2, "big") for t, a, b_ in rows)
    out += (b"7 0 obj\n<< /Type /XRef /W [1 2 2] /Index [4 1 7 1] "
            b"/Size 8 /Root 1 0 R /Length %d >>\nstream\n" % len(raw)
            + raw + b"\nendstream\nendobj\n")
    cls_off = len(out)
    out += (b"xref\n0 0\ntrailer\n<< /Size 8 /Root 1 0 R /Prev %d "
            b"/XRefStm %d >>\nstartxref\n%d\n%%%%EOF\n"
            % (prev_off, xstm_off, cls_off))
    p = parse_pdf(bytes(out))
    assert p is not None
    assert [(r["x"], r["y"], r["text"]) for r in p["runs"]] == [
        (10.0, 20.0, "hybrid")
    ]


def test_generator_pdf15_differential():
    """Every synthetic doc: the 1.5 assembly parses to runs IDENTICAL to
    the classic 1.4 assembly (truncated docs fail whole in both)."""
    from sparkdu.pdf import synth_pdf15_bytes, synth_pdf_bytes

    for i in range(0, 36):
        c, t14 = synth_pdf_bytes(i)
        m, t15 = synth_pdf15_bytes(i)
        assert t14 == t15
        pc, pm = parse_pdf(c), parse_pdf(m)
        if i % 11 == 10:
            assert pc is None and pm is None
            continue
        assert pc is not None and pm is not None
        assert pc["pages"] == pm["pages"]
        assert pc["runs"] == pm["runs"]


def test_string_and_value_parsers():
    s, _ = _parse_literal_string(b"(a\\(b\\)c\\\\d\\n\\101)", 0)
    assert s == b"a(b)c\\d\nA"
    s, _ = _parse_literal_string(b"(nest(ed)ok)", 0)
    assert s == b"nest(ed)ok"
    s, _ = _parse_hex_string(b"<4 86\n92 02 1>", 0)   # ws ignored
    assert s == b"Hi !"
    s, _ = _parse_hex_string(b"<484>", 0)             # odd: pad with 0
    assert s == b"H@"
    v, _ = _parse_value(b"<< /A [1 2.5 -3] /B (x) /C /N /D 7 0 R >>", 0)
    assert v["A"] == [1, 2.5, -3] and v["B"] == b"x" and v["C"] == "N"
    assert v["D"].num == 7
    v, _ = _parse_value(b"[ true false null ]", 0)
    assert v == [True, False, None]


def test_spark_runs_plan_and_fixture(spark):
    """The Spark stage parses the committed fixture as a pure map (zero
    exchanges); truncated docs yield no rows; the size>=9 content rule
    strips exactly the planted footer runs (one per page)."""
    import re

    from pyspark.sql import functions as F

    from sparkdu.harness import fx
    from sparkdu.pdf import pdf_runs

    runs = pdf_runs(spark.read.parquet(fx("pdf")))
    plan = runs._sc._jvm.PythonSQLUtils.explainString(
        runs._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan

    runs = runs.cache()
    try:
        assert runs.filter("doc_id % 11 = 10").count() == 0
        # exactly one small-type footer per (doc, page), nothing else < 9
        small = runs.filter("size < 9.0").groupBy("doc_id", "part_id").agg(
            F.count("*").alias("n"))
        assert small.filter("n != 1").count() == 0
        assert (small.count()
                == runs.select("doc_id", "part_id").distinct().count())
        # geometry sanity: anchors inside the effective page box
        assert runs.filter(
            "x < 0 OR x > page_w OR y < 0 OR y > page_h").count() == 0
        # parsed output matches the generator truth EXACTLY (all columns)
        truth = spark.read.parquet(fx("pdf_runs_truth"))
        assert runs.exceptAll(truth).count() == 0
        assert truth.exceptAll(runs).count() == 0
    finally:
        runs.unpersist()


def test_geom_blocks_recover_true_structure(spark):
    """The semantic anchor for the geom_blocks keys (their SQL oracles
    mirror the islands mechanism; THIS asserts the mechanism recovers the
    truth): geometry-only agglomeration must be a BIJECTION with the
    generator's real structure — PAGE-XML lines -> their parent regions,
    PDF content runs -> their BT blocks (via the planted b<k>l<i> text
    labels; lines whose text was rewritten for escape coverage carry no
    label and are skipped)."""
    from pyspark.sql import functions as F

    from sparkdu.harness import fx
    from sparkdu.pagexml import pagexml_nodes
    from sparkdu.pdf import pdf_runs
    from sparkdu.staging import _geom_vblocks

    def assert_bijection(df, true_col):
        a = df.groupBy("doc_id", "part_id", "block_id").agg(
            F.countDistinct(true_col).alias("n"))
        assert a.filter("n != 1").count() == 0, f"block spans 2 {true_col}"
        b = df.groupBy("doc_id", "part_id", true_col).agg(
            F.countDistinct("block_id").alias("n"))
        assert b.filter("n != 1").count() == 0, f"{true_col} split"

    lines = (
        pagexml_nodes(spark.read.parquet(fx("pagexml")))
        .filter("kind = 'line'")
        .select("doc_id", "part_id", "node_id", "parent_id", "y1", "y2")
    )
    assert_bijection(_geom_vblocks(lines, 5.0), "parent_id")

    runs = (
        pdf_runs(spark.read.parquet(fx("pdf")))
        .filter("size >= 9.0")
        .withColumn("blk", F.regexp_extract("text", r"^d\d+p\d+b(\d+)l", 1))
        .select(
            "doc_id", "part_id",
            F.col("run_id").alias("node_id"), "blk",
            (F.col("page_h") - (F.col("y") + F.col("size"))).alias("y1"),
            (F.col("page_h") - F.col("y")).alias("y2"),
        )
    )
    # islands over ALL content runs; the label check then skips the
    # escape-coverage lines whose text carries no label
    assert_bijection(
        _geom_vblocks(runs, 5.0).filter("blk != ''"), "blk")


def test_parse_pdf_never_raises_fuzz():
    """Total-function contract: arbitrary byte mutations of valid 1.4 and
    1.5 documents (and raw garbage) must yield None or a parse dict —
    never an exception escaping parse_pdf."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparkdu.pdf import synth_pdf15_bytes

    b15 = synth_pdf15_bytes(0)[0]

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=64), st.integers(0, min(len(BASE), len(b15)) - 1),
           st.integers(0, 32))
    def run(junk, cut, drop):
        for base in (BASE, b15):
            for b in (junk, base[:cut] + junk + base[cut + drop:]):
                out = parse_pdf(b)
                assert out is None or isinstance(out, dict)

    run()
