"""PAGE-XML ingest gates (sparkdu/pagexml.py).

The fixture key (scan_pagexml_nodes) cross-checks parser vs generator —
same-author twins — so the load-bearing gate here is the HAND-WRITTEN
vector: a document typed out against the public PAGE schema with its node
rows derived by hand, plus the malformed-rejection matrix and a downstream
composition check (parsed nodes drive the reading-order sort)."""

import pytest

from sparkdu.pagexml import _bbox, parse_pagexml

HAND_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2017-07-15">
  <Metadata><Creator>hand</Creator></Metadata>
  <Page imageFilename="p.png" imageWidth="1000" imageHeight="1500">
    <ReadingOrder>
      <OrderedGroup id="g">
        <RegionRefIndexed index="0" regionRef="rB"/>
        <RegionRefIndexed index="1" regionRef="rA"/>
      </OrderedGroup>
    </ReadingOrder>
    <TextRegion id="rA" type="heading">
      <Coords points="100,50 900,50 900,120 100,120"/>
      <TextLine id="rA_l0">
        <Coords points="105,55 895,55 895,115 105,115"/>
        <TextEquiv><Unicode>The Title</Unicode></TextEquiv>
      </TextLine>
      <TextEquiv><Unicode>The Title</Unicode></TextEquiv>
    </TextRegion>
    <TextRegion id="rB" type="paragraph">
      <Coords points="500,1400 100,200 900,200"/>
      <TextLine id="rB_l0">
        <Coords points="110,210 890,210 890,300 110,300"/>
        <TextEquiv><Unicode>first line</Unicode></TextEquiv>
      </TextLine>
      <TextLine id="rB_l1">
        <Coords points="110,310 890,310 890,400 110,400"/>
      </TextLine>
      <TextEquiv><Unicode>first line</Unicode></TextEquiv>
    </TextRegion>
  </Page>
</PcGts>
"""


def test_hand_vector_nodes_exact():
    """Hand-derived truth: rA (heading, ro_index 1) with one line; rB
    (paragraph, TRIANGLE polygon -> bbox 100..900 x 200..1400, ro_index 0)
    with two lines, the second without TextEquiv (text='')."""
    p = parse_pagexml(HAND_XML)
    assert p is not None and p["pages"] == [(1000.0, 1500.0)]
    n = p["nodes"]
    assert {x["part_id"] for x in n} == {0}
    assert [(x["node_id"], x["parent_id"], x["kind"]) for x in n] == [
        (0, -1, "region"), (1, 0, "line"),
        (2, -1, "region"), (3, 2, "line"), (4, 2, "line"),
    ]
    assert (n[0]["rtype"], n[0]["ro_index"], n[0]["text"]) == (
        "heading", 1, "The Title")
    assert (n[0]["x1"], n[0]["y1"], n[0]["x2"], n[0]["y2"]) == (
        100.0, 50.0, 900.0, 120.0)
    assert (n[1]["text"], n[1]["ro_index"]) == ("The Title", -1)
    # triangle polygon: bbox from min/max over ALL vertices
    assert (n[2]["rtype"], n[2]["ro_index"]) == ("paragraph", 0)
    assert (n[2]["x1"], n[2]["y1"], n[2]["x2"], n[2]["y2"]) == (
        100.0, 200.0, 900.0, 1400.0)
    assert n[3]["text"] == "first line"
    assert n[4]["text"] == ""            # TextEquiv absent -> ''
    assert n[3]["rtype"] == n[4]["rtype"] == "paragraph"  # inherited


@pytest.mark.parametrize("mutate", [
    lambda b: b[: len(b) // 2],                               # truncated
    lambda b: b.replace(b"<PcGts", b"<NotPage", 1)
               .replace(b"</PcGts>", b"</NotPage>", 1),       # wrong root
    lambda b: b.replace(b'imageWidth="1000" ', b""),          # no dims
    lambda b: b.replace(b'points="100,50 900,50 900,120 100,120"',
                        b'points="100,50 900,50"'),           # 2-pt polygon
    lambda b: b.replace(b'points="110,210 890,210 890,300 110,300"',
                        b'points="110,210 890,abc 890,300 110,300"'),
    lambda b: b.replace(b'index="1"', b'index="x"'),          # bad RO index
])
def test_malformed_fail_whole(mutate):
    assert parse_pagexml(mutate(HAND_XML)) is None


def test_bbox_helper():
    assert _bbox("1,2 3,4 5,0") == (1.0, 0.0, 5.0, 4.0)
    assert _bbox("1,2 3,4") is None
    assert _bbox("1,2 3,4 5") is None
    assert _bbox("a,b c,d e,f") is None


def test_namespace_agnostic_and_unnamespaced():
    p1 = parse_pagexml(HAND_XML.replace(b"2017-07-15", b"2013-07-15"))
    p2 = parse_pagexml(
        HAND_XML.replace(
            b'<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/'
            b'pagecontent/2017-07-15">', b"<PcGts>")
    )
    base = parse_pagexml(HAND_XML)
    assert p1 == base and p2 == base


def test_spark_nodes_and_reading_order(spark):
    """Composition: the Spark stage parses the committed fixture, its plan
    is a pure map (zero exchanges), and the parsed regions drive the
    engine's reading-order sort — ordering by (ro_index else y1/x1) per
    doc matches the generator's ReadingOrder (reversed document order)."""
    import re

    from pyspark.sql import functions as F

    from sparkdu.harness import fx
    from sparkdu.pagexml import pagexml_nodes

    df = spark.read.parquet(fx("pagexml"))
    nodes = pagexml_nodes(df)
    plan = nodes._sc._jvm.PythonSQLUtils.explainString(
        nodes._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan

    regions = nodes.filter("kind = 'region'").cache()
    try:
        # truncated docs (doc_id % 11 == 10) yield no rows at all
        assert regions.filter("doc_id % 11 = 10").count() == 0
        assert nodes.filter("doc_id % 11 = 10").count() == 0
        # ReadingOrder is reversed document order in the synth, PER PAGE:
        # the region with the LOWEST node_id carries that page's HIGHEST
        # ro_index
        agg = regions.groupBy("doc_id", "part_id").agg(
            F.max("ro_index").alias("max_ro"),
            F.count("*").alias("n_regions"),
            F.min_by("ro_index", "node_id").alias("ro_of_first"),
        )
        bad = agg.filter(
            (F.col("max_ro") != F.col("n_regions") - 1)
            | (F.col("ro_of_first") != F.col("max_ro"))
        )
        assert bad.count() == 0
        # geometry sanity on every node: non-degenerate boxes inside page
        assert nodes.filter(
            "x2 <= x1 OR y2 <= y1 OR x1 < 0 OR y1 < 0"
        ).count() == 0
    finally:
        regions.unpersist()


def test_multipage_mpxml_parts():
    """.mpxml-style multi-page document: two <Page> elements -> part_id 0
    and 1, node ids document-global, ReadingOrder page-local."""
    two_page = HAND_XML.replace(
        b"</Page>\n</PcGts>",
        b"""</Page>
  <Page imageFilename="p2.png" imageWidth="800" imageHeight="900">
    <TextRegion id="r2A" type="paragraph">
      <Coords points="10,10 790,10 790,890 10,890"/>
      <TextLine id="r2A_l0">
        <Coords points="12,12 788,12 788,100 12,100"/>
        <TextEquiv><Unicode>page two line</Unicode></TextEquiv>
      </TextLine>
    </TextRegion>
  </Page>
</PcGts>""",
    )
    p = parse_pagexml(two_page)
    assert p is not None
    assert p["pages"] == [(1000.0, 1500.0), (800.0, 900.0)]
    n = p["nodes"]
    assert [x["part_id"] for x in n] == [0, 0, 0, 0, 0, 1, 1]
    assert [x["node_id"] for x in n] == list(range(7))   # document-global
    assert (n[5]["kind"], n[5]["ro_index"]) == ("region", -1)  # no RO on p2
    assert n[6]["text"] == "page two line"
    # second page malformed -> the WHOLE document fails
    assert parse_pagexml(
        two_page.replace(b'imageWidth="800" ', b"")
    ) is None


def test_nonfinite_coords_fail_whole():
    """float('nan')/float('inf') don't raise ValueError, so _bbox must
    reject them explicitly: a NaN bbox would order differently under
    Python sorted() vs Spark array_sort, silently breaking the CLI-leg
    assembly twin. Fail-whole, like every other malformed geometry."""
    ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
    for bad in ("nan,0 nan,10 nan,20", "inf,0 1,10 2,20",
                "1e999,0 1,10 2,20"):
        xml = (f'<PcGts xmlns="{ns}"><Page imageWidth="100" '
               f'imageHeight="100"><TextRegion id="r0" type="paragraph">'
               f'<Coords points="{bad}"/><TextEquiv><Unicode>t</Unicode>'
               f"</TextEquiv></TextRegion></Page></PcGts>").encode()
        assert parse_pagexml(xml) is None, bad
