"""Property fuzz: oracle and sparkdu parsers agree byte-for-byte on
arbitrary (including malformed) HTML — the strongest form of T3."""

from hypothesis import given, settings
from hypothesis import strategies as st

from oracle import extract as orc
from sparkdu import parse as sp

TAGS = ["p", "div", "span", "b", "nav", "td", "table", "li", "script", "br",
        "a", "h1", "footer", "x-custom", "P", "DIV"]

atom = st.one_of(
    st.text(min_size=0, max_size=12),
    st.sampled_from([
        "&amp;", "&nbsp;", "&#233;", "&bogus;", "<!-- c -->", "<![CDATA[x]]>",
        "\x00", " ", "　", "مرحبا", "你好", "\n\t ", "<", ">", "=",
    ]),
)


@st.composite
def html_fragment(draw, depth=0):
    n = draw(st.integers(0, 4 if depth < 3 else 0))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(atom))
        elif kind == 1:
            t = draw(st.sampled_from(TAGS))
            attrs = draw(st.sampled_from(["", ' class="c1"', " id=x id=y", " data-k"]))
            inner = draw(html_fragment(depth + 1))
            close = draw(st.sampled_from([f"</{t}>", "", f"</{draw(st.sampled_from(TAGS))}>"]))
            parts.append(f"<{t}{attrs}>{inner}{close}")
        elif kind == 2:
            parts.append(f"<{draw(st.sampled_from(TAGS))}/>")
        else:
            parts.append(draw(st.sampled_from(["</p>", "</div>", "<p", "< notatag"])))
    return "".join(parts)


@given(html_fragment())
@settings(max_examples=300, deadline=None)
def test_fuzz_parity(frag):
    b = frag.encode("utf-8", errors="replace")
    o = orc.extract_page("u", b)
    t, nb, spans, _ = sp.extract_doc(b)
    assert o["extracted_text"].encode("utf-8") == t.encode("utf-8"), repr(frag)
    assert o["n_blocks"] == nb
    assert [(d["node_id"], d["start"], d["end"]) for d in o["spans"]] == list(spans)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_fuzz_raw_bytes_never_crash_and_agree(b):
    o = orc.extract_page("u", b)
    t, nb, spans, _ = sp.extract_doc(b)
    assert o["extracted_text"].encode("utf-8") == t.encode("utf-8")


# ---------------------------------------------------------------------
# r2 roundtrip properties: warcish container and ingest merge/split are
# exact inverses on arbitrary inputs (no Spark needed — pure functions)
# ---------------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=40).filter(lambda s: "\x00" not in s),
            st.integers(0, 2**50),          # epoch_us
            st.binary(min_size=0, max_size=2000),
        ),
        min_size=0,
        max_size=12,
    )
)
def test_warcish_shard_roundtrip_property(rows):
    import datetime

    from sparkdu.sources import read_shard, write_shard

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "s.warcish")
        write_shard(p, rows)
        got = list(read_shard(p))
    assert len(got) == len(rows)
    for (url, epoch_us, html), (gu, gts, gh) in zip(rows, got):
        assert gu == url and gh == html
        want = datetime.datetime.fromtimestamp(
            epoch_us / 1_000_000, datetime.timezone.utc
        ).replace(tzinfo=None)
        assert gts == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=8))
def test_part_sep_split_merge_identity_property(frags):
    """merge/split on PART_SEP are inverses iff no fragment contains the
    separator — same precondition the generator guarantees."""
    from sparkdu.fixtures import PART_SEP

    frags = [f for f in frags if PART_SEP not in f] or [""]
    doc = PART_SEP.join(frags)
    assert doc.split(PART_SEP) == frags
