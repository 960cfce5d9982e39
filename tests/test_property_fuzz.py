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
