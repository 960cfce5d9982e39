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


# ------------------------------------------------------------- codec fuzz


def _encode_png(px):
    """Encode an arbitrary uint8 (h, w, ch) array as PNG, cycling all five
    filters (reuses the fixture filter math; the decoder's independence is
    established by the hand-computed vectors in test_multimodal.py — this
    property run stresses SHAPES and data the fixtures never hit)."""
    import zlib

    import numpy as np

    from sparkdu.fixtures import _png_chunk, _png_filter_row

    h, w, ch = px.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    stride = w * ch
    raw = px.reshape(h, stride).astype(np.int32)
    zeros = np.zeros(ch, dtype=np.int32)
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        cur = raw[r]
        ftype = r % 5
        left = np.concatenate([zeros, cur[:-ch]]) if stride > ch else np.zeros(stride, np.int32)
        pleft = np.concatenate([zeros, prior[:-ch]]) if stride > ch else np.zeros(stride, np.int32)
        lines.append(ftype)
        lines += _png_filter_row(ftype, cur, left, prior, pleft)
        prior = cur
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines))) + _png_chunk(b"IEND", b"")
    )


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    """Any shape (1x1, 1xN, Nx1 included) and any pixel content round-trips
    byte-exactly through encode -> decode."""
    import numpy as np

    from sparkdu.multimodal import decode_png

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
    got = decode_png(_encode_png(px))
    assert got is not None and got.shape == px.shape
    assert (got == px).all()


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.integers(0, 255), min_size=1, max_size=600),
    st.integers(2, 8),
)
def test_gif_lzw_roundtrip_property(indices, min_code):
    """Arbitrary index streams round-trip through the LZW pair, including
    streams long enough to force code-width growth."""
    from sparkdu.fixtures import _gif_lzw_encode
    from sparkdu.multimodal import _gif_lzw_decode

    n_colors = 1 << min_code
    idx = [i % n_colors for i in indices]
    data = _gif_lzw_encode(idx, min_code)
    out = _gif_lzw_decode(data, min_code, len(idx))
    assert out is not None and list(out) == idx


def test_gif_lzw_table_reset_exercised():
    """A long low-entropy stream pushes the dictionary past 4096 and forces
    the mid-stream clear/reset path on BOTH sides."""
    import numpy as np

    from sparkdu.fixtures import _gif_lzw_encode
    from sparkdu.multimodal import _gif_lzw_decode

    rng = np.random.RandomState(7)
    idx = rng.randint(0, 4, 200_000).tolist()
    data = _gif_lzw_encode(idx, 2)
    out = _gif_lzw_decode(data, 2, len(idx))
    assert out is not None and list(out) == idx
