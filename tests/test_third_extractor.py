"""Adversarial parser-twin de-correlation (VERDICT r1 item 10).

oracle/extract.py and sparkdu/parse.py are same-author twins built on the
same stdlib HTMLParser skeleton, so agreement between them cannot catch a
shared misreading of SPEC.md. This module adds a THIRD, table-driven
implementation built on a regex token stream (no HTMLParser anywhere) and
checks all three produce byte-identical extracted text, spans, and part
assignment on:

  - every tokenization-safe fixture page (well-formed generator output), and
  - a deterministic mutation corpus (case-mangled tags, duplicate/stray end
    tags, self-closed blocks, comments, entities, unclosed elements, hr
    page-breaks in odd positions).

Scope: SPEC SS2's tokenization is pinned to CPython's HTMLParser, so the
third implementation can only be expected to agree where tokenization is
unambiguous (no mid-tag truncation, no stray '<' in text, no charref edge
cases HTMLParser resolves with its own tables). Mutants are constructed to
stay inside that space; the nasty corpus beyond it is covered by the
hypothesis fuzz suite (twin agreement) in test_property_fuzz.py.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

import pytest

from oracle import extract as orc
from sparkdu import fixtures
from sparkdu import parse as P

VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
SKIP = frozenset("script style noscript template head iframe svg math object".split())
BOILER = frozenset("nav footer aside header form".split())
BLOCK = frozenset(
    (
        "p div li td th h1 h2 h3 h4 h5 h6 blockquote pre article section main "
        "body title ul ol table tr thead tbody tfoot figure figcaption dd dt dl "
        "caption address summary details nav header footer aside form"
    ).split()
)

_TOKEN = re.compile(r"<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[!?/]?[a-zA-Z][^>]*>|<[/!?]>?|[^<]+", re.S)
_ATTR = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>/]*))?"""
)
_WS = re.compile(r"\s+")


def third_extract(html_str: str) -> dict:
    """Regex-token-stream implementation of SPEC SS2/SS3/SS4(v1 rule)/SS5."""
    # element: [tag, node_id, part_id, depth, is_block, anc_boiler,
    #           chunks, link_chunks, n_links]
    stack: list[list] = []
    nodes: list[dict] = []
    next_id = 0
    part = 0
    skip_depth = 0
    a_depth = 0
    boiler_depth = 0

    def owner():
        for el in reversed(stack):
            if el[4]:
                return el
        return None

    def add_text(s: str) -> None:
        if skip_depth or not s:
            return
        o = owner()
        if o is None:
            return
        o[6].append(s)
        if a_depth:
            o[7].append(s)

    def finalize(el) -> None:
        nonlocal a_depth, skip_depth, boiler_depth
        tag = el[0]
        if tag == "a" and a_depth:
            a_depth -= 1
        if tag in SKIP and skip_depth:
            skip_depth -= 1
        if tag in BOILER and boiler_depth:
            boiler_depth -= 1
        if not el[4]:
            return
        raw = "".join(el[6])
        text = _WS.sub(" ", unicodedata.normalize("NFC", raw)).strip()
        if not text:
            return
        total = sum(len(c) for c in el[6])
        link = sum(len(c) for c in el[7])
        nodes.append(
            {
                "node_id": el[1],
                "part_id": el[2],
                "tag": tag,
                "depth": el[3],
                "text": text,
                "n_chars": len(text),
                "link_density": (link / total) if total else 0.0,
                "anc_boiler": el[5],
            }
        )

    def open_tag(tag: str) -> None:
        nonlocal next_id, part, skip_depth, a_depth, boiler_depth
        nid = next_id
        next_id += 1
        if tag == "br":
            add_text(" ")
        if tag == "hr":
            part += 1
        if tag in VOID:
            return
        if tag == "a":
            a_depth += 1
            o = owner()
            if o is not None and skip_depth == 0:
                o[8] += 1
        if tag in SKIP:
            skip_depth += 1
        if tag in BOILER:
            boiler_depth += 1
        stack.append(
            [tag, nid, part, len(stack), tag in BLOCK, boiler_depth > 0, [], [], 0]
        )

    def close_tag(tag: str) -> None:
        if tag in VOID:
            return
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][0] == tag:
                while len(stack) > i:
                    finalize(stack.pop())
                return

    for m in _TOKEN.finditer(html_str):
        tok = m.group(0)
        if not tok.startswith("<"):
            add_text(_html.unescape(tok))
            continue
        if tok.startswith("<!--") or tok.startswith("<![CDATA[") or tok.startswith("<!") or tok.startswith("<?"):
            continue
        body = tok[1:-1]
        selfclose = body.endswith("/")
        if selfclose:
            body = body[:-1]
        if body.startswith("/"):
            name = re.match(r"[a-zA-Z][-a-zA-Z0-9:]*", body[1:])
            if name:
                close_tag(name.group(0).lower())
            continue
        name_m = re.match(r"[a-zA-Z][-a-zA-Z0-9:]*", body)
        if not name_m:
            continue
        tag = name_m.group(0).lower()
        open_tag(tag)
        if selfclose and tag not in VOID:
            close_tag(tag)
    while stack:
        finalize(stack.pop())

    content = sorted(
        (n for n in nodes if (not n["anc_boiler"]) and n["link_density"] <= 0.5),
        key=lambda d: d["node_id"],
    )
    parts_out, spans, off = [], [], 0
    for nd in content:
        spans.append((nd["node_id"], off, off + nd["n_chars"]))
        parts_out.append(nd["text"])
        off += nd["n_chars"] + 1
    return {
        "extracted_text": "\n".join(parts_out),
        "spans": spans,
        "n_blocks": len(content),
        "node_parts": sorted((n["node_id"], n["part_id"]) for n in nodes),
    }


# ----------------------------------------------------------------------
# deterministic mutation corpus (tokenization-safe transforms)
# ----------------------------------------------------------------------

def _mutants() -> list:
    base = (
        "<html><head><title>T&amp;t</title></head><body>"
        "<nav><a href='/x'>menu one</a></nav>"
        "<div class='a'><p>alpha beta &gt; gamma</p><p>delta epsilon</p></div>"
        '<hr class="page-break">'
        "<div><p>second part text here</p></div>"
        "<footer>bye</footer></body></html>"
    )
    muts = [
        base,
        base.replace("<div", "<DIV").replace("</div>", "</DiV>"),
        base.replace("</p>", "</p></p>"),                      # duplicate end
        base.replace("<p>delta", "<p>delta<p>nested-sibling"),  # unclosed p
        base.replace("<hr class=\"page-break\">", "<hr/><hr />"),  # 2 breaks
        base.replace("<p>alpha", "<p >alpha").replace("<hr ", "<hr  "),
        base.replace("</body></html>", ""),                    # EOF close
        base.replace("<p>second", "<!-- c --><p>second"),
        base.replace("gamma", "&#65;&#x42; gamma"),
        base.replace("<footer>bye</footer>", "<footer>bye</footer></div></span>"),
        base.replace("<p>alpha", "<br><p>alpha<br/>"),
        "<body><p>only text, no html shell</p><hr><p>tail</p>",
    ]
    # a few generator pages mutated: tag case + duplicated ends + extra hr
    for doc_id in (3, 12, 30, 57):  # 3, 12, 30 hit the multi-part branch mix
        s = fixtures.gen_page_html(doc_id).decode("utf-8")
        muts.append(s.replace("<div", "<DIV").replace("</div>", "</DIV>"))
        muts.append(s.replace("</li>", "</li></li>") + "</p>")
        muts.append(s.replace("<table>", "<hr><table>"))
    return muts


def _oracle_view(html_str: str) -> dict:
    nodes = orc.parse_nodes(html_str)
    orc.classify(nodes)
    out = orc.assemble(nodes, truncated=False)
    return {
        "extracted_text": out["extracted_text"],
        "spans": [(s["node_id"], s["start"], s["end"]) for s in out["spans"]],
        "n_blocks": out["n_blocks"],
        "node_parts": sorted((n["node_id"], n["part_id"]) for n in nodes),
    }


def _sparkdu_view(html_str: str) -> dict:
    blocks = P.parse_blocks(html_str)
    blocks.sort(key=lambda r: r[0])
    keep = [P.rule_is_content(r[7], r[11]) for r in blocks]
    parts_out, spans, off = [], [], 0
    for r, k in zip(blocks, keep):
        if not k:
            continue
        spans.append((r[0], off, off + r[5]))
        parts_out.append(r[4])
        off += r[5] + 1
    return {
        "extracted_text": "\n".join(parts_out),
        "spans": spans,
        "n_blocks": len(spans),
        "node_parts": sorted((r[0], r[-1]) for r in blocks),
    }


@pytest.mark.parametrize("i", range(len(_mutants())))
def test_three_way_agreement_on_mutants(i):
    s = _mutants()[i]
    o, t, d = _oracle_view(s), third_extract(s), _sparkdu_view(s)
    assert o["extracted_text"].encode() == t["extracted_text"].encode(), f"mutant {i}: oracle vs third"
    assert o["extracted_text"].encode() == d["extracted_text"].encode(), f"mutant {i}: oracle vs sparkdu"
    assert o["spans"] == t["spans"] == d["spans"], f"mutant {i}"
    assert o["node_parts"] == t["node_parts"] == d["node_parts"], f"mutant {i}"


def test_three_way_agreement_on_fixture_pages():
    """Every well-formed generator page (skip chopped: mid-tag truncation is
    HTMLParser-recovery territory, outside the third impl's scope)."""
    n_checked = 0
    for doc_id in range(0, 120):
        if (doc_id % 200) == 13:
            continue  # chopped page
        b = fixtures.gen_page_html(doc_id)
        s, _trunc = P.sniff_decode(b)
        o, t, d = _oracle_view(s), third_extract(s), _sparkdu_view(s)
        assert o["extracted_text"].encode() == t["extracted_text"].encode(), doc_id
        assert o["extracted_text"].encode() == d["extracted_text"].encode(), doc_id
        assert o["spans"] == t["spans"] == d["spans"], doc_id
        assert o["node_parts"] == t["node_parts"] == d["node_parts"], doc_id
        n_checked += 1
    assert n_checked > 100
