"""Normative main-content extraction oracle — SPEC.md v1, stdlib only.

Single-threaded, clarity-first reference implementation of the extraction
semantics (re-expression of TranskribusDU's parse -> classify -> reading-order
-> emit pipeline; upstream loci: graph/Graph.parseDocFile, graph/Block,
tasks/* NodeType label maps — see SURVEY.md SS2, citations [U] there).

The Spark package must NOT import this module (enforced by a test); the two
implementations agree byte-for-byte per url, which is the correctness gate.
"""

from __future__ import annotations

import codecs
import json
import math
import re
import string
import unicodedata
from html.parser import HTMLParser

MAX_HTML_BYTES = 8 * 2**20
PIPELINE_VERSION_RULE = "1.0.0"
PIPELINE_VERSION_MODEL = "1.1.0"
PIPELINE_VERSION_MP = "1.2.0"


def model_version(model) -> str:
    if model is None:
        return PIPELINE_VERSION_RULE
    return PIPELINE_VERSION_MP if model.get("mp") else PIPELINE_VERSION_MODEL
TRUNCATION_MARKER = "…[truncated]"

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
SKIP_TAGS = frozenset(
    "script style noscript template head iframe svg math object".split()
)
BOILER_TAGS = frozenset("nav footer aside header form".split())
BLOCK_TAGS = frozenset(
    (
        "p div li td th h1 h2 h3 h4 h5 h6 blockquote pre article section main "
        "body title ul ol table tr thead tbody tfoot figure figcaption dd dt dl "
        "caption address summary details nav header footer aside form"
    ).split()
)

_CHARSET_RE = re.compile(r'charset\s*=\s*["\']?([a-z0-9_\-:]+)')
_WS_RE = re.compile(r"\s+")
_PUNCT = frozenset(string.punctuation)


def decode_html(b: bytes | None) -> tuple[str, bool]:
    """SPEC.md SS1: (html_str, truncated)."""
    if b is None:
        b = b""
    truncated = len(b) > MAX_HTML_BYTES
    if truncated:
        b = b[:MAX_HTML_BYTES]
    if b.startswith(b"\xef\xbb\xbf"):
        enc = "utf-8-sig"
    elif b.startswith(b"\xff\xfe"):
        enc = "utf-16-le"
    elif b.startswith(b"\xfe\xff"):
        enc = "utf-16-be"
    else:
        head = b[:4096].decode("latin-1").lower()
        m = _CHARSET_RE.search(head)
        enc = "utf-8"
        if m:
            try:
                codecs.lookup(m.group(1))
                enc = m.group(1)
            except LookupError:
                enc = "utf-8"
    try:
        return b.decode(enc, errors="replace"), truncated
    except LookupError:
        return b.decode("utf-8", errors="replace"), truncated


def normalize_text(raw: str) -> str:
    """SPEC.md SS3."""
    return _WS_RE.sub(" ", unicodedata.normalize("NFC", raw)).strip()


class _Open:
    __slots__ = ("tag", "node_id", "part_id", "depth", "is_block", "anc_boiler",
                 "attrs", "chunks", "link_chunks", "n_links")

    def __init__(self, tag, node_id, part_id, depth, is_block, anc_boiler, attrs):
        self.tag = tag
        self.node_id = node_id
        self.part_id = part_id
        self.depth = depth
        self.is_block = is_block
        self.anc_boiler = anc_boiler
        self.attrs = attrs
        self.chunks: list[str] = []       # raw text chunks owned by this block
        self.link_chunks: list[str] = []  # subset emitted while inside <a>
        self.n_links = 0


class _BlockParser(HTMLParser):
    """Emit SPEC.md SS2 node records for one document."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[_Open] = []
        self.nodes: list[dict] = []
        self.next_id = 0
        self.part = 0        # SPEC SS2 pagination counter (<hr> increments)
        self.skip_depth = 0  # count of open SKIP_TAGS elements
        self.a_depth = 0     # count of open <a> elements

    # -- helpers ---------------------------------------------------------
    def _owner(self) -> _Open | None:
        for el in reversed(self.stack):
            if el.is_block:
                return el
        return None

    def _add_text(self, data: str) -> None:
        if self.skip_depth > 0 or not data:
            return
        owner = self._owner()
        if owner is None:
            return
        owner.chunks.append(data)
        if self.a_depth > 0:
            owner.link_chunks.append(data)

    def _finalize(self, el: _Open) -> None:
        if el.tag == "a" and self.a_depth > 0:
            self.a_depth -= 1
        if el.tag in SKIP_TAGS and self.skip_depth > 0:
            self.skip_depth -= 1
        if not el.is_block:
            return
        raw = "".join(el.chunks)
        text = normalize_text(raw)
        if not text:
            return
        total_raw = sum(len(c) for c in el.chunks)
        link_raw = sum(len(c) for c in el.link_chunks)
        n = len(text)
        self.nodes.append(
            {
                "node_id": el.node_id,
                "part_id": el.part_id,
                "tag": el.tag,
                "attrs": el.attrs,
                "depth": el.depth,
                "text": text,
                "n_chars": n,
                "n_links": el.n_links,
                "link_density": (link_raw / total_raw) if total_raw else 0.0,
                "punct_ratio": sum(1 for c in text if c in _PUNCT) / n,
                "digit_ratio": sum(1 for c in text if c.isdigit()) / n,
                "caps_ratio": sum(1 for c in text if c.isupper()) / n,
                "anc_boiler": el.anc_boiler,
            }
        )

    # -- HTMLParser callbacks -------------------------------------------
    def handle_starttag(self, tag, attrs):
        node_id = self.next_id
        self.next_id += 1
        if tag == "br":
            self._add_text(" ")
        if tag == "hr":
            self.part += 1  # SPEC SS2: pagination boundary (after node_id count)
        if tag in VOID_TAGS:
            return
        if tag == "a":
            self.a_depth += 1
            owner = self._owner()
            if owner is not None and self.skip_depth == 0:
                owner.n_links += 1
        if tag in SKIP_TAGS:
            self.skip_depth += 1
        anc_boiler = tag in BOILER_TAGS or any(
            e.tag in BOILER_TAGS for e in self.stack
        )
        d = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v if v is not None else ""
        self.stack.append(
            _Open(tag, node_id, self.part, len(self.stack), tag in BLOCK_TAGS,
                  anc_boiler, d)
        )

    def handle_startendtag(self, tag, attrs):
        # <x/> on a non-void tag: treat as open+close
        if tag == "br":
            self._add_text(" ")
            self.next_id += 1
            return
        if tag in VOID_TAGS:
            self.next_id += 1
            if tag == "hr":
                self.part += 1
            return
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                while len(self.stack) > i:
                    self._finalize(self.stack.pop())
                return
        # end tag with no matching open element: ignored

    def handle_data(self, data):
        self._add_text(data)

    def close(self):
        super().close()
        while self.stack:
            self._finalize(self.stack.pop())


def parse_nodes(html_str: str) -> list[dict]:
    """SPEC.md SS2: node records of one document, finalize order."""
    p = _BlockParser()
    try:
        p.feed(html_str)
        p.close()
    except Exception:
        # html.parser is robust, but never let one page kill a run; emit
        # whatever was finalized before the failure (same policy in sparkdu).
        while p.stack:
            try:
                p._finalize(p.stack.pop())
            except Exception:
                break
    return p.nodes


def assign_layout(nodes: list[dict]) -> None:
    """SPEC.md SS6: synthetic geometry in node_id order, in place."""
    offset = 0
    for nd in sorted(nodes, key=lambda d: d["node_id"]):
        nd["y1"] = float(offset)
        nd["y2"] = float(offset + nd["n_chars"])
        nd["x1"] = float(nd["depth"])
        nd["x2"] = float(nd["depth"] + 1)
        offset += nd["n_chars"] + 1


def load_model(path: str) -> dict:
    with open(path) as f:
        art = json.load(f)
    assert art["version"] and art["features"] and len(art["w"]) == len(art["features"])
    return art


def _model_z(nd: dict, model: dict) -> float:
    z = model["b"]
    for name, w in zip(model["features"], model["w"]):
        z += w * float(nd[name])
    return z


def _model_score(nd: dict, model: dict) -> float:
    return 1.0 / (1.0 + math.exp(-_model_z(nd, model)))


def _mp_neighbors(order: list[dict]) -> list[list[int]]:
    """clf_v3 graph (SPEC §4): J1∪J2 edges under the §6 synthetic layout,
    which reduce to consecutive same-depth nodes within (part_id). Indices
    into `order` (node_id-ascending), each list ascending."""
    nbrs: list[list[int]] = [[] for _ in order]
    last_at: dict[tuple, int] = {}
    for i, nd in enumerate(order):
        key = (nd["part_id"], nd["depth"])
        j = last_at.get(key)
        if j is not None:
            nbrs[j].append(i)
            nbrs[i].append(j)
        last_at[key] = i
    return nbrs


def _mp_scores(order: list[dict], model: dict) -> list[float]:
    """SPEC §4 clf_v3 recipe: T rounds of score message passing, scalar
    float64, neighbor sums in ascending node_id order."""
    mp = model["mp"]
    T, alpha = int(mp["T"]), float(mp["alpha"])
    nbrs = _mp_neighbors(order)
    z0 = [_model_z(nd, model) for nd in order]
    s = [1.0 / (1.0 + math.exp(-z)) for z in z0]
    for _ in range(T):
        new = []
        for i in range(len(order)):
            if nbrs[i]:
                acc = 0.0
                for j in nbrs[i]:
                    acc += s[j]
                m = acc / len(nbrs[i])
            else:
                m = s[i]
            z = z0[i] + alpha * (2.0 * m - 1.0)
            new.append(1.0 / (1.0 + math.exp(-z)))
        s = new
    return s


def _add_derived_features(nodes: list[dict], model: dict) -> None:
    """SPEC.md SS4 clf_v2 derived features, in place (per-doc pure map)."""
    nb_bases = [f[len("nb_mean_"):] for f in model["features"]
                if f.startswith("nb_mean_")]
    want_tfidf = "tfidf_mean" in model["features"]
    if nb_bases:
        order = sorted(nodes, key=lambda d: d["node_id"])
        for i, nd in enumerate(order):
            prev = order[i - 1] if i > 0 and order[i - 1]["part_id"] == nd["part_id"] else None
            nxt = (order[i + 1] if i + 1 < len(order)
                   and order[i + 1]["part_id"] == nd["part_id"] else None)
            for base in nb_bases:
                if prev is not None and nxt is not None:
                    v = (float(prev[base]) + float(nxt[base])) / 2
                elif prev is not None:
                    v = float(prev[base])
                elif nxt is not None:
                    v = float(nxt[base])
                else:
                    v = float(nd[base])
                nd["nb_mean_" + base] = v
    if want_tfidf:
        idf = model["idf"]
        oov = model["idf_oov"]
        for nd in nodes:
            toks = nd["text"].split(" ")
            s = 0.0
            for t in toks:
                s += idf.get(t, oov)
            nd["tfidf_mean"] = s / len(toks)


def classify(nodes: list[dict], model: dict | None = None) -> None:
    """SPEC.md SS4: set is_content per node, in place."""
    if model is not None and nodes:
        _add_derived_features(nodes, model)
    if model is not None and model.get("mp") and nodes:
        order = sorted(nodes, key=lambda d: d["node_id"])
        s = _mp_scores(order, model)
        for i, nd in enumerate(order):
            ok = (not nd["anc_boiler"]) and nd["link_density"] <= 0.5
            nd["is_content"] = ok and s[i] >= 0.5
        return
    for nd in nodes:
        ok = (not nd["anc_boiler"]) and nd["link_density"] <= 0.5
        if ok and model is not None:
            ok = _model_score(nd, model) >= 0.5
        nd["is_content"] = ok


def assemble(nodes: list[dict], truncated: bool) -> dict:
    """SPEC.md SS5: reading order + spans + extracted_text."""
    content = sorted((n for n in nodes if n["is_content"]), key=lambda d: d["node_id"])
    parts, spans = [], []
    offset = 0
    for seq, nd in enumerate(content, start=1):
        nd["block_seq"] = seq
        start = offset
        end = start + nd["n_chars"]
        nd["text_start"], nd["text_end"] = start, end
        spans.append({"node_id": nd["node_id"], "start": start, "end": end})
        parts.append(nd["text"])
        offset = end + 1
    if truncated:
        parts.append(TRUNCATION_MARKER)
    return {
        "extracted_text": "\n".join(parts),
        "n_blocks": len(content),
        "spans": spans,
    }


def extract_page(url: str, html: bytes | None, model: dict | None = None) -> dict:
    """Full per-page pipeline. Returns the `extracted` record + nodes."""
    html_str, truncated = decode_html(html)
    nodes = parse_nodes(html_str)
    assign_layout(nodes)
    classify(nodes, model)
    out = assemble(nodes, truncated)
    out["url"] = url
    out["pipeline_version"] = model_version(model)
    out["nodes"] = nodes
    return out
