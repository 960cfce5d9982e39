"""Deterministic synthetic `pages` corpus generator — FIXTURES.md SS1/SS3.

stdlib-only (no pyspark/pandas imports at module level) so the oracle test
suite can generate fixtures without a JVM. Seeded per-doc PRNG
(``random.Random(42 * 10**9 + doc_id)``): any row is reproducible in
isolation, which is what lets Spark generate the bench corpus in parallel
with ``mapInPandas`` over a ``spark.range`` (each worker re-derives its rows
from doc_id alone).

Corpus shape mirrors the reference's PAGE-XML collections (boilerplate
decoration regions + content regions + tables; SURVEY.md SS1.1 [U]) as
Common-Crawl-style HTML per the graft cell [B:9-15].
"""

from __future__ import annotations

import datetime as _dt
import random

SEED_BASE = 42 * 10**9
PART_SEP = '<hr class="page-break">'  # SPEC SS2 pagination boundary marker
EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)
DUP_FRACTION = 0.02  # trailing duplicate-url rows (exercises J9)
LANGS = ["en", "de", "fr", "es", "zh"]

_WORDS = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta epsilon "
    "document page layout region block text line word table cell header "
    "content extraction spark arrow vector batch shuffle partition cluster "
    "crawl corpus boiler plate signal noise feature graph edge node label "
    "model classify order sort span offset byte ident hash salt skew mega"
).split()

_LATIN1_WORDS = ["café", "naïve", "über", "señor", "août", "cœur"]


def n_docs_for_tier(tier: str) -> int:
    return {"smoke": 500, "correctness": 5000, "bench": 50000}[tier]


def _words(rng: random.Random, lo: int, hi: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


def _paragraph_html(rng: random.Random, i: int, text: str) -> str:
    """10%% of paragraphs get inline markup (tests reassembly across tags)."""
    if rng.random() < 0.10:
        ws = text.split(" ")
        k = rng.randrange(len(ws))
        tag = rng.choice(["a", "b", "span"])
        if tag == "a":
            ws[k] = f'<a href="/x{i}">{ws[k]}</a>'
        else:
            ws[k] = f"<{tag}>{ws[k]}</{tag}>"
        text = " ".join(ws)
    return f'<div class="c{i % 7}"><p>{text}</p></div>'


def gen_page_html(doc_id: int, mega: bool = False, over_cap: bool = False) -> bytes:
    """Deterministic synthetic page per FIXTURES.md SS3. Returns raw bytes."""
    return _gen_page(doc_id, mega, over_cap)[0]


def content_text_set(doc_id: int, mega: bool = False, over_cap: bool = False) -> set:
    """Generator-intent ground truth: normalized texts of content blocks
    (paragraphs + table cells). Used for the `labels` fixture (M5 training
    + A3 confusion); everything else on the page is boilerplate by intent."""
    return set(_gen_page(doc_id, mega, over_cap)[1])


def _gen_page(doc_id: int, mega: bool = False, over_cap: bool = False):
    rng = random.Random(SEED_BASE + doc_id)
    latin1 = (doc_id % 100) == 7 and not mega and not over_cap
    chopped = (doc_id % 200) == 13 and not mega and not over_cap
    content_texts: list[str] = []

    # multi-part pages (SPEC SS2 pagination; web analogue of MultiPageXml):
    # ~1/9 of pages get 2-4 sections separated by <hr class="page-break">.
    # Break positions come from an INDEPENDENT prng so every other page's
    # main-rng draw sequence (and thus its bytes) is unchanged.
    multi = (doc_id % 9) == 3 and not mega and not over_cap
    hr_breaks: set = set()

    parts = ["<!DOCTYPE html><html><head>"]
    parts.append(f"<title>Page {doc_id} &amp; friends</title>")
    if latin1:
        parts.append('<meta charset="iso-8859-1">')
    parts.append("<script>var x = 1 < 2 && 3;</script>")
    parts.append("<style>.c0 { color: red; }</style>")
    parts.append("</head><body>")

    # boilerplate shell — all must be stripped
    nav_links = "".join(
        f'<a href="/nav{j}">{rng.choice(_WORDS)} {j}</a> '
        for j in range(rng.randint(3, 10))
    )
    parts.append(f"<nav><ul><li>{nav_links}</li></ul></nav>")
    parts.append(f"<header><h1>{_words(rng, 2, 5)}</h1></header>")
    if rng.random() < 0.5:
        parts.append(f"<aside>{_words(rng, 5, 15)}</aside>")

    # content paragraphs
    n_paras = rng.randint(5000, 20000) if mega else rng.randint(5, 60)
    if over_cap:
        n_paras = 40000
    if multi and n_paras >= 4:
        prng = random.Random(SEED_BASE + doc_id + 7_777_777)
        n_parts = prng.randint(2, 4)
        hr_breaks = set(prng.sample(range(1, n_paras), min(n_parts - 1, n_paras - 1)))
    for i in range(n_paras):
        if i in hr_breaks:
            parts.append(PART_SEP)
        base = _words(rng, 20, 80)
        if latin1 and i == 0:
            base = rng.choice(_LATIN1_WORDS) + " " + base
        content_texts.append(base)
        parts.append(_paragraph_html(rng, i, base))

    # ambiguity band
    if rng.random() < 0.20:
        rel = "".join(
            f'<a href="/rel{j}">{_words(rng, 2, 4)}</a> ' for j in range(8)
        )
        parts.append(f'<div class="related">{rel}</div>')
        parts.append(f"<div>{'!?.;:' * rng.randint(2, 6)} {rng.choice(_WORDS)}</div>")

    # tables: 10% of pages
    if rng.random() < 0.10:
        trs = []
        for _ in range(3):
            tds = []
            for _ in range(4):
                cell = _words(rng, 1, 3)
                content_texts.append(cell)
                tds.append(f"<td>{cell}</td>")
            trs.append("<tr>" + "".join(tds) + "</tr>")
        parts.append(f"<table>{''.join(trs)}</table>")

    parts.append(
        f"<footer>&copy; 2026 site{doc_id % 20} &amp; co.&nbsp;"
        f'<a href="/tos">terms</a></footer>'
    )
    parts.append("</body></html>")
    html = "".join(parts)

    if chopped:
        # truncate mid-tag (parser robustness, T0)
        cut = int(len(html) * 0.6)
        lt = html.rfind("<", 0, cut)
        html = html[: lt + max(1, (cut - lt) // 2)]

    b = html.encode("latin-1", errors="replace") if latin1 else html.encode("utf-8")
    return b, content_texts


def gen_row(doc_id: int, n_main: int, bench_skew: bool = False) -> dict:
    """One `pages` row. doc_id in [0, n_total); rows >= n_main are dup-url tail."""
    is_dup = doc_id >= n_main
    orig_id = (doc_id - n_main) if is_dup else doc_id
    mega = bench_skew and not is_dup and (doc_id % 1000) == 499
    over_cap = bench_skew and doc_id == 42 and not is_dup
    html = gen_page_html(doc_id, mega=mega, over_cap=over_cap)
    ts = EPOCH + _dt.timedelta(minutes=orig_id)
    if is_dup:
        ts += _dt.timedelta(days=1)
    rng = random.Random(SEED_BASE + doc_id)
    # crawler-style naive text: tag-stripped, un-normalized (never the target)
    naive = _naive_strip(html)
    return {
        "url": f"https://site{orig_id % 20}.example/{orig_id:x}",
        "warc_ts": ts,
        "html": html,
        "text": naive,
        "lang": LANGS[orig_id % len(LANGS)],
    }


def _naive_strip(html: bytes) -> str:
    import re

    s = html.decode("utf-8", errors="replace")
    return re.sub(r"<[^>]*>", " ", s)[:2000]


def gen_rows(n: int, bench_skew: bool = False) -> list[dict]:
    n_main = n - int(n * DUP_FRACTION)
    return [gen_row(i, n_main, bench_skew) for i in range(n)]


def gen_rows_range(start: int, stop: int, n_total: int, bench_skew: bool = False):
    """Range shard for distributed generation (doc_id-addressable)."""
    n_main = n_total - int(n_total * DUP_FRACTION)
    return [gen_row(i, n_main, bench_skew) for i in range(start, stop)]


def synth_image_bytes(img_id: int) -> tuple:
    """Deterministic synthetic image payload with REAL header structure.

    Returns (payload: bytes, fmt: str, width: int, height: int). The headers
    are structurally valid (PNG signature+IHDR, JPEG APP0+SOF0 marker chain,
    GIF89a logical screen descriptor) so a header parser exercises the same
    code path as on real crawl data; pixel data/CRCs are filler (no codec
    libraries exist in this environment to produce full images).
    """
    rng = random.Random(SEED_BASE + 555_000_000 + img_id)
    w = rng.randint(1, 4000)
    h = rng.randint(1, 3000)
    fmt = ("png", "jpeg", "gif")[img_id % 3]
    filler = bytes(rng.randrange(256) for _ in range(rng.randint(8, 64)))
    if fmt == "png":
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 6, 0, 0, 0])  # bit depth 8, RGBA
        )
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
            + filler
        )
    elif fmt == "jpeg":
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
        # a COM segment before SOF0 exercises the marker-skip loop
        com = b"\xff\xfe" + (2 + len(filler)).to_bytes(2, "big") + filler
        sof0 = (
            b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
            + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )
        payload = b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"
    else:
        payload = (
            b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0xF7, 0, 0]) + filler
        )
    return payload, fmt, w, h


def synth_wav_bytes(audio_id: int) -> tuple:
    """Deterministic synthetic WAV payload with generator-truth features.

    Returns (payload, sample_rate, n_samples, rms, zcr) — truth fields are
    None for the deliberately truncated payloads (every 11th). Unlike the
    image fixtures this is a FULLY decodable asset: WAV/PCM needs no codec
    library, so the decode operator is real end-to-end, and the truth
    features are computed from the exact quantized samples written into the
    container (round-trip exact by construction).
    """
    import io
    import wave

    import numpy as np

    rng = random.Random(SEED_BASE + 777_000_000 + audio_id)
    rate = rng.choice([8000, 16000, 22050])
    dur_ms = rng.randrange(50, 400)
    n = max(rate * dur_ms // 1000, 16)
    t = np.arange(n, dtype=np.float64) / rate
    sig = np.zeros(n, dtype=np.float64)
    for _ in range(rng.randint(1, 3)):  # a few deterministic partials
        sig += rng.uniform(0.05, 0.45) * np.sin(
            2 * np.pi * rng.choice([110.0, 220.0, 440.0, 880.0, 1760.0]) * t
            + rng.uniform(0, 6.28)
        )
    pcm = np.clip(np.rint(sig * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    payload = buf.getvalue()
    if audio_id % 11 == 0:  # truncated mid-data: decode must fail cleanly
        return payload[: max(50, len(payload) // 3)], None, None, None, None
    samples = pcm.astype(np.float64) / 32768.0
    rms = round(float(np.sqrt(np.mean(samples * samples))), 9)
    zcr = int(np.sum((samples[:-1] * samples[1:]) < 0))
    return payload, rate, n, rms, zcr


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big") + tag + data
        + (zlib.crc32(tag + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png_filter_row(ftype: int, cur, left_shifted, prior, prior_left) -> bytes:
    """Apply PNG filter `ftype` to one scanline (all arrays int32, length
    stride; left_shifted/prior_left are the bpp-shifted reconstructed rows
    with leading zeros). Returns the filtered bytes to store."""
    import numpy as np

    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - left_shifted
    elif ftype == 2:
        out = cur - prior
    elif ftype == 3:
        out = cur - (left_shifted + prior) // 2
    else:  # Paeth
        p = left_shifted + prior - prior_left
        pa_ = np.abs(p - left_shifted)
        pb_ = np.abs(p - prior)
        pc_ = np.abs(p - prior_left)
        pred = np.where(
            (pa_ <= pb_) & (pa_ <= pc_), left_shifted,
            np.where(pb_ <= pc_, prior, prior_left),
        )
        out = cur - pred
    return (out & 0xFF).astype("uint8").tobytes()


def synth_png_pixels_bytes(img_id: int) -> tuple:
    """Deterministic FULLY-DECODABLE PNG payload with generator-truth pixel
    stats.

    Unlike synth_image_bytes (header-only filler), this writes a complete
    spec-conformant PNG: zlib-compressed IDAT, correct chunk CRCs, and a
    per-scanline filter type cycling through all five PNG filters (None/
    Sub/Up/Average/Paeth) so a decoder must implement every unfilter path
    to reproduce the pixels. Color type cycles gray(0)/RGB(2)/RGBA(6),
    bit depth 8, no interlace.

    Returns (payload, width, height, channels, px_mean, px_sha) where
    px_mean is the mean over ALL decoded sample bytes rounded to 6 dp and
    px_sha is sha256(raw_pixels)[:16] — byte-exactness of the whole decode.
    Every 13th payload is truncated inside IDAT with null truth fields.
    """
    import hashlib
    import zlib

    import numpy as np

    rng = random.Random(SEED_BASE + 888_000_000 + img_id)
    w = rng.randint(3, 48)
    h = rng.randint(3, 40)
    ctype, ch = ((0, 1), (2, 3), (6, 4))[img_id % 3]
    nprng = np.random.RandomState(SEED_BASE % (2**31) + img_id)
    # gradient + noise: neighbor-correlated so Sub/Up/Paeth filters are
    # exercised on realistic (compressible) data, not pure noise
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 3 + yy * 5) % 256
    px = np.empty((h, w, ch), dtype=np.uint8)
    for c in range(ch):
        px[:, :, c] = ((base + c * 37 + nprng.randint(0, 32, (h, w))) % 256).astype(
            "uint8"
        )
    stride = w * ch
    raw = px.reshape(h, stride).astype(np.int32)
    zeros = np.zeros(ch, dtype=np.int32)
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        cur = raw[r]
        ftype = (img_id + r) % 5
        left_shifted = np.concatenate([zeros, cur[:-ch]])
        prior_left = np.concatenate([zeros, prior[:-ch]])
        lines.append(ftype)
        lines += _png_filter_row(ftype, cur, left_shifted, prior, prior_left)
        prior = cur
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    idat = zlib.compress(bytes(lines), 6)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    if img_id % 13 == 0:  # truncated inside IDAT: decode must fail cleanly
        return payload[: 33 + len(idat) // 2], None, None, None, None, None
    px_mean = round(float(px.mean()), 6)
    px_sha = hashlib.sha256(px.tobytes()).hexdigest()[:16]
    return payload, w, h, ch, px_mean, px_sha


def _gif_lzw_encode(indices, min_code: int) -> bytes:
    """Standard GIF-flavor LZW compress of a color-index stream (variable
    code width, LSB-first bit packing, clear/end codes, 12-bit cap)."""
    clear = 1 << min_code
    end = clear + 1
    out_bits = []

    def emit(code, width):
        for k in range(width):
            out_bits.append((code >> k) & 1)

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    emit(clear, width)
    prev = b""
    for idx in indices:
        cur = prev + bytes([idx])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        prev = bytes([idx])
    if prev:
        emit(table[prev], width)
    emit(end, width)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for k, b in enumerate(out_bits[i : i + 8]):
            v |= b << k
        by.append(v)
    return bytes(by)


def synth_gif_pixels_bytes(img_id: int) -> tuple:
    """Deterministic FULLY-DECODABLE GIF payload with generator-truth pixel
    stats — real LZW-compressed index data (variable code width, table
    growth and reset), global or local color table, and interlaced rows on
    every third image so a decoder must implement the four-pass deinterlace.

    Returns (payload, width, height, channels=3, px_mean, px_sha) over the
    palette-resolved RGB array; every 13th payload is truncated inside the
    image data with null truth fields.
    """
    import hashlib

    import numpy as np

    rng = random.Random(SEED_BASE + 999_000_000 + img_id)
    w = rng.randint(3, 40)
    h = rng.randint(3, 32)
    n_colors_pow = rng.randint(1, 7)  # palette of 2^(n+1) entries
    n_colors = 1 << (n_colors_pow + 1)
    nprng = np.random.RandomState((SEED_BASE + img_id) % (2**31) + 17)
    palette = nprng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    idx = ((xx * 2 + yy * 3 + nprng.randint(0, 4, (h, w))) % n_colors).astype(
        np.uint8
    )
    interlaced = img_id % 3 == 0
    local_ct = img_id % 2 == 1  # odd ids carry the palette on the image
    min_code = max(2, n_colors_pow + 1)
    header = b"GIF89a"
    packed_gct = (0x80 | n_colors_pow) if not local_ct else 0x00
    lsd = (
        w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([packed_gct, 0, 0])
    )
    gct = palette.tobytes() if not local_ct else b""
    # a graphic-control extension exercises the extension-skip path
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    packed_img = (0x80 | n_colors_pow if local_ct else 0) | (
        0x40 if interlaced else 0
    )
    img_desc = (
        b"\x2c" + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([packed_img])
    )
    lct = palette.tobytes() if local_ct else b""
    rows = idx
    if interlaced:  # write rows in GIF interlace pass order
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    data = _gif_lzw_encode(rows.ravel().tolist(), min_code)
    sub = bytearray([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)
    payload = header + lsd + gct + ext + img_desc + lct + bytes(sub) + b"\x3b"
    if img_id % 13 == 0:
        return payload[: len(header) + len(lsd) + len(gct) + 8], None, None, None, None, None
    rgb = palette[idx]
    px_mean = round(float(rgb.mean()), 6)
    px_sha = hashlib.sha256(rgb.tobytes()).hexdigest()[:16]
    return payload, w, h, 3, px_mean, px_sha


# ---------------------------------------------------------------------
# JPEG (baseline sequential DCT) encoder + spec-pinned reconstruction
# ---------------------------------------------------------------------
#
# JPEG is lossy, so unlike PNG/GIF the generator truth cannot be the input
# pixels: it must be the RECONSTRUCTION a conforming decoder produces from
# the quantized coefficients actually written into the file. The
# entropy-decode -> dequant -> dezigzag path is integer-exact; the only
# float steps (IDCT, YCbCr->RGB) follow the pinned recipe below, which is
# DELIBERATELY duplicated verbatim in sparkdu.multimodal (same float64
# matmul shape + floor(x+0.5) rounding) so generator truth and decoder
# output are bit-identical. Huffman tables are GENERATED canonical codes
# (fixed-length, all-ones code unused) rather than the Annex-K defaults —
# a decoder must honestly parse DHT to read these files.

_JPEG_ZIGZAG = []
for _s in range(15):
    _rs = list(range(max(0, _s - 7), min(_s, 7) + 1))
    if _s % 2 == 0:
        _rs = _rs[::-1]
    _JPEG_ZIGZAG.extend((_r, _s - _r) for _r in _rs)
del _s, _rs

# canonical fixed-length Huffman specs: (bits[1..16] counts, symbol values)
_JPEG_DC_SYMS = list(range(12))            # DC size categories 0..11
_JPEG_AC_SYMS = [0x00, 0xF0] + [           # EOB, ZRL, then (run,size)
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12   # 12 symbols, all 4 bits
_JPEG_AC_BITS = [0] * 7 + [162] + [0] * 8  # 162 symbols, all 8 bits


def _jpeg_canonical_codes(bits, vals):
    """(length, code) per symbol in canonical order — shared by encoder
    (symbol -> code) and any table-driven decoder."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_idct_mat():
    import numpy as np

    A = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return A


def _jpeg_recon_plane(qblocks, qtab, bw, bh):
    """Pinned reconstruction: dequant -> IDCT (A.T @ C @ A) -> +128 ->
    floor(x+0.5) -> clip, per 8x8 block; returns (bh*8, bw*8) uint8."""
    import numpy as np

    A = _jpeg_idct_mat()
    plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            C = qblocks[by * bw + bx].astype(np.float64) * qtab
            s = A.T @ C @ A + 128.0
            plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                np.floor(s + 0.5), 0, 255
            ).astype(np.uint8)
    return plane


def _jpeg_ycc_to_rgb(y, cb, cr):
    """Pinned JFIF color recovery: float64, floor(x+0.5), clip."""
    import numpy as np

    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, nbits):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def pad_align(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _jpeg_encode_block(qc_zz, pred_dc, wtr, dc_codes, ac_codes):
    """Huffman-encode one zigzagged quantized block; returns new DC pred."""
    diff = int(qc_zz[0]) - pred_dc
    mag = diff if diff >= 0 else -diff
    size = mag.bit_length()
    ln, code = dc_codes[size]
    wtr.put(code, ln)
    if size:
        wtr.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(qc_zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = ac_codes[0xF0]
            wtr.put(code, ln)
            run -= 16
        mag = v if v >= 0 else -v
        size = mag.bit_length()
        ln, code = ac_codes[(run << 4) | size]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        wtr.put(code, ln)
    return int(qc_zz[0])


def synth_jpeg_bytes(img_id: int, size: tuple | None = None,
                     truncate: bool | None = None) -> tuple:
    """Deterministic FULLY-DECODABLE baseline JPEG payload with
    generator-truth reconstruction stats.

    Writes a complete interchange-format stream: APP0/JFIF, formula-based
    8-bit quant tables (DQT), SOF0 with 1 (grayscale) or 3 (YCbCr 4:4:4)
    components, GENERATED canonical Huffman tables (DHT — not the Annex-K
    defaults, so DHT parsing is genuinely exercised), and an entropy-coded
    scan with byte stuffing; every 5th-mod-2 image adds a DRI restart
    interval with RSTn markers and DC-predictor resets. Dimensions are NOT
    multiples of 8 in general (edge blocks are replicate-padded; decoders
    must crop).

    Returns (payload, width, height, channels, px_mean, px_sha) where the
    stats are over the pinned-recipe RECONSTRUCTION (see module comment);
    every 13th payload is truncated inside the scan with null truth.
    """
    import hashlib
    import struct

    import numpy as np

    rng = random.Random(SEED_BASE + 777_000_000 + img_id)
    if size is None:
        w = rng.randint(5, 48)
        h = rng.randint(5, 40)
    else:
        # MJPEG frames share the video's dimensions; rng feeds only w/h so
        # overriding them leaves every default-call byte identical.
        w, h = size
    ncomp = 1 if img_id % 3 == 0 else 3
    qf = (2, 3, 5)[img_id % 3]  # quant aggressiveness
    restart = 2 if img_id % 5 == 2 else 0  # MCUs per restart interval
    nprng = np.random.RandomState((SEED_BASE + img_id) % (2**31) + 31)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 5 + yy * 7) % 256
    if ncomp == 3:
        rgb = np.empty((h, w, 3), dtype=np.uint8)
        for c in range(3):
            rgb[:, :, c] = ((base + c * 41 + nprng.randint(0, 24, (h, w))) % 256)
        rf, gf, bf = (rgb[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * rf + 0.587 * gf + 0.114 * bf,
            128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf,
            128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf,
        ]
        planes = [np.clip(np.floor(p + 0.5), 0, 255) for p in planes]
    else:
        planes = [((base + nprng.randint(0, 24, (h, w))) % 256).astype(np.float64)]

    # two quant tables: 0 for luma, 1 for chroma (formula-based, 8-bit)
    uu, vv = np.mgrid[0:8, 0:8]
    qtabs = [
        np.clip(1 + (1 + uu + vv) * qf, 1, 255).astype(np.int32),
        np.clip(2 + (1 + uu + vv) * (qf + 1), 1, 255).astype(np.int32),
    ]
    A = _jpeg_idct_mat()  # forward DCT is A @ X @ A.T with the same basis
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    comp_q = [0] if ncomp == 1 else [0, 1, 1]
    comp_blocks = []  # per component: list of zigzagged quantized blocks
    zz_r = [p[0] for p in _JPEG_ZIGZAG]
    zz_c = [p[1] for p in _JPEG_ZIGZAG]
    for ci, plane in enumerate(planes):
        # replicate-pad to full blocks
        pad = np.empty((bh_ * 8, bw_ * 8), dtype=np.float64)
        pad[:h, :w] = plane
        pad[h:, :w] = plane[-1:, :]
        pad[:, w:] = pad[:, w - 1:w]
        blocks = []
        q = qtabs[comp_q[ci]].astype(np.float64)
        for by in range(bh_):
            for bx in range(bw_):
                X = pad[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                C = A @ X @ A.T
                qc = np.floor(C / q + 0.5).astype(np.int32)  # round-half-up
                blocks.append(qc)
        comp_blocks.append(blocks)

    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_SYMS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_SYMS)
    wtr = _JpegBitWriter()
    preds = [0] * ncomp
    n_mcu = bw_ * bh_
    rst = 0
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            wtr.pad_align()
            wtr.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * ncomp
        for ci in range(ncomp):
            zz = comp_blocks[ci][m][zz_r, zz_c]
            preds[ci] = _jpeg_encode_block(zz, preds[ci], wtr, dc_codes, ac_codes)
    wtr.pad_align()
    scan = bytes(wtr.out)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in range(2 if ncomp == 3 else 1):
        zzq = qtabs[ti][zz_r, zz_c].astype(np.uint8).tobytes()
        out += seg(0xDB, bytes([ti]) + zzq)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, comp_q[ci]])  # 1x1 sampling
    out += seg(0xC0, sof)
    for tc, th, bits, vals in (
        (0, 0, _JPEG_DC_BITS, _JPEG_DC_SYMS),
        (1, 0, _JPEG_AC_BITS, _JPEG_AC_SYMS),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    scan_start = len(out)
    out += scan
    out += b"\xff\xd9"  # EOI
    payload = bytes(out)

    if truncate is None:
        truncate = img_id % 13 == 0
    if truncate:  # truncated inside the entropy-coded scan
        return payload[: scan_start + len(scan) // 3], None, None, None, None, None

    recon = [
        _jpeg_recon_plane(comp_blocks[ci], qtabs[comp_q[ci]].astype(np.float64),
                          bw_, bh_)[:h, :w]
        for ci in range(ncomp)
    ]
    if ncomp == 3:
        px = _jpeg_ycc_to_rgb(recon[0], recon[1], recon[2])
    else:
        px = recon[0].reshape(h, w, 1)
    px_mean = round(float(px.mean()), 6)
    px_sha = hashlib.sha256(px.tobytes()).hexdigest()[:16]
    return payload, w, h, ncomp, px_mean, px_sha


# ---------------------------------------------------------------------
# MP4 / ISO-BMFF container (video metadata path; pixel decode would need
# codec libraries, so the payload carries an opaque mdat)
# ---------------------------------------------------------------------

def _mp4_box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    """ISO-BMFF box: 32-bit size header, or the size==1 + 64-bit
    largesize form when ``large`` (parsers must handle both)."""
    if large:
        return (1).to_bytes(4, "big") + btype + (len(payload) + 16).to_bytes(8, "big") + payload
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def _mp4_full(version: int, body: bytes) -> bytes:
    return bytes([version, 0, 0, 0]) + body


_MP4_MATRIX = (
    (0x00010000).to_bytes(4, "big") + b"\x00" * 12
    + (0x00010000).to_bytes(4, "big") + b"\x00" * 12
    + (0x40000000).to_bytes(4, "big")
)


def synth_mp4_bytes(vid_id: int) -> tuple:
    """Deterministic ISO-BMFF (MP4) container with generator-truth
    metadata: ftyp (varying major brand), moov[mvhd + 1-2 trak trees
    (video tkhd with 16.16 fixed-point dims + mdia/hdlr 'vide'; every
    other id adds an audio trak FIRST so parsers must select by handler,
    not position)], free, and an opaque mdat (every 4th in the 64-bit
    largesize form). mvhd/tkhd alternate version 0/1 so both time-field
    widths are exercised.

    Returns (payload, brand, duration_ms, width, height, n_tracks);
    every 13th payload is truncated inside moov with null truth.
    """
    rng = random.Random(SEED_BASE + 555_000_000 + vid_id)
    brand = ("isom", "mp42", "avc1")[vid_id % 3]
    timescale = rng.choice([600, 1000, 90000, 12288])
    duration = rng.randint(timescale // 2, timescale * 120)
    w = rng.randint(16, 3840)
    h = rng.randint(16, 2160)
    v64 = vid_id % 2  # mvhd/tkhd version (0: 32-bit times, 1: 64-bit)
    two_tracks = vid_id % 2 == 1

    tdur = (4, 8)[v64]
    times = (0).to_bytes(tdur, "big") * 2  # creation/modification

    def mvhd():
        body = (
            times + timescale.to_bytes(4, "big") + duration.to_bytes(tdur, "big")
            + (0x00010000).to_bytes(4, "big") + (0x0100).to_bytes(2, "big")
            + b"\x00" * 10 + _MP4_MATRIX + b"\x00" * 24
            + (3).to_bytes(4, "big")
        )
        return _mp4_box(b"mvhd", _mp4_full(v64, body))

    def tkhd(track_id, tw, th):
        body = (
            times + track_id.to_bytes(4, "big") + b"\x00" * 4
            + duration.to_bytes(tdur, "big") + b"\x00" * 8
            + b"\x00" * 2 + b"\x00" * 2 + b"\x00" * 2 + b"\x00" * 2
            + _MP4_MATRIX
            + (tw << 16).to_bytes(4, "big") + (th << 16).to_bytes(4, "big")
        )
        return _mp4_box(b"tkhd", _mp4_full(v64, body))

    def hdlr(handler):
        return _mp4_box(
            b"hdlr",
            _mp4_full(0, b"\x00" * 4 + handler + b"\x00" * 12 + b"x\x00"),
        )

    def mdhd():
        body = (
            times + timescale.to_bytes(4, "big") + duration.to_bytes(tdur, "big")
            + (0x55C4).to_bytes(2, "big") + b"\x00" * 2
        )
        return _mp4_box(b"mdhd", _mp4_full(v64, body))

    def trak(track_id, handler, tw, th):
        mdia = _mp4_box(b"mdia", mdhd() + hdlr(handler))
        return _mp4_box(b"trak", tkhd(track_id, tw, th) + mdia)

    traks = b""
    n_tracks = 1
    if two_tracks:  # audio trak FIRST: dims must come from the vide trak
        traks += trak(2, b"soun", 0, 0)
        n_tracks = 2
    traks += trak(1, b"vide", w, h)
    moov = _mp4_box(b"moov", mvhd() + traks)
    ftyp = _mp4_box(
        b"ftyp", brand.encode() + (0x200).to_bytes(4, "big") + b"isommp42"
    )
    mdat_payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
    mdat = _mp4_box(b"mdat", mdat_payload, large=vid_id % 4 == 0)
    payload = ftyp + moov + _mp4_box(b"free", b"") + mdat
    if vid_id % 13 == 0:  # truncated inside moov
        return payload[: len(ftyp) + len(moov) // 2], None, None, None, None, None
    duration_ms = round(duration * 1000.0 / timescale, 3)
    return payload, brand, duration_ms, w, h, n_tracks


# ---------------------------------------------------------------------
# AVI / RIFF container with MJPEG frames (video PIXEL decode path: each
# '00dc' chunk is a complete baseline JPEG, so the existing JPEG decoder
# de-stubs video frame decode with no codec library)
# ---------------------------------------------------------------------

def _riff_chunk(ckid: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + LE u32 size + body + pad byte to even length
    (the pad byte is NOT counted in the size — decoders must skip it)."""
    pad = b"\x00" if len(body) % 2 else b""
    return ckid + len(body).to_bytes(4, "little") + body + pad


def _riff_list(listtype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", listtype + body)


def synth_avi_bytes(vid_id: int) -> tuple:
    """Deterministic MJPEG-in-AVI payload with generator-truth per-frame
    reconstruction stats.

    Container: RIFF('AVI ') -> LIST hdrl (avih MainAVIHeader + LIST strl
    with a 'vids'/'MJPG' strh + BITMAPINFOHEADER strf) -> LIST movi with
    one '00dc' chunk per frame (a complete baseline JPEG from
    synth_jpeg_bytes, so frames exercise DHT parsing, byte stuffing,
    restarts, odd dimensions) -> idx1 index. Frames are deliberately
    often odd-sized so RIFF even-padding is exercised. All frames of one
    video share (w, h) and component count, like real MJPEG.

    Returns (payload, width, height, fps, n_frames, channels,
    frame_means, frame_shas) where the truth arrays hold the pinned-recipe
    reconstruction stats per frame in order; every 11th payload is
    truncated inside movi and carries all-null truth — the decoder must
    reject the whole container, not emit rows for the frames that happen
    to precede the cut.
    """
    import struct

    rng = random.Random(SEED_BASE + 888_000_000 + vid_id)
    w = rng.randint(8, 40)
    h = rng.randint(8, 32)
    n_frames = rng.randint(3, 8)
    fps = rng.choice((10, 15, 24, 30))
    # frame img_ids: fixed residue mod 3 per video (constant component
    # count, like real MJPEG) and never the JPEG generator's own
    # truncation residue — AVI-level truncation is decided here instead.
    base = 900_000 + vid_id * 100 + (vid_id % 3)
    frames, means, shas = [], [], []
    channels = None
    for k in range(n_frames):
        p, fw, fh, nc, m, s = synth_jpeg_bytes(
            base + 3 * k, size=(w, h), truncate=False
        )
        frames.append(p)
        means.append(m)
        shas.append(s)
        channels = nc

    avih = struct.pack(
        "<IIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0,
        0x10,              # AVIF_HASINDEX
        n_frames, 0, 1, 0, w, h,
    ) + b"\x00" * 16       # dwReserved[4]
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n_frames,
                      0, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                     + _riff_chunk(b"strf", strf)),
    )
    movi_body = b""
    idx_entries = []
    for p in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_body), len(p)))
        movi_body += _riff_chunk(b"00dc", p)
    movi = _riff_list(b"movi", movi_body)
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)
            for off, ln in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    payload = b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body

    if vid_id % 11 == 0:  # truncated inside movi (after >=1 whole frame)
        cut = payload.find(b"movi") + 4 + len(movi_body) // 2
        return payload[:cut], None, None, None, None, None, None, None
    return payload, w, h, fps, n_frames, channels, means, shas


# ---------------------------------------------------------------------------
# link graph fixture (crawl hyperlink analogue) — deterministic, host-skewed
# ---------------------------------------------------------------------------

def gen_links(urls: list) -> list:
    """Deterministic crawl-style link edges (src_url, dst_host, nofollow).

    Models the hyperlink graph a Common-Crawl pipeline derives from WAT
    records: each page emits 1-6 out-links whose destination host follows a
    quadratic preferential skew (low-numbered sites are hubs — site0 draws
    ~sqrt-share of all links), plus ~10% rel=nofollow edges a ranking job
    must drop. Seeded per-source-url so any url subset regenerates the same
    edges (shard-stable, like every other fixture generator here).
    """
    import random as _random

    n_hosts = 20
    out = []
    for u in sorted(urls):
        rng = _random.Random(f"links|{u}")
        for _ in range(1 + rng.randrange(6)):
            dst = f"site{int(n_hosts * rng.random() ** 2.5)}.example"
            out.append((u, dst, rng.random() < 0.10))
    return out


def gen_robots(n_hosts: int = 20) -> list:
    """Deterministic robots.txt payloads, one per fixture host.

    Exercises every branch of the (prefix-rule) robots evaluation:
    longest-match precedence (Disallow /d vs the longer Allow /dd
    carve-out), groups for other agents that must be ignored, stacked
    User-agent lines heading one group, empty Disallow (no rule), inline
    comments and blank lines, a fully-disallowed host (Disallow: /), and
    a host with no ``*`` group at all (everything allowed). Hosts follow
    the site{i}.example naming of gen_links.
    """
    out = []
    for i in range(n_hosts):
        host = f"site{i}.example"
        lines = [f"# robots for {host}", ""]
        if i % 7 == 3:
            # no wildcard group: every url on this host is allowed
            lines += ["User-agent: SpecialBot", "Disallow: /"]
        elif i % 7 == 4:
            lines += ["User-agent: *", "Disallow: /  # closed host"]
        else:
            lines += ["User-agent: FancyBot", "Disallow: /fancy", ""]
            if i % 5 == 0:
                # stacked UA lines: both agents share one rule group
                lines += ["User-agent: OtherBot", "User-agent: *"]
            else:
                lines += ["User-agent: *"]
            d = i % 10
            lines += [
                f"Disallow: /{d}",
                f"Allow: /{d}{d}  # longest-match carve-out",
            ]
            if i % 4 == 1:
                lines += ["Disallow:"]  # empty value: not a rule
            if i % 3 == 0:
                lines += [f"Disallow: /{(d + 1) % 10}"]
            if i % 3 == 1:
                # mixed integer and fractional delays; hosts without the
                # directive fall back to the scheduler default
                dly = (i % 4) + 0.5 if i % 2 else (i % 4) + 1
                lines += [f"Crawl-delay: {dly:g}"]
        out.append((host, "\n".join(lines) + "\n"))
    return out


def gen_redirects(n_chains: int = 60, seed: int = 77) -> list:
    """Deterministic redirect graph: (src_url, dst_url, status) edges.

    Chains of length 1..6 ending at a terminal landing page, ~15% of
    chains instead closing into a 2- or 3-cycle (the pathological case a
    resolver must bound), plus a handful of diamond fan-ins (two sources
    redirecting into the same chain). Statuses alternate 301/302/307/308
    deterministically.
    """
    import random

    rng = random.Random(seed)
    statuses = [301, 302, 307, 308]
    out = []
    for c in range(n_chains):
        length = 1 + (c % 6)
        hops = [f"https://r{c}.example/hop{j}" for j in range(length)]
        cyclic = c % 7 == 3  # ~15%: chain ends in a cycle, never lands
        if cyclic:
            hops.append(hops[max(0, length - min(3, length))])
        else:
            hops.append(f"https://r{c}.example/landing")
        for j in range(len(hops) - 1):
            out.append((hops[j], hops[j + 1], statuses[(c + j) % 4]))
        if c % 5 == 0:  # diamond fan-in: an extra source joins mid-chain
            out.append(
                (f"https://r{c}.example/alt", hops[length // 2],
                 statuses[c % 4])
            )
        rng.random()  # keep the stream position stable if branches change
    return out


def gen_sitemaps(urls: list) -> list:
    """Deterministic sitemap.xml payloads per host: (host, xml).

    Every 3rd crawled url of the host is listed (so most crawled urls are
    sitemap-absent), alternating lastmod BEFORE the crawl window
    (2025-12-15, capture is fresh) and AFTER it (2026-02-01, capture is
    stale); every 4th listed entry omits <lastmod> entirely (unknown
    freshness). Each host also declares 3 never-crawled /sm{k} urls.
    Whitespace varies (some entries on one line) to keep the parse
    honest.
    """
    from collections import defaultdict

    by_host = defaultdict(list)
    for u in sorted(set(urls)):
        by_host[u.split("/")[2]].append(u)
    out = []
    for host, hurls in sorted(by_host.items()):
        ents = []
        for i, u in enumerate(hurls):
            if i % 3:
                continue
            if (i // 3) % 4 == 3:
                ents.append(f"  <url><loc>{u}</loc></url>")
            else:
                lastmod = "2025-12-15" if (i // 3) % 2 == 0 else "2026-02-01"
                if (i // 3) % 5 == 2:
                    # real sitemaps contain junk dates; the evaluator must
                    # classify them 'unknown', never crash (ANSI casts throw)
                    lastmod = "around mid-january"
                ents.append(
                    f"  <url>\n    <loc>{u}</loc>\n"
                    f"    <lastmod>{lastmod}</lastmod>\n  </url>"
                )
        for k in range(3):
            ents.append(
                f"  <url><loc>https://{host}/sm{k}</loc>"
                f"<lastmod>2026-01-15</lastmod></url>"
            )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(ents)
            + "\n</urlset>\n"
        )
        out.append((host, xml))
    return out


def gen_head_meta(n: int = 240) -> list:
    """Deterministic <head>-metadata pages for the document-metadata
    extraction key (extract_doc_meta).

    Exercises the messy reality of head markup: missing fields, single vs
    double quoting, flipped attribute order (content before name/property),
    mixed-case tag and attribute names, whitespace/newlines inside <title>,
    HTML entities in field text, extra attributes between the interesting
    ones, unquoted charset values, XHTML self-closing tags, a prefix-trap
    meta name ("description-alt" must NOT match "description"), and decoy
    meta/link tags in the BODY that a head-scoped extractor must ignore.
    Bodies also carry the outlink space for extract_outlinks: absolute,
    protocol-relative, root-relative, sibling-relative, ../-relative and
    query+fragment hrefs, uppercase-scheme same-host links, ././
    dot-segments, plus never-extracted forms (fragment-only, mailto:,
    javascript:, tel:, data:, ftp:, empty href, a commented-out anchor)
    and a commented-out head-metadata block that comment-stripping must
    reject. Index arithmetic only (no RNG) so regeneration is
    byte-stable.
    """
    words = ["corpus", "layout", "extraction", "graph", "node", "signal",
             "vector", "shard", "crawl", "render"]
    out = []
    for i in range(n):
        url = f"https://meta{i % 30}.example/p/{i}"
        w = lambda k: words[(i + k) % len(words)]  # noqa: E731
        head = []
        body_extra = []

        # --- title ---------------------------------------------------
        if i % 7 != 0:
            t = f"{w(0).capitalize()} {w(1)} {i}"
            if i % 5 == 2:
                t = f"{w(0).capitalize()} &amp; {w(1)} &lt;{i}&gt;"
            if i % 8 == 3:
                t = f"  {t.replace(' ', chr(10) + '   ', 1)}\t"
            tag = "TITLE" if i % 9 == 0 else "title"
            head.append(f"<{tag}>{t}</{tag}>")

        # --- meta description (quote style, attr order, extras) -------
        if i % 6 != 5:
            d = f"{w(2)} {w(3)} {w(4)} page {i} &amp; more"
            qch = "'" if i % 5 in (1, 4) else '"'
            nm = "Description" if i % 9 == 4 else "description"
            close = " /" if i % 4 == 1 else ""
            if i % 3 == 0:
                head.append(
                    f"<meta content={qch}{d}{qch} id={qch}m{i}{qch} "
                    f"name={qch}{nm}{qch}{close}>"
                )
            else:
                head.append(
                    f"<meta name={qch}{nm}{qch} content={qch}{d}{qch}{close}>"
                )
        # prefix trap: must never be extracted as the description — and
        # it must DISCRIMINATE: on i%6==5 pages (no real description) a
        # prefix-over-matching pattern would surface TRAP where the
        # correct answer is ''
        if i % 10 == 6 or (i % 6 == 5 and i % 10 == 1):
            head.append(f'<meta name="description-alt" content="TRAP {i}">')

        # --- canonical link -------------------------------------------
        if i % 4 != 3:
            canon = f"https://meta{i % 30}.example/canonical/{i}"
            if i % 2 == 0:
                head.append(f'<link rel="canonical" href="{canon}">')
            else:
                head.append(f"<link href='{canon}' rel='canonical'/>")

        # --- og:title ---------------------------------------------------
        if i % 6 < 4:
            og = f"OG {w(5)} {i}"
            prop = "OG:Title" if i % 11 == 7 else "og:title"
            if i % 5 == 3:
                head.append(f'<meta content="{og}" property="{prop}">')
            else:
                head.append(f'<meta property="{prop}" content="{og}">')

        # --- charset: quoted / unquoted / http-equiv-only / absent ----
        if i % 5 == 0:
            head.append("<meta charset=utf-8>")
        elif i % 5 == 1:
            head.append('<meta charset="UTF-8">')
        elif i % 5 == 2:
            head.append("<meta charset='iso-8859-1' >")

        # commented-out head block: NOT live metadata (comment-strip gate)
        if i % 9 == 5:
            head.append(
                f"<!-- <title>DRAFT {i}</title>"
                f'<meta name="description" content="COMMENTED {i}"> -->'
            )
        # value containing the other quote character: captured whole
        # (only on pages with no regular description, so pattern-order
        # precedence never has to arbitrate between two live tags;
        # i%6==5 suppresses the regular tag, i%5==4 is CRT-compatible
        # with it — i ≡ 29 mod 30, 8 live pages)
        if i % 6 == 5 and i % 5 == 4:
            head.append(
                f'<meta name="description" content="it\'s page {i}">'
            )
        # canonical with an escaped query ampersand: must unescape to a
        # real '&' (valid HTML writes & in attribute values as &amp;).
        # Only on pages without the regular canonical (i%4==3), so
        # pattern-order precedence never arbitrates two live tags.
        if i % 4 == 3 and i % 10 == 3:
            head.append(
                f'<link rel="canonical" '
                f'href="https://meta{i % 30}.example/c?x={i}&amp;y=2">'
            )

        # --- body decoys the head-scoped extractor must ignore --------
        if i % 11 == 0:
            body_extra.append(
                f'<meta name="description" content="BODY DECOY {i}">'
            )
            body_extra.append(f'<link rel="canonical" href="https://decoy.example/{i}">')
            body_extra.append(f"<span>literal &lt;title&gt;fake {i}&lt;/title&gt;</span>")

        # --- body outlinks (extract_outlinks): every href form ---------
        links = []
        if i % 2 == 0:
            links.append(
                f'<a href="https://ext{i % 5}.example/abs/{i}">Abs link {i}</a>'
            )
        if i % 3 == 0:
            links.append(f"<a href='//cdn{i % 4}.example/pp/{i}'>proto {i}</a>")
        if i % 4 != 1:
            links.append(f'<a href="/root/{i}">Root &amp; rel {i}</a>')
        if i % 5 != 2:
            links.append(
                f'<a class="x" href="sib/{i}.html">sib\n  {i}</a>'
            )
        if i % 6 == 3:
            links.append(f'<a href="../up/{i}">up {i}</a>')
        if i % 10 == 4:
            links.append(
                f'<a href="https://q{i % 3}.example/pg?x={i}&amp;y=2#sec">'
                f"query {i}</a>"
            )
        if i % 2 == 1:
            # intra-site link to an ALREADY-CRAWLED page (same host:
            # meta{(i+30) % 240 % 30} == meta{i % 30}) — the frontier
            # anti-join must drop these
            links.append(f'<a href="/p/{(i + 30) % 240}">next {i}</a>')
        if i % 14 == 3:
            # uppercase scheme: same-host must still compare case-insensitively
            links.append(
                f'<a href="HTTPS://META{i % 30}.example/UC/{i}">uc {i}</a>'
            )
        if i % 16 == 7:
            links.append(f'<a href="././z/{i}">dots {i}</a>')
        if i % 16 == 11:
            # unquoted href (valid HTML) + root-climbing ../ that must
            # clamp at the root, never delete the authority
            links.append(f"<a href=/unq/{i}>unq {i}</a>")
            links.append(f'<a href="../../../root{i}">climb {i}</a>')
        if i % 17 == 9:
            # '>' inside a quoted attribute BEFORE href: the quote-aware
            # tag scan must still find the element
            links.append(f'<a title="a > b" href="/titled/{i}">tt {i}</a>')
        # never-extracted forms: fragment-only, mailto, javascript, empty
        # (plus the other non-http(s) schemes: tel, data, ftp)
        if i % 13 == 2:
            links.append(f'<a href="tel:+1555{i:04d}">skip tel</a>')
            links.append('<a href="data:text/plain,x">skip data</a>')
            links.append(f"<a href='ftp://files.example/{i}'>skip ftp</a>")
        if i % 7 == 5:
            links.append('<a href="#frag">skip frag</a>')
        if i % 8 == 2:
            links.append('<a href="mailto:a@b.example">skip mail</a>')
        if i % 9 == 1:
            links.append("<a href='javascript:void(0)'>skip js</a>")
        if i % 12 == 6:
            links.append('<a href="">skip empty</a>')
        if i % 12 == 0:
            links.append(
                '<!-- <a href="https://commented.example/x">nope</a> -->'
            )
        body_extra.extend(links)

        lang_attr = "" if i % 10 == 7 else (
            f" lang='{['en', 'de', 'fr'][i % 3]}'" if i % 5 == 4
            else f' lang="{["en", "de", "fr"][i % 3]}"'
        )
        nl = "\n  " if i % 2 else ""
        html = (
            f"<!DOCTYPE html><html{lang_attr}><head>{nl}"
            + f"{nl}".join(head)
            + f"{nl}</head><body><h1>{w(6)} {i}</h1><p>{w(7)} {w(8)} body {i}</p>"
            + "".join(body_extra)
            + "</body></html>"
        )
        out.append((url, html.encode("utf-8")))
    return out
