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
