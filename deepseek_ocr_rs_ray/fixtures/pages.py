"""Synthetic Common-Crawl-style ``pages`` table (the input_hint shape).

Schema (BASELINE.json input_hint / FIXTURES.md §1):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every row is a pure function of ``(seed, i)`` so generation is
embarrassingly parallel and reproducible: the Ray-parallel writer
(``generate_pages_parquet``) and the driver-side generator
(``pages_table``) produce identical bytes per url.

Routing invariant: rows with ``crc32(url) % 20 == 0`` (≈5 %) get a
degenerate DOM plus an embedded RAW2 raster payload (base64 in
``<img data-payload>``) forcing the OCR fallback; all other rows carry
link-farm boilerplate (nav/header/aside/footer) around a high-text-density
main-content subtree. Byte lengths follow a seeded log-normal (~1 KB–2 MB)
to exercise size-class skew.
"""

from __future__ import annotations

import base64
import os
from typing import List

import numpy as np
import pyarrow as pa

from ..functions.raster import CHARSET, DEFAULT_MARGIN, encode_payload, render_text_image
from ..functions.textops import crc32_str

SEED = 42
# bump when generated content changes: versions the cached fixture dirs so
# stale /tmp caches (marked _COMPLETE) regenerate instead of serving old rows
FIXTURE_VERSION = 2
EPOCH_2026_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_LANGS = ["en", "de", "zh", "fr", "unk"]

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _make_vocab(seed: int = SEED) -> List[str]:
    """~400 deterministic pronounceable words."""
    rng = np.random.default_rng((seed, 0xB0CA))
    consonants = list("bcdfghjklmnpqrstvwz")
    vowels = list("aeiou")
    words = []
    seen = set()
    while len(words) < 400:
        n_syll = int(rng.integers(1, 4))
        w = "".join(consonants[int(rng.integers(len(consonants)))] +
                    vowels[int(rng.integers(len(vowels)))]
                    for _ in range(n_syll))
        if rng.random() < 0.3:
            w += consonants[int(rng.integers(len(consonants)))]
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


_VOCAB = _make_vocab()


def page_url(i: int) -> str:
    return f"https://host{i % 997}.example/{crc32_str(f'path:{i}'):08x}/page{i}.html"


def is_ocr_row(url: str) -> bool:
    return crc32_str(url) % 20 == 0


def _sentence(rng: np.random.Generator, n_words: int) -> str:
    ws = [_VOCAB[int(rng.integers(len(_VOCAB)))] for _ in range(n_words)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _link_farm(rng: np.random.Generator, n: int) -> str:
    items = []
    for _ in range(n):
        label = " ".join(_VOCAB[int(rng.integers(len(_VOCAB)))]
                         for _ in range(int(rng.integers(1, 4))))
        href = f"/{_VOCAB[int(rng.integers(len(_VOCAB)))]}/{int(rng.integers(10000))}"
        items.append(f'<li><a href="{href}">{label}</a></li>')
    return "<ul>" + "".join(items) + "</ul>"


def _ocr_lines(rng: np.random.Generator, n_lines: int,
               lo: int, hi: int, burst_hi: int) -> str:
    lines = []
    for _ in range(n_lines):
        width = int(rng.integers(lo, hi))
        if burst_hi > hi and rng.random() < 0.2:
            width = int(rng.integers(hi, burst_hi))
        chars = []
        while len(chars) < width:
            wl = int(rng.integers(2, 8))
            chars.extend(CHARSET[int(rng.integers(26))] for _ in range(wl))
            chars.append(" ")
        lines.append("".join(chars[:width]).rstrip())
    return "\n".join(lines)


def _ocr_text(rng: np.random.Generator) -> str:
    """Lines of CHARSET words for the rendered page image."""
    n_lines = int(rng.integers(2, 13))
    if rng.random() < 0.15:
        n_lines = int(rng.integers(13, 25))
    return _ocr_lines(rng, n_lines, 8, 41, 65)


def _dense_ocr_text(rng: np.random.Generator) -> str:
    """Wide dense scan: at glyph_scale 2 the canvas exceeds 2048 px, so one
    glyph pixel maps to < 1 global-view pixel — decodable only via the
    dynamic tiles (the M5 end-to-end case)."""
    n_lines = int(rng.integers(8, 17))
    return _ocr_lines(rng, n_lines, 180, 201, 0)


def gen_page(i: int, seed: int = SEED, max_bytes: int = 2 << 20) -> dict:
    """Generate one page row — pure function of (seed, i)."""
    rng = np.random.default_rng((seed, 0x9A6E5, i))
    url = page_url(i)
    ts = EPOCH_2026_US + i * 1_337_000_000  # +i*1337 s
    lang = _LANGS[int(rng.integers(len(_LANGS)))]
    title = _sentence(rng, int(rng.integers(3, 7)))[:-1]

    nav = f"<nav>{_link_farm(rng, int(rng.integers(15, 40)))}</nav>"
    header = f"<header><h1>{title}</h1><p>{_sentence(rng, 5)}</p></header>"
    aside = f"<aside>{_link_farm(rng, int(rng.integers(8, 25)))}</aside>"
    footer = f"<footer><p>{_sentence(rng, 6)}</p>{_link_farm(rng, 10)}</footer>"
    style = "<style>body{margin:0} .x{color:#333}</style>"
    script = f"<script>var q={int(rng.integers(1 << 30))};</script>"

    payload_meta = None
    if is_ocr_row(url):
        # degenerate DOM + raster payload → OCR fallback; ~25% are dense
        # wide scans whose glyph grid out-resolves the 1024px global view
        dense = rng.random() < 0.25
        ocr_text = _dense_ocr_text(rng) if dense else _ocr_text(rng)
        glyph_scale = 2 if dense else int(rng.choice([2, 3, 4]))
        img = render_text_image(ocr_text, glyph_scale, DEFAULT_MARGIN)
        payload = encode_payload(img, glyph_scale, DEFAULT_MARGIN)
        b64 = base64.b64encode(payload).decode("ascii")
        main = (f'<main><div class="scan">'
                f'<img data-payload="{b64}" alt="scan"/></div></main>')
        body_text_bits = [title]
        # generation-side ground truth for the payload header (the oracle
        # for x_payload_meta: generator knows what it encoded, the pipeline
        # must parse the same values back out of the binary column)
        payload_meta = {"url": url, "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "glyph_scale": glyph_scale, "nbytes": len(payload),
                        "payload": payload}
    else:
        # byte-length target from a seeded log-normal, clamped ~1 KB–2 MB
        target = int(np.clip(rng.lognormal(8.3, 1.1), 1024, max_bytes))
        paras = []
        approx = 0
        while approx < target:
            n_sent = int(rng.integers(2, 7))
            p = " ".join(_sentence(rng, int(rng.integers(8, 25)))
                         for _ in range(n_sent))
            paras.append(f"<p>{p}</p>")
            approx += len(p) + 7
            if len(paras) >= 4000:
                break
        # interleave a short link-list div occasionally (boilerplate noise)
        if len(paras) > 4 and rng.random() < 0.5:
            pos = int(rng.integers(1, len(paras)))
            paras.insert(pos, f"<div class='rel'>{_link_farm(rng, 6)}</div>")
        main = "<main><article>" + "".join(paras) + "</article></main>"
        body_text_bits = [title] + paras

    html_doc = ("<!DOCTYPE html><html><head><title>" + title + "</title>" + style +
                "</head><body>" + script + nav + header + main + aside + footer +
                "</body></html>")

    # noisy whole-page dump (boilerplate included) — present but not the target
    import re
    dump = re.sub(r"<[^>]*>", " ", " ".join(body_text_bits))
    dump = re.sub(r"\s+", " ", dump).strip()

    return {
        "url": url,
        "warc_ts": ts,
        "html": html_doc.encode("utf-8"),
        "text": dump,
        "lang": lang,
        "payload_meta": payload_meta,
    }


# generation-side expected payload headers are assembled (and cached per
# session) by pipelines/corpus.py::_ocr_payload_metas from the
# ``payload_meta`` entries gen_page returns


def pages_table(n_rows: int, seed: int = SEED, start: int = 0) -> pa.Table:
    """Driver-side generation of rows [start, start+n_rows) as an Arrow table."""
    rows = [gen_page(i, seed) for i in range(start, start + n_rows)]
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGES_SCHEMA,
    )


def generate_pages_parquet(out_dir: str, n_rows: int, seed: int = SEED,
                           rows_per_shard: int = 2000,
                           parallel: bool = True) -> str:
    """Write the pages table as a sharded Parquet directory.

    Ray-parallel when a Ray session is active (each shard is an independent
    pure function of (seed, shard range) → deterministic bytes per row), with
    a ``_COMPLETE`` marker making the cache idempotent.
    """
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    import pyarrow.parquet as pq

    shards = [(s, min(s + rows_per_shard, n_rows))
              for s in range(0, n_rows, rows_per_shard)]

    if parallel:
        import ray
        if not ray.is_initialized():
            # sessions are owned by the caller (repo rule) — a bare
            # ray.remote here would auto-init one; generate serially instead
            parallel = False

    if parallel:
        import ray

        @ray.remote(num_cpus=1)
        def _write_shard(idx: int, lo: int, hi: int) -> str:
            t = pages_table(hi - lo, seed, start=lo)
            path = os.path.join(out_dir, f"pages-{idx:05d}.parquet")
            pq.write_table(t, path + ".tmp", compression="zstd")
            os.replace(path + ".tmp", path)
            return path

        ray.get([_write_shard.remote(i, lo, hi)
                 for i, (lo, hi) in enumerate(shards)])
    else:
        for i, (lo, hi) in enumerate(shards):
            t = pages_table(hi - lo, seed, start=lo)
            path = os.path.join(out_dir, f"pages-{i:05d}.parquet")
            pq.write_table(t, path + ".tmp", compression="zstd")
            os.replace(path + ".tmp", path)

    with open(marker, "w") as f:
        f.write(f"rows={n_rows} seed={seed} shards={len(shards)}\n")
    return out_dir


def pages_fixture_dir(n_rows: int, seed: int = SEED,
                      root: str = "/tmp/dsocr_fixtures") -> str:
    """Cached fixture directory for a given size (generated on first use)."""
    out = os.path.join(root, f"pages_n{n_rows}_s{seed}_v{FIXTURE_VERSION}")
    return generate_pages_parquet(out, n_rows, seed)
