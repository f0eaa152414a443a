"""Deterministic synthetic page corpus + golden outputs (FIXTURES.md).

Every row is a pure function of its doc id ``i`` (seeded
``random.Random(SEED * 1_000_003 + i)`` — stable across runs and across
worker processes), mirroring the reference's deterministic packed-argv
inputs (`/root/reference/src/driver/ocr-driver.c:225-277`) and golden
files (`examples/cholesky/Makefile:51-52`).

The golden text is emitted by construction from the known main content
through the SAME normalizer spec the pipeline uses
(ocr_spark.extract.normalize) — NOT by running the pipeline — so the
byte-identity test is a real two-implementation check of the classifier
+ assembly, not a tautology.

Row plan, keyed by i (FIXTURES.md §1):
  i % 100 == 7           -> html NULL, `text` sidecar filled (text branch)
  else i % 20 == 3       -> %SPDF layout bytes (pdf branch)
  else                   -> templated HTML (html branch)
  i % 500 == 0           -> skew tail: x200 repeated paragraphs
  lang = cycle(en de fr ja zh ru ar "") by i % 8
  encoding: latin-1+meta for (i%20==5, latin langs), UTF-8 BOM for
  i%20==10, plain UTF-8 otherwise
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd

from ocr_spark.extract.normalize import assemble
from ocr_spark.extract.pdfbranch import encode_spdf, layout_words

SEED = 42

LANGS = ["en", "de", "fr", "ja", "zh", "ru", "ar", ""]

_WORDS = {
    "en": "the quick brown fox jumps over lazy dog table query spark data value merge window".split(),
    "de": "der schnelle braune Fuchs springt über den faulen Hund Tabelle Abfrage Daten Wert Fenster grün".split(),
    "fr": "le renard brun rapide saute par dessus chien paresseux table requête données valeur fenêtre été".split(),
    "ru": "быстрая коричневая лиса прыгает через ленивую собаку таблица запрос данные значение окно".split(),
    "ar": "الثعلب البني السريع يقفز فوق الكلب الكسول جدول استعلام بيانات قيمة نافذة".split(),
}
_CJK_JA = list("日本語の文章を抽出する処理系は正確で速い必要がある漢字かな混じり")
_CJK_ZH = list("中文网页正文抽取需要准确并且高效分块评分密度窗口平滑处理")

_NAV_WORDS = "home news sports tech about contact login signup archive tags".split()
_PDF_WORDS = "spark extract layout baseline cluster column word glyph box line page scan".split()


def _rng(i: int) -> random.Random:
    return random.Random(SEED * 1_000_003 + i)


def _words_for(lang: str, rng: random.Random, n: int) -> str:
    if lang == "ja":
        return "".join(rng.choice(_CJK_JA) for _ in range(n * 3))
    if lang == "zh":
        return "".join(rng.choice(_CJK_ZH) for _ in range(n * 3))
    pool = _WORDS.get(lang, _WORDS["en"])
    return " ".join(rng.choice(pool) for _ in range(n))


def _latin1_safe(lang: str) -> bool:
    return lang in ("en", "de", "fr", "")


def _paragraphs(i: int, rng: random.Random, lang: str) -> list[str]:
    n_par = 3 + (i % 10)
    if i % 500 == 0:
        n_par *= 200  # skew tail: 2-10 MB pages
    out = []
    for _ in range(n_par):
        out.append(_words_for(lang, rng, 12 + rng.randrange(20)))
    return out


def _title(rng: random.Random, lang: str) -> str:
    return _words_for(lang, rng, 3 + rng.randrange(4))


def _html_page(i: int, rng: random.Random, lang: str, title: str, paragraphs: list[str]):
    """Templated page; returns (html_bytes, golden_blocks)."""
    nav_links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(_NAV_WORDS, 5 + (i % 5))
    )
    sidebar = "".join(
        f'<div class="widget"><a href="/t/{w}">{w} {w2}</a></div>'
        for w, w2 in zip(rng.sample(_NAV_WORDS, 4), rng.sample(_NAV_WORDS, 4))
    )
    # paragraphs pretty-printed with internal line breaks (exercises the
    # whitespace-collapse and CJK-joining normalizer rules)
    def wrap(p: str) -> str:
        mid = len(p) // 2
        cut = p.rfind(" ", 0, mid)
        if lang in ("ja", "zh"):
            return p[:mid] + "\n      " + p[mid:]
        if cut > 0:
            return p[:cut] + "\n      " + p[cut + 1 :]
        return p

    inline = rng.choice(_NAV_WORDS)
    body_pars = []
    for k, p in enumerate(paragraphs):
        if k == 1 and lang not in ("ja", "zh"):
            # one inline link inside a long paragraph: low link density
            body_pars.append(f"    <p>{wrap(p)} <a href='/x'>{inline}</a></p>")
        elif k % 3 == 2:
            body_pars.append(f"    <p>{wrap(p)} &amp; <em>more</em></p>")
        else:
            body_pars.append(f"    <p>{wrap(p)}</p>")
    main_tag = ("article", "</article>") if i % 2 == 0 else ('div id="main"', "</div>")
    charset = "iso-8859-1" if (i % 20 == 5 and _latin1_safe(lang)) else "utf-8"
    html = f"""<!DOCTYPE html>
<html><head>
  <meta charset="{charset}"><title>SITE {i % 1000}</title>
  <style>body {{ color: #222; }} .widget a {{ font-weight: bold }}</style>
  <script>var page = {i}; function track() {{ return page * 2; }}</script>
</head>
<body>
  <!-- generated page {i} -->
  <nav>{nav_links}</nav>
  <div class="cookie-banner">We use cookies. <a href="#a">Accept</a> <a href="#d">Decline</a> <a href="#s">Settings</a></div>
  <aside class="sidebar">{sidebar}</aside>
  <{main_tag[0]}>
    <h1>{title}</h1>
{chr(10).join(body_pars)}
  {main_tag[1]}
  <footer><div>{nav_links}</div><div>copyright {2020 + i % 6} site{i % 1000}</div></footer>
</body></html>"""
    golden_blocks = [title]
    for k, p in enumerate(paragraphs):
        if k == 1 and lang not in ("ja", "zh"):
            golden_blocks.append(f"{p} {inline}")
        elif k % 3 == 2:
            golden_blocks.append(f"{p} & more")
        else:
            golden_blocks.append(p)
    if charset == "iso-8859-1":
        raw = html.encode("latin-1", errors="replace")
    elif i % 20 == 10:
        raw = b"\xef\xbb\xbf" + html.encode("utf-8")
    else:
        raw = html.encode("utf-8")
    return raw, golden_blocks


def _pdf_page(rng: random.Random):
    """Synthetic %SPDF page; returns (bytes, golden_blocks)."""
    n_cols = 1 + rng.randrange(2)
    cols = []
    for _ in range(n_cols):
        n_lines = 2 + rng.randrange(3)
        col = []
        for _ in range(n_lines):
            col.append([rng.choice(_PDF_WORDS) for _ in range(1 + rng.randrange(4))])
        cols.append(col)
    bm, truth = layout_words(cols)
    return encode_spdf(bm, truth), truth.split("\n")


def _text_doc(i: int, rng: random.Random, lang: str) -> tuple[str, list[str]]:
    pars = [_words_for(lang, rng, 10 + rng.randrange(15)) for _ in range(2 + i % 4)]
    return "\n\n".join(pars), pars


def gen_corpus(n_rows: int) -> pd.DataFrame:
    """pages table + golden columns, one deterministic row per i."""
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(n_rows):
        rng = _rng(i)
        lang = LANGS[i % 8]
        url = f"https://site{i % 1000}.example/p/{i:08d}"
        warc_ts = t0 + timedelta(seconds=i * 137)
        html = None
        text = None
        if i % 100 == 7:
            text, golden_blocks = _text_doc(i, rng, lang)
            branch = "text"
        elif i % 20 == 3:
            html, golden_blocks = _pdf_page(rng)
            branch = "pdf"
        else:
            title = _title(rng, lang)
            pars = _paragraphs(i, rng, lang)
            html, golden_blocks = _html_page(i, rng, lang, title, pars)
            branch = "html"
        rows.append(
            {
                "url": url,
                "warc_ts": warc_ts,
                "html": html,
                "text": text,
                "lang": lang,
                "golden_text": assemble(golden_blocks),
                "golden_n_blocks": len(golden_blocks),
                "golden_branch": branch,
            }
        )
    return pd.DataFrame(rows)


def pages_df(spark, n_rows: int):
    """pages DataFrame (input columns only), via Arrow."""
    pdf = gen_corpus(n_rows)
    from ocr_spark.schema import PAGES_SCHEMA

    return spark.createDataFrame(
        pdf[["url", "warc_ts", "html", "text", "lang"]], schema=PAGES_SCHEMA
    )


def golden_df(spark, n_rows: int):
    pdf = gen_corpus(n_rows)[["url", "golden_text", "golden_n_blocks", "golden_branch"]]
    return spark.createDataFrame(
        pdf,
        schema="url string, golden_text binary, golden_n_blocks int, golden_branch string",
    )


# --- WARC container fixtures --------------------------------------------------

WARC_GROUP = 4


def warc_corpus(n_rows: int, group: int = WARC_GROUP) -> "pd.DataFrame":
    """Deterministic WARC segments built from the page corpus: records
    grouped ``group`` per segment in doc order. Segment 0 additionally
    carries an ADVERSARIAL record whose payload embeds the record
    delimiter and magic bytes (b"\\r\\n\\r\\nWARC/1.0\\r\\n...") — a
    Content-Length-driven parser must skip it; a delimiter-splitting
    parser desynchronizes. Returns columns (seg_id, warc) plus the
    golden per-record truth (seg_id, rec_idx, url, content_length,
    payload_md5) in warc_golden()."""
    segs: dict[int, bytearray] = {}
    for seg_id, rec in _warc_records(n_rows, group):
        segs.setdefault(seg_id, bytearray()).extend(rec)
    return pd.DataFrame(
        {"seg_id": list(segs), "warc": [bytes(b) for b in segs.values()]}
    )


def _record_bytes(url: str, warc_ts, payload: bytes) -> bytes:
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: " + warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n"
    )
    return hdr + payload + b"\r\n\r\n"


def _adversarial_payload() -> bytes:
    return (
        b"decoy\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 9999\r\n\r\n"
        b"tail-bytes-after-embedded-fake-record"
    )


def _warc_records(n_rows: int, group: int = WARC_GROUP):
    """Yields (seg_id, record_bytes) in deterministic order."""
    corpus = gen_corpus(n_rows)
    yield 0, _record_bytes(
        "https://adversarial.example/embedded-magic",
        datetime(2025, 1, 1, tzinfo=timezone.utc),
        _adversarial_payload(),
    )
    for i, r in enumerate(corpus.itertuples()):
        payload = bytes(r.html) if r.html is not None else r.text.encode("utf-8")
        yield i // group, _record_bytes(r.url, r.warc_ts, payload)


def warc_golden(n_rows: int, group: int = WARC_GROUP):
    """Independent generator-side truth for parse_warc: one tuple per
    record (seg_id, rec_idx, url, content_length, payload_md5)."""
    import hashlib

    counters: dict[int, int] = {}
    out = []
    for seg_id, rec in _warc_records(n_rows, group):
        idx = counters.get(seg_id, 0)
        counters[seg_id] = idx + 1
        # re-derive url/payload from the raw record bytes via the header
        # contract (NOT via the parser under test)
        hdr_end = rec.index(b"\r\n\r\n")
        headers = dict(
            line.split(b": ", 1)
            for line in rec[len(b"WARC/1.0\r\n") : hdr_end].split(b"\r\n")
        )
        clen = int(headers[b"Content-Length"])
        payload = rec[hdr_end + 4 : hdr_end + 4 + clen]
        out.append(
            (
                seg_id,
                idx,
                headers[b"WARC-Target-URI"].decode(),
                clen,
                hashlib.md5(payload).hexdigest(),
            )
        )
    return out


def warc_df(spark, n_rows: int):
    return spark.createDataFrame(warc_corpus(n_rows), schema="seg_id long, warc binary")
