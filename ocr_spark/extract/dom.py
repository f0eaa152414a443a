"""HTML → flattened block array via a single streaming parse
(stdlib ``html.parser`` — no lxml in this environment).

One page in, an ordered list of Block records out: the "flattened DOM
block array" of the north rule. Runs inside a mapInPandas batch loop —
per-document Python is fine there because the crossing is Arrow-batched;
what is banned is per-ROW Python UDF dispatch.

Encoding sniff order: UTF-8 BOM → declared <meta charset> in the first
2048 bytes → UTF-8 with replacement. Best-effort on tag soup: the stdlib
parser never raises on malformed input; we additionally guard so a page
can only ever produce a row-level error, never a task failure (FIXTURES
§4: MustFail analogues are row errors, not job aborts).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

from ocr_spark.extract.normalize import _CJK

_CJK_RE = re.compile(f"[{_CJK}]")

# Tags whose content is never document text.
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe", "head"}
# Tags that open/close a text block.
_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "th", "tr", "table", "article", "section", "header", "footer",
    "nav", "aside", "blockquote", "pre", "br", "main", "figure",
    "figcaption", "form", "title", "body",
}

_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([a-zA-Z0-9_\-]+)", re.I)

_ENCODING_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
}


@dataclass
class Block:
    block_idx: int
    tag_path: str
    text: str
    n_chars: int
    n_words: int
    n_link_chars: int
    n_cjk: int = 0

    @property
    def link_density(self) -> float:
        return self.n_link_chars / self.n_chars if self.n_chars else 0.0

    @property
    def effective_words(self) -> int:
        """Script-neutral word count: CJK has no word spaces, so each CJK
        character counts as a word-unit."""
        return max(self.n_words, self.n_cjk)


def decode_html(raw: bytes) -> str:
    """Sniff encoding and decode page bytes (never raises)."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8", errors="replace")
    m = _CHARSET_RE.search(raw[:2048])
    if m:
        enc = _ENCODING_ALIASES.get(m.group(1).decode("ascii", "replace").lower())
        if enc:
            return raw.decode(enc, errors="replace")
    return raw.decode("utf-8", errors="replace")


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self._link_depth = 0
        self._parts: list[str] = []
        self._link_chars = 0

    # -- block lifecycle ------------------------------------------------
    def _flush(self) -> None:
        text = "".join(self._parts)
        stripped = text.strip()
        if stripped:
            n_chars = len(re.sub(r"\s+", "", stripped))
            self.blocks.append(
                Block(
                    block_idx=len(self.blocks),
                    tag_path="/".join(self._stack[-6:]),
                    text=text,
                    n_chars=n_chars,
                    n_words=len(stripped.split()),
                    n_link_chars=min(self._link_chars, n_chars),
                    n_cjk=len(_CJK_RE.findall(stripped)),
                )
            )
        self._parts = []
        self._link_chars = 0

    # -- parser callbacks -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "body":
            # tag-soup guard: an unclosed <head> must not swallow the body
            self._skip_depth = 0
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            self._stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()
            if self._stack and self._stack[-1] == tag:
                self._stack.pop()
            elif tag in self._stack:
                while self._stack and self._stack[-1] != tag:
                    self._stack.pop()
                if self._stack:
                    self._stack.pop()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._link_depth:
            self._link_chars += len(re.sub(r"\s+", "", data))


def parse_blocks(raw: bytes) -> list[Block]:
    """Page bytes → ordered flattened block list (never raises)."""
    html = decode_html(raw)
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — tag soup must degrade, not abort
        pass
    p._flush()
    return p.blocks
