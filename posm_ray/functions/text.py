"""Text extraction + analysis kernels (webtext payload).

``extract_text`` is the FROZEN extractor behind the per-row invariant
"byte-identical extracted text per url" (BASELINE.json input_hint; version
constant in sources.synth.EXTRACTOR_VERSION). It is a pure function of the
html bytes: no dict-order, locale, or float-format dependence
(SURVEY.md §7.5.1).

The analysis kernels (language id, quality score, token count, fingerprint)
are the training-data-pipeline text ops; each runs vectorized-ish per batch
inside map_batches and has a DuckDB-oracle twin where SQL can express it.
"""

from __future__ import annotations

import hashlib
import html as _html
import re

import numpy as np

_ARTICLE_RE = re.compile(rb"<article\b[^>]*>(.*?)</article>", re.S)
_SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1>", re.S | re.I)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_GEO_META_RE = re.compile(
    rb'<meta\s+name="geo.position"\s+content="([^";]+);([^"]+)"'
)
# coordinate mentions inside text, e.g. "27.7172, 85.3240" (entity geocoder)
_COORD_RE = re.compile(
    r"(-?(?:90|[0-8]?\d)\.\d{3,6})\s*[,;]\s*(-?(?:180|1[0-7]\d|\d{1,2})\.\d{3,6})"
)


def extract_text(html: bytes) -> str:
    """html bytes -> main text. Primary path: innertext of the first
    <article> element (tags stripped, entities unescaped — exact inverse of
    the synth templater, so extracted == original document text byte for
    byte). Fallback for pages without <article>: whole-document boilerplate
    strip (script/style removal, tag strip, whitespace collapse)."""
    m = _ARTICLE_RE.search(html)
    if m:
        inner = _TAG_RE.sub(b"", m.group(1))
        return _html.unescape(inner.decode("utf-8", errors="replace"))
    body = _SCRIPT_RE.sub(b" ", html)
    body = _TAG_RE.sub(b" ", body)
    txt = _html.unescape(body.decode("utf-8", errors="replace"))
    return _WS_RE.sub(" ", txt).strip()


def geocode_meta(html: bytes) -> tuple[float, float] | None:
    """Parse the geo.position meta tag -> (lat, lon); None if absent.
    This is the graft's representative_point analogue: the document's single
    join-key point (SURVEY.md M8)."""
    m = _GEO_META_RE.search(html)
    if not m:
        return None
    try:
        return float(m.group(1)), float(m.group(2))
    except ValueError:
        return None


def geocode_text(text: str) -> list[tuple[float, float]]:
    """Entity geocoder: all coordinate mentions in free text (north-star
    'extract geocodable entities from text')."""
    return [(float(a), float(b)) for a, b in _COORD_RE.findall(text)]


# ---------------------------------------------------------------------------
# language id (n-gram heuristic; no models available in-sandbox)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " to ", " is "),
    "es": (" el ", " la ", " de ", " que ", " los "),
    "fr": (" le ", " la ", " les ", " des ", " est "),
    "de": (" der ", " die ", " und ", " das ", " ist "),
    "ne": (" छ ", " र ", " को ", " मा ", " हो "),
}


def lang_id(text: str) -> str:
    """Marker-word scoring; deterministic tie-break by language code."""
    padded = f" {text.lower()} "
    best = ("und", 0)
    for code in sorted(_LANG_MARKERS):
        score = sum(padded.count(m) for m in _LANG_MARKERS[code])
        if score > best[1]:
            best = (code, score)
    return best[0]


# ---------------------------------------------------------------------------
# quality scoring / token counting (SQL-twinned; integer outputs preferred)
# ---------------------------------------------------------------------------

_TOKEN_SPLIT = " "
_PUNCT = set(".,;:!?'\"()[]{}-")
_BPE_ISH = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def token_count(text: str) -> int:
    """Whitespace-ish token count: number of non-empty fields after splitting
    on single spaces. SQL twin: len(list_filter(str_split(text,' '), ...))."""
    return sum(1 for t in text.split(_TOKEN_SPLIT) if t)


def bpe_ish_token_count(text: str) -> int:
    """BPE-flavored count: alpha runs + digit runs + individual symbols."""
    return len(_BPE_ISH.findall(text))


def quality_metrics(text: str) -> dict:
    """Length / punctuation / uppercase / digit counts + space count.
    Counts (ints) rather than ratios so the oracle compare is exact; the
    character classes are explicit ASCII sets so the DuckDB regexp twin
    counts identically on unicode text."""
    n = len(text)
    punct = sum(1 for ch in text if ch in _PUNCT)
    upper = sum(1 for ch in text if "A" <= ch <= "Z")
    digit = sum(1 for ch in text if "0" <= ch <= "9")
    spaces = text.count(" ")
    return {"n_chars": n, "n_punct": punct, "n_upper": upper,
            "n_digit": digit, "n_spaces": spaces}


def fingerprint_md5(text: str) -> str:
    """Exact-dedup content fingerprint; DuckDB twin: md5(text)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 16, mod: int = 1 << 61) -> int:
    """Karp-Rabin rolling-hash document fingerprint: min of window hashes
    (a winnowing-style signature; deterministic, mergeable by min)."""
    data = text.encode("utf-8")
    if len(data) < window:
        h = 0
        for b in data:
            h = (h * 257 + b) % mod
        return h
    base = 257
    power = pow(base, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * power) * base + data[i]) % mod
        if h < best:
            best = h
    return best


def stopword_hits(text: str, lang: str = "en") -> int:
    markers = _LANG_MARKERS.get(lang, _LANG_MARKERS["en"])
    padded = f" {text.lower()} "
    return sum(padded.count(m) for m in markers)


def decode_double_utf8(value: str | None) -> str | None:
    """M10 rebuild (extract_overpass.py:41-52, ``decode_utf8``): un-escape a
    doubly-encoded UTF-8 property string — ``'Z\\xc3\\xbcrich'`` (literal
    backslash escapes of the utf-8 bytes) becomes ``'Zürich'``. Falls back
    to plain string evaluation on SyntaxError like the reference; returns
    falsy input unchanged."""
    import ast

    if not value:
        return value
    try:
        return ast.literal_eval('b"%s"' % value).decode("utf8")
    except SyntaxError:
        return ast.literal_eval('"%s"' % value)


def decode_double_utf8_batch(values: list[str | None]) -> list[str | None]:
    """Vectorized wrapper with a per-row error guard: undecodable rows pass
    through unchanged (the normalization stage must never drop rows for a
    bad property escape)."""
    out = []
    for v in values:
        try:
            out.append(decode_double_utf8(v))
        except (SyntaxError, ValueError, UnicodeDecodeError):
            out.append(v)
    return out
