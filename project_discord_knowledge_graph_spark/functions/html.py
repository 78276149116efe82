"""Boilerplate-removing HTML -> text extraction.

Stands in for trafilatura-style main-content extraction (the real
library is not in this container; BASELINE.json north_star asks for
"trafilatura/boilerplate-style text extraction in Arrow-batched
pandas UDFs (byte-identical text per url vs the reference)").

The extractor is deterministic: drop <script>/<style> blocks and all
chrome outside <article>, take the <p> paragraphs of the main
article, HTML-unescape them, and join with blank lines.  The
synthetic corpus generator (sources/synth.py) renders pages whose
ground-truth `text` column round-trips through this extractor
byte-identically, which is what the pytest invariant asserts.

Spark side: a scalar Arrow-batched pandas UDF over the binary `html`
column — the hot path stays vectorized, one Python call per Arrow
batch, never per row (input_hint: "no per-row Python").
"""

from __future__ import annotations

import html as _htmllib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_ARTICLE_RE = re.compile(r"<article[^>]*>(.*?)</article>", re.DOTALL)
_PARA_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text(html_str: str) -> str:
    """Extract main-article text from one HTML document (pure fn).

    The two guards are provably output-identical fast paths (r07):
    the script/style regex cannot match a document containing neither
    literal, and `<article[^>]*>` matches can only start at a literal
    "<article", so seeding the search at its first occurrence skips
    the prefix scan without changing which match is found.
    """
    if not html_str:
        return ""
    if "<script" in html_str or "<style" in html_str:
        body = _SCRIPT_STYLE_RE.sub("", html_str)
    else:
        body = html_str
    idx = body.find("<article")
    m = _ARTICLE_RE.search(body, idx) if idx >= 0 else None
    scope = m.group(1) if m else body
    paras = _PARA_RE.findall(scope)
    if not paras:
        # fallback: strip all tags in scope
        return _htmllib.unescape(_TAG_RE.sub(" ", scope)).strip()
    return "\n\n".join([_htmllib.unescape(p) for p in paras])


def _extract_series(html_bytes: pd.Series) -> pd.Series:
    return html_bytes.map(
        lambda b: extract_text(
            b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray))
            else (b or "")
        )
    )


@F.pandas_udf(StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched html(binary) -> text(string)."""
    for s in batches:
        yield _extract_series(s)


# The function is pure, but marking it nondeterministic stops Catalyst
# from pushing filters through the projection and re-evaluating the
# UDF once per referencing expression (measured 5x slowdown on the
# pages->messages stage otherwise).
extract_text_udf = extract_text_udf.asNondeterministic()


def with_extracted_text(df, html_col: str = "html",
                        out_col: str = "extracted_text"):
    """Stage: pages(html binary) -> pages + extracted main text."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))


# ---------------------------------------------------------------------------
# Render side (synthetic-corpus generator only)
# ---------------------------------------------------------------------------

_PAGE_TMPL = """<!DOCTYPE html>
<html lang="{lang}">
<head>
<meta charset="utf-8">
<meta name="message-id" content="{message_id}">
<meta name="author" content="{author}">
<meta name="channel" content="{channel}">
<meta name="thread" content="{thread}">
<meta name="reply-to" content="{reply_to}">
<meta name="mentions" content="{mentions}">
<title>{channel} - post {message_id}</title>
<script>window.__analytics={{page:"{message_id}",v:3}};track();</script>
<style>body{{margin:0;font:14px sans-serif}}nav{{background:#eee}}</style>
</head>
<body>
<nav><a href="/">home</a> <a href="/{channel}">{channel}</a> <a href="/about">about</a></nav>
<header><h1>{channel}</h1><p class="tagline">community board</p></header>
<article>
{paragraphs}
</article>
<aside><p>related: <a href="/x">market movers</a>, <a href="/y">daily recap</a></p></aside>
<footer><p>&copy; example forum &middot; terms &middot; privacy</p></footer>
</body>
</html>"""


def render_page(*, message_id: str, author: str, channel: str,
                thread: str | None, reply_to: str | None,
                mentions: list[str], lang: str, text: str) -> str:
    """Render a forum-like page whose article body extracts back to
    `text` byte-identically."""
    paras = "\n".join(
        f"<p>{_htmllib.escape(p, quote=False)}</p>" for p in text.split("\n\n")
    )
    return _PAGE_TMPL.format(
        lang=lang,
        message_id=message_id,
        author=author,
        channel=channel,
        thread=thread or "",
        reply_to=reply_to or "",
        mentions=",".join(mentions),
        paragraphs=paras,
    )
