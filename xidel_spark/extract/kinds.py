"""Extraction-kind auto-detection — `guessExtractionKind`.

The reference guesses whether an -e/-f argument is an XPath expression, a
CSS selector, or an HTML pattern template (dispatch at
xidelbase.pas:2540-2543; kinds at 2064-2082): leading '<' means template,
css-selector shapes mean CSS, everything else is treated as XPath/XQuery.
"""

from __future__ import annotations

import re

_CSS = re.compile(r"^[a-zA-Z][a-zA-Z0-9]*([.#:\[][^/]*)?(\s*[,>+~]\s*[a-zA-Z#.].*)?$")


def guess_kind(expr: str) -> str:
    """'pattern' | 'css' | 'xpath'"""
    s = expr.strip()
    if s.startswith("<"):
        return "pattern"
    if s.startswith(("/", ".", "$", "(", "@")) or "::" in s or s.startswith("//"):
        return "xpath"
    if _CSS.match(s) and not any(tok in s for tok in ("/", ":=", " and ", " or ")):
        return "css"
    return "xpath"


# css → span-kind selector normalization for the crawl slice
_CSS_TO_SELECTOR = {
    "a": "//a",
    "a[href]": "//a",
    "title": "//title",
    "img": "//img",
    "img[src]": "//img/@src",
}


def normalize_selector(expr: str) -> str:
    """Accept either form ('a' or '//a') for the span selectors."""
    if guess_kind(expr) == "css":
        return _CSS_TO_SELECTOR.get(expr.strip(), expr)
    return expr.strip()
