"""Extraction-kind auto-detection — `guessExtractionKind`.

The reference guesses whether an -e/-f argument is an XPath expression, a
CSS selector, or an HTML pattern template (dispatch at
xidelbase.pas:2540-2543; kinds at 2064-2082): leading '<' means template,
css-only shapes mean CSS, everything else is treated as XPath/XQuery.

Round 3 unified this on exprlang.detect_kind — the single detector whose
behavior is pinned by the reference's own type-selection tests
(tests/tests.sh:423-452: bare names like 'a' are XPATH; 'a.foobar' is
CSS). The old local regex treated bare names as CSS, which diverged.
"""

from __future__ import annotations

from ..exprlang.parser import detect_kind as guess_kind  # noqa: F401

# css → span-kind selector normalization for the crawl slice: accepts the
# CSS spellings of the common crawl selectors regardless of detected kind
# (bare 'a' is XPath per the reference, but '//a' is what the flat span
# fast path optimizes)
_CSS_TO_SELECTOR = {
    "a": "//a",
    "a[href]": "//a",
    "title": "//title",
    "img": "//img",
    "img[src]": "//img/@src",
}


def normalize_selector(expr: str) -> str:
    """Accept either form ('a' or '//a') for the span selectors."""
    return _CSS_TO_SELECTOR.get(expr.strip(), expr.strip())
