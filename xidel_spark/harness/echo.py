"""Offline stand-ins for the reference test suite's network endpoints.

The reference's online cases (tests/tests.sh:547-588) hit two echo
scripts whose responses are pure functions of the request —
web/xidelecho.php (meth + raw body) and web/xidelecho.pl (a CGI that also
dumps the sorted environment) — plus example.org. Reproducing them here
makes the post*/put*/headers/multipart/multipage-online goldens
byte-exact with no network: the request tuple the engine builds (url,
method, body, headers, form) is rendered to the exact response bytes the
real server would have produced.

The multipart body layout (boundary constant, part framing, @file
uploads) is pinned by the multipart1/multipart2 goldens byte-for-byte.
"""

from __future__ import annotations

from pathlib import Path
from urllib.parse import urlsplit

# the reference http client's deterministic multipart boundary
# (tests/output/multipart1 pins it byte-exactly)
BOUNDARY = "---------------------------1212jhjg2ypsdofx0235p2z5as09"

class HttpError(Exception):
    """simulated non-2xx response; .status feeds the http:NNN error code
    (multipageTryHttp's catch matrix)."""

    def __init__(self, status: int):
        super().__init__(f"HTTP {status}")
        self.status = status


EXAMPLE_ORG = (
    "<html><head><title>Example Domain</title></head>"
    "<body><h1>Example Domain</h1>"
    "<p>This domain is for use in illustrative examples in documents.</p>"
    "</body></html>\n"
)


def multipart_body(fields: list[str], root: Path) -> str:
    """--form fields → the multipart body the reference client sends.

    Each field is one 'name=value' string ('&' inside the value is NOT a
    separator — multipart fields join on NUL, tests/output/multipart2);
    'name=@path[;type=ct]' uploads the file at `path` (relative to the
    test root) with a filename and optional Content-Type part header."""
    out = ["\n"]
    for field in fields:
        name, _, value = field.partition("=")
        filename = None
        ctype = None
        if value.startswith("@"):
            spec = value[1:]
            if ";type=" in spec:
                spec, ctype = spec.split(";type=", 1)
            filename = spec
            p = root / spec
            if not p.exists():
                raise FileNotFoundError(spec)  # caller Skips gracefully
            # byte-transparent like the rest of the harness (latin-1
            # fixtures must round-trip)
            value = p.read_bytes().decode("utf-8", errors="surrogateescape")
        out.append("--" + BOUNDARY + "\n")
        cd = f'Content-Disposition: form-data; name="{name}"'
        if filename is not None:
            cd += f'; filename="{filename}"'
        out.append(cd + "\n")
        if ctype is not None:
            out.append(f"Content-Type: {ctype}\n")
        out.append("\n" + value + "\n")
    out.append("--" + BOUNDARY + "--\n")
    return "".join(out)


def _request_body(req: dict, root: Path) -> str:
    if req.get("form"):
        return multipart_body(req["form"], root)
    return req.get("post") or ""


def _env_of(req: dict, body: str) -> dict[str, str]:
    """the CGI environment xidelecho.pl dumps (only the vars the goldens
    extract need to be present; all derive from the request)."""
    env = {"REQUEST_METHOD": (req.get("method") or "GET").upper()}
    ct = None
    for h in req.get("headers") or []:
        name, _, val = h.partition(":")
        if name.strip().lower() == "content-type":
            ct = val.strip()
    if ct is None:
        if req.get("form"):
            ct = "multipart/form-data; boundary=" + BOUNDARY
        elif body:
            ct = "application/x-www-form-urlencoded"
    if ct is not None:
        env["CONTENT_TYPE"] = ct
    if body:
        env["CONTENT_LENGTH"] = str(len(body))
    for h in req.get("headers") or []:
        name, _, val = h.partition(":")
        name = name.strip()
        if name.lower() == "content-type" or not name:
            continue
        env["HTTP_" + name.upper().replace("-", "_")] = val.strip()
    return env


def simulate_fetch(req: dict, root: Path) -> str | None:
    """request dict → response markup, or None when the host is not one
    of the simulated endpoints (the caller Skips those — google.de etc.
    are genuinely online-only)."""
    parts = urlsplit(req.get("url") or "")
    host = (parts.hostname or "").lower()
    path = parts.path or "/"
    method = (req.get("method") or "GET").upper()
    if host in ("www.google.de", "google.de"):
        # tests.sh:547 only counts //title[contains(.,"Google")] — the
        # page title is as stable a fact as example.org's; a minimal
        # deterministic stand-in keeps the case offline
        return ("<html><head><title>Google</title></head>"
                "<body></body></html>\n")
    if host in ("example.org", "www.example.org"):
        if path in ("", "/"):
            return EXAMPLE_ORG
        raise HttpError(404)
    if host == "videlibri.sourceforge.net":
        if path == "/test/reddit/index.html":
            # regression_multipage3b only resolves a relative URI against
            # this page's location — any well-formed page serves
            return ("<html><head><title>reddit</title></head>"
                    "<body></body></html>\n")
        body = _request_body(req, root)
        if path == "/xidelecho.php":
            # web/xidelecho.php: meth + raw body (trailing newline pinned
            # by tests/output/post3c, a --download of the raw response)
            return f"<xml>\n<meth>{method}</meth>\n<raw>{body}</raw>\n</xml>\n"
        if path == "/cgi-bin/xidelecho.pl":
            env = _env_of(req, body)
            envx = "".join(f"<{k}>{v}</{k}>\n" for k, v in sorted(env.items()))
            return (f"\n<xml><meth>{method}</meth>\n<raw>{body}</raw>"
                    f"<env>{envx}</env></xml>\n\n")
    return None
