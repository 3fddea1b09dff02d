"""N-Triples sniffer, strict W3C validators, and term tokenizer.

Semantics mirror the reference handler (src/Handlers/NTriplesHandler.php) but
where the reference delegates actual triple emission to an external RDF
library after validation (NTriplesHandler.php:50-65), we tokenize terms
ourselves. That lets us pass the `minimal_whitespace` W3C case the reference
documents as a skip (docs/spec-completeness.md:340-344).

Contract: the 41 positive + 29 negative fixtures under
tests/Fixtures/W3c/NTriples (driven exactly as the reference conformance
suite does, tests/Conformance/W3cNTriplesConformanceTest.php:107-172).

All regexes are module-level precompiled — Ray batch functions pay the
compile cost once per process, not per document.
"""

from __future__ import annotations

import re

from parser_rdf_ray.model import BNODE, IRI, LITERAL, ParseError, Triple

MAX_LINE_LENGTH = 1_048_576  # 1 MiB per-line cap (NTriplesHandler.php:20)

# Detection regex — IRI or blank-node subject, IRI predicate, anything,
# terminal dot, optional trailing comment (NTriplesHandler.php:37)
_DETECT_RE = re.compile(r"^(?:<[^>]+>|_:\S+)\s*<[^>]+>\s*.+\s*\.\s*(?:#.*)?$")

# IRI scheme check — relative IRIs are not allowed (NTriplesHandler.php:208)
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")
_WS_RE = re.compile(r"\s")
# Blank-node label occurrences; delimiters per reference regex
# (NTriplesHandler.php:305)
_BNODE_RE = re.compile(r"_:([^\s<>.;,]+)")
_BNODE_START_RE = re.compile(r"^[a-zA-Z0-9_]")
# String literal bodies between unescaped double quotes
# (NTriplesHandler.php:326)
_STRING_RE = re.compile(r'"((?:[^"\\]|\\.)*)"', re.S)
# Language tag after a closing quote (NTriplesHandler.php:364)
_LANGTAG_OCCURRENCE_RE = re.compile(r'"(?:[^"\\]|\\.)*"@([^\s.^]+)')
_LANGTAG_VALID_RE = re.compile(r"^[a-zA-Z]+(-[a-zA-Z0-9]+)*$")
_HEX4_RE = re.compile(r"^[0-9a-fA-F]{4}$")
_HEX8_RE = re.compile(r"^[0-9a-fA-F]{8}$")

_STRING_ESCAPE_CHARS = frozenset('tbnrf"\\')
_UNESCAPE_MAP = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "\\": "\\",
}
_UNESCAPE_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf\"\\\\])")

# Fast path: one regex that fully validates + tokenizes a "simple" line —
# no backslash escapes and no '#' anywhere (the precondition checked before
# use), absolute-IRI terms, plain/lang/typed literal objects. Anything else
# falls back to the full validator/tokenizer pair below, so the fast path
# can only accept lines both paths accept (equivalence pinned by the W3C
# conformance suite + tests/test_formats.py fuzz check).
# '<' excluded from the body: IRIREF forbids it, and the full validator
# rejects such lines — the fast path must never accept a line the
# validator rejects (a '<' inside <...> now falls through to the slow path)
_IRI_BODY = r"[a-zA-Z][a-zA-Z0-9+.\-]*:[^\s<>]*"
_BNODE_BODY = r'[A-Za-z0-9_][^\s<>.;,:"]*'
_SIMPLE_LINE_RE = re.compile(
    rf"^(?:<(?P<s_iri>{_IRI_BODY})>|_:(?P<s_bn>{_BNODE_BODY}))[ \t]*"
    rf"<(?P<pred>{_IRI_BODY})>[ \t]*"
    rf'(?:<(?P<o_iri>{_IRI_BODY})>|_:(?P<o_bn>{_BNODE_BODY})|'
    rf'"(?P<o_lit>[^"\\]*)"'
    rf"(?:@(?P<o_lang>[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)|\^\^<(?P<o_dt>{_IRI_BODY})>)?)"
    rf"[ \t]*\.[ \t]*$"
)


def can_handle(content: str) -> bool:
    """First-10-raw-lines sniffer (NTriplesHandler.php:22-43).

    Note: slices the first 10 *raw* lines, then skips blanks/comments inside
    that window — a document with 10 leading comment lines is NOT detected
    ("line 11 never checked", NTriplesHandlerTest.php:80).
    """
    lines = content.strip().split("\n")
    for line in lines[:10]:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if _DETECT_RE.match(line):
            return True
    return False


def strip_trailing_comment(line: str) -> str:
    """Strip a trailing '# ...' comment after the terminal dot.

    Char-scan with in-string/escape state (NTriplesHandler.php:142-184):
    find the last '.' outside string literals; if what follows is empty or a
    comment, truncate there.
    """
    in_string = False
    escaped = False
    last_dot = -1
    for i, ch in enumerate(line):
        if escaped:
            escaped = False
            continue
        if ch == "\\" and in_string:
            escaped = True
            continue
        if ch == '"':
            in_string = not in_string
            continue
        if ch == "." and not in_string:
            last_dot = i
    if last_dot >= 0:
        after = line[last_dot + 1 :].strip()
        if after == "" or after.startswith("#"):
            return line[: last_dot + 1].strip()
    return line


def _fail(line_no: int, what: str) -> None:
    raise ParseError(f"N-Triples validation failed on line {line_no}: {what}", line_no)


def _extract_iris(line: str) -> list[str]:
    """IRI contents between <...>, excluding brackets inside string literals
    (NTriplesHandler.php:222-269)."""
    iris: list[str] = []
    in_string = False
    escaped = False
    in_iri = False
    start = 0
    for i, ch in enumerate(line):
        if escaped:
            escaped = False
            continue
        if ch == "\\" and in_string:
            escaped = True
            continue
        if ch == '"' and not in_iri:
            in_string = not in_string
            continue
        if not in_string:
            if ch == "<":
                in_iri = True
                start = i + 1
            elif ch == ">" and in_iri:
                iris.append(line[start:i])
                in_iri = False
    return iris


def _validate_iri_escapes(iri: str, line_no: int) -> None:
    # Only \uXXXX / \UXXXXXXXX escapes allowed in IRIs
    # (NTriplesHandler.php:274-296)
    pos = iri.find("\\")
    while pos != -1:
        nxt = iri[pos + 1 : pos + 2]
        if nxt == "u":
            if not _HEX4_RE.match(iri[pos + 2 : pos + 6]):
                _fail(line_no, "invalid \\u escape in IRI")
            pos = iri.find("\\", pos + 6)
        elif nxt == "U":
            if not _HEX8_RE.match(iri[pos + 2 : pos + 10]):
                _fail(line_no, "invalid \\U escape in IRI")
            pos = iri.find("\\", pos + 10)
        else:
            _fail(line_no, "only \\u and \\U escapes are allowed in IRIs")
    return


def _validate_iris(line: str, line_no: int) -> None:
    # NTriplesHandler.php:199-215
    for iri in _extract_iris(line):
        if _WS_RE.search(iri):
            _fail(line_no, "IRI contains whitespace")
        if not _SCHEME_RE.match(iri):
            _fail(line_no, "relative IRIs are not allowed in N-Triples")
        _validate_iri_escapes(iri, line_no)


def _validate_blank_nodes(line: str, line_no: int) -> None:
    # NTriplesHandler.php:301-318
    for label in _BNODE_RE.findall(line):
        if not _BNODE_START_RE.match(label):
            _fail(line_no, "invalid blank node label")
        if ":" in label:
            _fail(line_no, "blank node label must not contain ':'")


def _validate_string_escapes(line: str, line_no: int) -> None:
    # NTriplesHandler.php:323-356
    for literal in _STRING_RE.findall(line):
        pos = literal.find("\\")
        while pos != -1:
            nxt = literal[pos + 1 : pos + 2]
            if nxt in _STRING_ESCAPE_CHARS and nxt not in ("u", "U"):
                pos = literal.find("\\", pos + 2)
            elif nxt == "u":
                if not _HEX4_RE.match(literal[pos + 2 : pos + 6]):
                    _fail(line_no, "invalid \\u escape in string literal")
                pos = literal.find("\\", pos + 6)
            elif nxt == "U":
                if not _HEX8_RE.match(literal[pos + 2 : pos + 10]):
                    _fail(line_no, "invalid \\U escape in string literal")
                pos = literal.find("\\", pos + 10)
            else:
                _fail(line_no, f"invalid escape sequence '\\{nxt}' in string literal")


def _validate_language_tags(line: str, line_no: int) -> None:
    # NTriplesHandler.php:361-371
    for tag in _LANGTAG_OCCURRENCE_RE.findall(line):
        if not _LANGTAG_VALID_RE.match(tag):
            _fail(line_no, f"invalid language tag '{tag}'")


def _validate_structure(line: str, line_no: int) -> None:
    # Turtle-only ';'/',' outside strings and IRIs (NTriplesHandler.php:376-428)
    in_string = False
    in_iri = False
    escaped = False
    for ch in line:
        if escaped:
            escaped = False
            continue
        if ch == "\\" and in_string:
            escaped = True
            continue
        if ch == '"' and not in_iri:
            in_string = not in_string
            continue
        if not in_string:
            if ch == "<":
                in_iri = True
                continue
            if ch == ">" and in_iri:
                in_iri = False
                continue
        if not in_string and not in_iri:
            if ch == ";":
                _fail(line_no, "predicate-object lists (';') are not allowed in N-Triples")
            if ch == ",":
                _fail(line_no, "object lists (',') are not allowed in N-Triples")


def validate_line(line: str, line_no: int) -> str:
    """Run all per-line validators in reference order
    (NTriplesHandler.php:129-140). Returns the comment-stripped line."""
    line = strip_trailing_comment(line)
    if '"""' in line:
        _fail(line_no, "triple-quoted strings are not allowed in N-Triples")
    _validate_iris(line, line_no)
    _validate_blank_nodes(line, line_no)
    _validate_string_escapes(line, line_no)
    _validate_language_tags(line, line_no)
    _validate_structure(line, line_no)
    return line


def _unescape(s: str, line_no: int) -> str:
    if "\\" not in s:
        return s

    def repl(m: re.Match) -> str:
        g = m.group(1)
        c = g[0]
        if c == "u" or c == "U":
            return chr(int(g[1:], 16))
        return _UNESCAPE_MAP[c]

    return _UNESCAPE_RE.sub(repl, s)


def _parse_fail(line_no: int, what: str) -> None:
    # Tokenizer-level failures correspond to errors the reference's delegated
    # RDF library raises, wrapped as "N-Triples parsing failed: ..."
    # (NTriplesHandler.php:66-68)
    raise ParseError(f"N-Triples parsing failed: {what} on line {line_no}", line_no)


def _scan_term(line: str, i: int, line_no: int):
    """Scan one term starting at or after index i. Returns (term, next_i).

    term = (kind, value, lang, datatype); value is unescaped.
    Handles zero-whitespace separation (minimal_whitespace.nt).
    """
    n = len(line)
    while i < n and line[i] in " \t":
        i += 1
    if i >= n:
        _parse_fail(line_no, "unexpected end of line")
    ch = line[i]
    if ch == "<":
        j = line.find(">", i + 1)
        if j < 0:
            _parse_fail(line_no, "unterminated IRI")
        return (IRI, _unescape(line[i + 1 : j], line_no), "", ""), j + 1
    if ch == "_" and line[i : i + 2] == "_:":
        j = i + 2
        start = j
        while j < n and line[j] not in ' \t<>.;,"':
            j += 1
        label = line[start:j]
        if not label:
            _parse_fail(line_no, "invalid blank node label")
        return (BNODE, label, "", ""), j
    if ch == '"':
        j = i + 1
        while j < n:
            c = line[j]
            if c == "\\":
                j += 2
                continue
            if c == '"':
                break
            j += 1
        if j >= n:
            _parse_fail(line_no, "unterminated string literal")
        lex = _unescape(line[i + 1 : j], line_no)
        j += 1
        lang = ""
        datatype = ""
        if j < n and line[j] == "@":
            k = j + 1
            while k < n and line[k] not in " \t.":
                k += 1
            lang = line[j + 1 : k]
            if not lang:
                _parse_fail(line_no, "empty language tag")
            j = k
        elif line[j : j + 2] == "^^":
            if line[j + 2 : j + 3] != "<":
                _parse_fail(line_no, "expected datatype IRI after '^^'")
            k = line.find(">", j + 3)
            if k < 0:
                _parse_fail(line_no, "unterminated datatype IRI")
            datatype = _unescape(line[j + 3 : k], line_no)
            j = k + 1
        return (LITERAL, lex, lang, datatype), j
    _parse_fail(line_no, f"invalid term starting with {ch!r}")


def tokenize_line(line: str, line_no: int) -> Triple:
    """Tokenize one validated, comment-stripped line into a Triple."""
    (s_kind, s_val, _, _), i = _scan_term(line, 0, line_no)
    if s_kind == LITERAL:
        _parse_fail(line_no, "literal subject is not allowed")
    (p_kind, p_val, _, _), i = _scan_term(line, i, line_no)
    if p_kind != IRI:
        _parse_fail(line_no, "predicate must be an IRI")
    (o_kind, o_val, o_lang, o_dt), i = _scan_term(line, i, line_no)
    n = len(line)
    while i < n and line[i] in " \t":
        i += 1
    if i >= n or line[i] != ".":
        _parse_fail(line_no, "expected '.' after object")
    rest = line[i + 1 :].strip()
    if rest and not rest.startswith("#"):
        _parse_fail(line_no, "unexpected content after terminal '.'")
    return Triple(s_val, s_kind, p_val, o_val, o_kind, o_dt, o_lang, line_no)


def parse(content: str) -> list[Triple]:
    """Validate + tokenize a whole N-Triples document.

    Mirrors NTriplesHandler::parse (validateContent → stripInlineComments →
    emit), raising ParseError with the reference's message shapes. Empty
    documents yield an empty triple list (the handler level accepts them —
    only RdfParser.parse rejects empty content, RdfParser.php:58-61).
    """
    triples: list[Triple] = []
    fast_match = _SIMPLE_LINE_RE.match
    for idx, raw in enumerate(content.split("\n")):
        line_no = idx + 1
        trimmed = raw.strip()
        if not trimmed or trimmed.startswith("#"):
            continue
        if len(raw) > MAX_LINE_LENGTH:
            _fail(line_no, "line exceeds maximum length")
        if "\\" not in trimmed:
            # '#' needs no precondition: the anchored regex cannot match a
            # trailing comment (those lines just fall back), and '#' inside
            # <IRI> or "literal" bodies is legal and matched in place.
            m = fast_match(trimmed)
            if m is not None:
                g = m.group
                s_iri = g("s_iri")
                o_iri = g("o_iri")
                o_lit = g("o_lit")
                if o_lit is not None:
                    o_val, o_kind = o_lit, LITERAL
                    o_lang = g("o_lang") or ""
                    o_dt = g("o_dt") or ""
                elif o_iri is not None:
                    o_val, o_kind, o_lang, o_dt = o_iri, IRI, "", ""
                else:
                    o_val, o_kind, o_lang, o_dt = g("o_bn"), BNODE, "", ""
                triples.append(
                    Triple(
                        s_iri if s_iri is not None else g("s_bn"),
                        IRI if s_iri is not None else BNODE,
                        g("pred"),
                        o_val,
                        o_kind,
                        o_dt,
                        o_lang,
                        line_no,
                    )
                )
                continue
        cleaned = validate_line(trimmed, line_no)
        triples.append(tokenize_line(cleaned, line_no))
    return triples
