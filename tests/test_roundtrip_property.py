"""Property-based round-trip tests (hypothesis).

Serialize random triples to N-Triples / Turtle, parse with our parsers,
and require exact triple-set recovery — catches escaping/tokenizer edge
cases no fixture enumerates. Serializers here are written from the W3C
grammars, independently of the parsers under test.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from parser_rdf_ray.formats import ntriples, turtle

_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _esc_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    return "".join(out)


# IRI path segments: unreserved characters only (no escaping needed)
_iri = st.text(alphabet=string.ascii_letters + string.digits + "-._~", min_size=1, max_size=12).map(
    lambda p: f"http://ex.org/{p}"
)
# literal text: printable unicode incl. chars requiring escapes
_lit = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any scalar incl. astral
    min_size=0,
    max_size=40,
)
_lang = st.sampled_from(["en", "nl", "de-DE", "zh"])


@st.composite
def _triples(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    out = []
    for _ in range(n):
        s = draw(_iri)
        p = draw(_iri)
        kind = draw(st.sampled_from(["iri", "plain", "lang", "typed"]))
        if kind == "iri":
            out.append((s, p, draw(_iri), "iri", "", ""))
        elif kind == "plain":
            out.append((s, p, draw(_lit), "literal", "", ""))
        elif kind == "lang":
            out.append((s, p, draw(_lit), "literal", "", draw(_lang)))
        else:
            out.append(
                (s, p, draw(_lit), "literal", "http://www.w3.org/2001/XMLSchema#string", "")
            )
    return out


def _to_ntriples(triples) -> str:
    lines = []
    for s, p, o, kind, dt, lang in triples:
        if kind == "iri":
            obj = f"<{o}>"
        else:
            obj = f'"{_esc_literal(o)}"'
            if lang:
                obj += f"@{lang}"
            elif dt:
                obj += f"^^<{dt}>"
        lines.append(f"<{s}> <{p}> {obj} .")
    return "\n".join(lines)


def _key(t):
    return (t.subj, t.pred, t.obj, t.obj_kind, t.obj_datatype, t.obj_lang)


def _expected(triples):
    return {(s, p, o, k, dt, lang) for s, p, o, k, dt, lang in triples}


@settings(max_examples=150, deadline=None)
@given(_triples())
def test_ntriples_roundtrip(triples):
    parsed = ntriples.parse(_to_ntriples(triples))
    assert {_key(t) for t in parsed} == _expected(triples)


@settings(max_examples=150, deadline=None)
@given(_triples())
def test_turtle_roundtrip(triples):
    # same content is valid Turtle (N-Triples ⊂ Turtle); drive our Turtle
    # parser over it, plus a prefix header to exercise the prefix path
    doc = "@prefix ex: <http://ex.org/> .\n" + _to_ntriples(triples)
    got, _prefixes = turtle.parse(doc)
    assert {_key(t) for t in got} == _expected(triples)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_parse_document_never_crashes_unexpectedly(content):
    """Crash-safety: arbitrary input must yield a parse result or one of
    the documented exceptions (ParseError / FormatDetectionError) — never
    an arbitrary traceback (RdfParser.php:68-76 wrap semantics)."""
    from parser_rdf_ray import parse_document
    from parser_rdf_ray.model import FormatDetectionError, ParseError

    try:
        result = parse_document(content)
        assert isinstance(result, dict) and "triples" in result
    except (ParseError, FormatDetectionError):
        pass


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_can_parse_never_raises(content):
    from parser_rdf_ray.parser import can_parse

    assert can_parse(content) in (True, False)
