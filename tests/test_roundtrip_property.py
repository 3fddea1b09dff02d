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


# --- core exchange primitives (pure local properties) -----------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 4)),
        min_size=0,
        max_size=60,
    )
)
def test_drop_consecutive_dups_equals_set_distinct_on_sorted(rows):
    """On sorted input, consecutive-dedup == set-distinct (the property
    dedup_triples_sorted relies on within each range partition)."""
    import pyarrow as pa

    from parser_rdf_ray.stages.canonicalize import drop_consecutive_dup_rows

    rows = sorted(f"s{a}|p{b}|o{c}".split("|") for a, b, c in rows)
    t = pa.table(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_kind": ["iri"] * len(rows),
            "obj_datatype": [""] * len(rows),
            "obj_lang": [""] * len(rows),
            "graph": ["g"] * len(rows),
        }
    )
    out = drop_consecutive_dup_rows(t)
    got = list(zip(out.column("subj").to_pylist(), out.column("pred").to_pylist(), out.column("obj").to_pylist()))
    expected = sorted(set(map(tuple, rows)))
    assert got == [list(e) for e in map(list, expected)] or got == expected


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 8), min_size=1, max_size=80))
def test_run_spans_partitions_sorted_keys(keys):
    """run_spans segments exactly the equal-key runs of a sorted column."""
    import pyarrow as pa

    from parser_rdf_ray.stages.groups import run_spans

    keys = sorted(keys)
    t = pa.table({"k": [f"k{v}" for v in keys]})
    starts, ends = run_spans(t, ["k"])
    assert starts[0] == 0 and ends[-1] == len(keys)
    # reconstructed runs are constant and consecutive runs differ
    for s, e in zip(starts, ends):
        assert len({keys[i] for i in range(s, e)}) == 1
    for i in range(len(starts) - 1):
        assert keys[starts[i]] != keys[starts[i + 1]]
