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


# --- media codec round-trip properties --------------------------------------

import numpy as np  # noqa: E402


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([0, 3]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(h, w, ch, seed):
    from parser_rdf_ray.pipelines.multimodal import _decode_png, _encode_png

    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 0 else (h, w, 3)
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(_decode_png(_encode_png(img)), img)


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ncolors=st.integers(1, 64),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_property(h, w, ncolors, seed):
    from parser_rdf_ray.pipelines.gifcodec import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
    img = palette[rng.randint(0, ncolors, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@given(
    bh=st.integers(1, 3),
    bw=st.integers(1, 3),
    quality=st.integers(10, 95),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_gray_matches_spec_math_property(bh, bw, quality, seed):
    """Decoded gray JPEG must equal the independent per-block
    fdct → quant → dequant → idct prediction bit-for-bit — except when a
    DCT coefficient lands numerically ON a .5 quantization boundary
    (or a spatial value on a .5 pixel boundary), where the encoder's
    batched einsum and the reference's matmul can legitimately round
    opposite ways (float summation order); hypothesis.assume skips those
    measure-zero inputs so the equality stays exact everywhere else."""
    from hypothesis import assume

    from parser_rdf_ray.pipelines.jpegcodec import (
        _C,
        _default_qtable,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(seed)
    g = rng.randint(0, 256, (bh * 8, bw * 8), dtype=np.uint8)
    q = _default_qtable(quality).astype(np.float64)
    exp = np.zeros_like(g, np.float64)
    for by in range(bh):
        for bx in range(bw):
            blk = g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float) - 128
            ratio = (_C @ blk @ _C.T) / q
            assume(np.abs(ratio - np.rint(ratio)).max() < 0.5 - 1e-6)
            spatial = _C.T @ (np.rint(ratio) * q) @ _C + 128
            assume(np.abs(spatial - np.rint(spatial)).max() < 0.5 - 1e-6)
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(spatial), 0, 255
            )
    dec = decode_jpeg(encode_jpeg(g, quality=quality))
    assert np.array_equal(dec, exp.astype(np.uint8))
