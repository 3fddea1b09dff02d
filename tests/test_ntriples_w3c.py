"""W3C RDF 1.1 N-Triples conformance suite.

Drives the tokenizer exactly as the reference conformance suite drives its
handler (tests/Conformance/W3cNTriplesConformanceTest.php:107-172): positive
fixtures must parse without error; negative fixtures must raise. Unlike the
reference (which skips `minimal_whitespace` due to its delegated parser,
docs/spec-completeness.md:340-344) our tokenizer passes all 41 positives.
"""

import pathlib
import re

import pytest

from parser_rdf_ray.formats import ntriples
from parser_rdf_ray.model import ParseError

# vendored copy of the public W3C RDF 1.1 N-Triples test suite
# (https://www.w3.org/2013/N-TriplesTests/) — the suite must not depend on
# the reference tree being mounted
FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "w3c_ntriples"

# The manifest is the authoritative test list (the reference suite reads it
# too; two stray literal_{true,false}.nt files on disk are not in it)
_manifest = (FIXTURES / "manifest.ttl").read_text()
POSITIVE: list[pathlib.Path] = []
NEGATIVE: list[pathlib.Path] = []
for _block in _manifest.split("\n\n"):
    _m = re.search(r"<([^>]+\.nt)>", _block)
    if not _m:
        continue
    if "TestNTriplesPositiveSyntax" in _block:
        POSITIVE.append(FIXTURES / _m.group(1))
    elif "TestNTriplesNegativeSyntax" in _block:
        NEGATIVE.append(FIXTURES / _m.group(1))


def test_fixture_counts():
    assert len(POSITIVE) == 41
    assert len(NEGATIVE) == 29


@pytest.mark.parametrize("path", POSITIVE, ids=lambda p: p.name)
def test_positive_syntax(path):
    content = path.read_text()
    triples = ntriples.parse(content)  # must not raise
    non_comment = [
        ln for ln in content.split("\n") if ln.strip() and not ln.strip().startswith("#")
    ]
    assert len(triples) == len(non_comment)


@pytest.mark.parametrize("path", NEGATIVE, ids=lambda p: p.name)
def test_negative_syntax(path):
    with pytest.raises(ParseError):
        ntriples.parse(path.read_text())


def test_minimal_whitespace_triples():
    # free win over the reference: EasyRdf can't parse zero-whitespace triples
    triples = ntriples.parse((FIXTURES / "minimal_whitespace.nt").read_text())
    assert len(triples) == 6
    assert triples[1].obj == "Alice"
    assert triples[1].obj_kind == "literal"
    assert triples[5].subj_kind == "bnode" and triples[5].obj_kind == "bnode"


def test_escape_unescaping():
    t = ntriples.parse('<http://a.example/s> <http://a.example/p> "\\u006F" .')[0]
    assert t.obj == "o"
    t = ntriples.parse('<http://a.example/s> <http://a.example/p> "\\U0000006F" .')[0]
    assert t.obj == "o"
    t = ntriples.parse('<http://a.example/s> <http://a.example/p> "a\\nb\\tc\\"d\\\\e" .')[0]
    assert t.obj == 'a\nb\tc"d\\e'


def test_datatype_and_lang():
    t = ntriples.parse(
        '<http://e/s> <http://e/p> "123"^^<http://www.w3.org/2001/XMLSchema#byte> .'
    )[0]
    assert t.obj_datatype == "http://www.w3.org/2001/XMLSchema#byte"
    t = ntriples.parse('<http://e/s> <http://e/p> "chat"@en-UK .')[0]
    assert t.obj_lang == "en-UK"


def test_trailing_comment_stripping():
    triples = ntriples.parse(
        "<http://example/s> <http://example/p> <http://example/o> . # comment"
    )
    assert len(triples) == 1 and triples[0].obj == "http://example/o"


def test_line_numbers_in_errors():
    with pytest.raises(ParseError) as e:
        ntriples.parse("<http://e/s> <http://e/p> <http://e/o> .\n<http://e/s> <http://e/p> <rel> .")
    assert "line 2" in str(e.value)


def test_max_line_length():
    long_line = f'<http://e/s> <http://e/p> "{"x" * ntriples.MAX_LINE_LENGTH}" .'
    with pytest.raises(ParseError) as e:
        ntriples.parse(long_line)
    assert "maximum length" in str(e.value)


def test_detection_first_ten_lines_only():
    # 10 leading comment lines push the valid triple to line 11 → not detected
    content = "\n".join(["# c"] * 10 + ["<http://e/s> <http://e/p> <http://e/o> ."])
    assert ntriples.can_handle(content) is False
    content = "\n".join(["# c"] * 9 + ["<http://e/s> <http://e/p> <http://e/o> ."])
    assert ntriples.can_handle(content) is True
