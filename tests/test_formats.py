"""Format detection + Turtle/RDF-XML/JSON-LD parser tests.

Mirrors tests/Unit/RdfParserTest.php detection cases and the integration
fixture expectations (tests/Integration/RdfParserPipelineTest.php:30-83).
"""

import pathlib

import pytest

from parser_rdf_ray.formats import detect, jsonld, rdfxml, turtle
from parser_rdf_ray.model import ParseError
from parser_rdf_ray.parser import parse_document

INTEGRATION = pathlib.Path("/root/reference/tests/Fixtures/Integration")
if not INTEGRATION.is_dir():  # parity fixtures live with the reference
    import pytest

    pytest.skip("reference tree not mounted", allow_module_level=True)

TTL = (INTEGRATION / "sample.ttl").read_text()
NT = (INTEGRATION / "sample.nt").read_text()
RDFXML = (INTEGRATION / "sample.rdf").read_text()
JSONLD = (INTEGRATION / "sample.jsonld").read_text()


class TestDetection:
    def test_turtle(self):
        assert detect.detect_format(TTL) == "turtle"

    def test_ntriples(self):
        assert detect.detect_format(NT) == "n-triples"

    def test_rdfxml(self):
        assert detect.detect_format(RDFXML) == "rdf/xml"

    def test_jsonld(self):
        assert detect.detect_format(JSONLD) == "json-ld"

    def test_plain_text_unknown(self):
        assert detect.detect_format("hello world, not rdf at all") == "unknown"
        assert detect.detect_format("<html><body>nope</body></html>") == "unknown"

    def test_priority_jsonld_first(self):
        assert detect.supported_formats() == [
            "json-ld", "turtle", "n-quads", "n-triples", "rdf/xml"
        ]

    def test_register_prepends(self):
        plug = detect.FormatPlugin("custom", lambda c: c.startswith("CUSTOM"), lambda c: ([], None))
        plugins = detect.register_plugin(plug)
        assert detect.supported_formats(plugins)[0] == "custom"
        assert detect.detect_format("CUSTOM stuff", plugins) == "custom"


def _spo(triples):
    return {(t.subj, t.pred, t.obj) for t in triples}


EXPECTED_SPO = {
    (
        "http://example.org/Person",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/2000/01/rdf-schema#Class",
    ),
    ("http://example.org/Person", "http://www.w3.org/2000/01/rdf-schema#label", "Person"),
    (
        "http://example.org/name",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#Property",
    ),
    ("http://example.org/name", "http://www.w3.org/2000/01/rdf-schema#label", "name"),
    (
        "http://example.org/name",
        "http://www.w3.org/2000/01/rdf-schema#domain",
        "http://example.org/Person",
    ),
}


class TestSameContentAcrossFormats:
    """The 4 integration fixtures carry the same 5 triples — every parser
    must emit the identical (s,p,o) set."""

    def test_turtle(self):
        triples, prefixes = turtle.parse(TTL)
        assert _spo(triples) == EXPECTED_SPO
        assert prefixes["ex"] == "http://example.org/"

    def test_ntriples(self):
        from parser_rdf_ray.formats import ntriples

        assert _spo(ntriples.parse(NT)) == EXPECTED_SPO

    def test_rdfxml(self):
        triples, _root = rdfxml.parse(RDFXML)
        assert _spo(triples) == EXPECTED_SPO

    def test_jsonld(self):
        triples, ctx = jsonld.parse(JSONLD)
        assert _spo(triples) == EXPECTED_SPO
        assert ctx["ex"] == "http://example.org/"


class TestTurtle:
    def test_predicate_and_object_lists(self):
        triples, _ = turtle.parse(
            "@prefix ex: <http://e/> .\n"
            "ex:s ex:p ex:o1, ex:o2 ; ex:q ex:o3 ."
        )
        assert _spo(triples) == {
            ("http://e/s", "http://e/p", "http://e/o1"),
            ("http://e/s", "http://e/p", "http://e/o2"),
            ("http://e/s", "http://e/q", "http://e/o3"),
        }

    def test_a_keyword_and_literals(self):
        triples, _ = turtle.parse(
            '@prefix ex: <http://e/> .\nex:s a ex:T ; ex:n 42 ; ex:f 1.5 ; ex:b true ; ex:l "x"@en .'
        )
        spo = {(t.pred, t.obj, t.obj_kind, t.obj_datatype, t.obj_lang) for t in triples}
        assert ("http://e/n", "42", "literal", "http://www.w3.org/2001/XMLSchema#integer", "") in spo
        assert ("http://e/b", "true", "literal", "http://www.w3.org/2001/XMLSchema#boolean", "") in spo
        assert ("http://e/l", "x", "literal", "", "en") in spo

    def test_blank_node_property_list(self):
        triples, _ = turtle.parse(
            "@prefix ex: <http://e/> .\nex:s ex:p [ ex:q ex:o ] ."
        )
        bn = [t for t in triples if t.pred == "http://e/p"][0]
        assert bn.obj_kind == "bnode"
        nested = [t for t in triples if t.subj == bn.obj][0]
        assert nested.pred == "http://e/q" and nested.obj == "http://e/o"

    def test_collection(self):
        triples, _ = turtle.parse(
            "@prefix ex: <http://e/> .\n"
            "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
            "ex:s ex:domain [ owl:unionOf ( ex:A ex:B ) ] ."
        )
        firsts = [t.obj for t in triples if t.pred.endswith("#first")]
        assert firsts == ["http://e/A", "http://e/B"]
        rests = [t for t in triples if t.pred.endswith("#rest")]
        assert rests[-1].obj.endswith("#nil")

    def test_base_unsupported(self):
        with pytest.raises(ParseError):
            turtle.parse("@base <http://e/> .\n<s> <p> <o> .")

    def test_undefined_prefix(self):
        with pytest.raises(ParseError):
            turtle.parse("ex:s ex:p ex:o .")

    def test_detection_requires_prefix(self):
        assert turtle.can_handle("@prefix ex: <http://e/> .") is True
        assert turtle.can_handle("PREFIX ex: <http://e/>") is True
        assert turtle.can_handle("<http://e/s> <http://e/p> <http://e/o> .") is False

    def test_long_strings(self):
        triples, _ = turtle.parse(
            '@prefix ex: <http://e/> .\nex:s ex:p """multi\nline "quoted" text""" .'
        )
        assert triples[0].obj == 'multi\nline "quoted" text'

    def test_trailing_dot_in_qname(self):
        triples, _ = turtle.parse("@prefix ex: <http://e/> .\nex:s ex:p ex:o.")
        assert triples[0].obj == "http://e/o"


class TestRdfXml:
    def test_typed_node_and_nested(self):
        triples, _ = rdfxml.parse(
            """<?xml version="1.0"?>
            <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                     xmlns:ex="http://e/">
              <ex:Thing rdf:about="http://e/t1">
                <ex:rel><ex:Other rdf:about="http://e/t2"/></ex:rel>
                <ex:lit rdf:datatype="http://www.w3.org/2001/XMLSchema#int">5</ex:lit>
              </ex:Thing>
            </rdf:RDF>"""
        )
        spo = _spo(triples)
        assert ("http://e/t1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://e/Thing") in spo
        assert ("http://e/t1", "http://e/rel", "http://e/t2") in spo
        assert ("http://e/t2", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://e/Other") in spo
        lit = [t for t in triples if t.pred == "http://e/lit"][0]
        assert lit.obj == "5" and lit.obj_datatype.endswith("#int")

    def test_malformed_xml(self):
        with pytest.raises(ParseError):
            rdfxml.parse("<?xml version='1.0'?><rdf:RDF <broken")

    def test_xmlns_prefix_regex(self):
        prefixes = rdfxml.extract_xmlns_prefixes(RDFXML)
        assert prefixes["ex"] == "http://example.org/"


class TestJsonLd:
    def test_context_prefixes_url_validated(self):
        prefixes = jsonld.extract_context_prefixes(
            '{"@context": {"ex": "http://e/", "notaurl": "just words", "n": 5}}'
        )
        assert prefixes == {"ex": "http://e/"}

    def test_invalid_json(self):
        with pytest.raises(ParseError):
            jsonld.parse('{"@context": broken')


class TestNamedGraphs:
    """W3 full semantics: graphs keyed by graph URI with the '_:default'
    sentinel, JSON-LD @id+@graph naming, and handler-provided
    additional_graphs merge (ref src/RdfParser.php:136-154; pinned by
    tests/Unit/NamedGraphSupportTest.php:60-77,145-157)."""

    NAMED_DOC = """{
      "@context": {"v": "http://v/", "ex": "http://ex/"},
      "@graph": [
        {"@id": "ex:s", "v:p": "default-graph triple"},
        {"@id": "ex:g1", "v:about": "the graph resource itself",
         "@graph": [
           {"@id": "ex:gs", "v:q": {"@id": "ex:go"}},
           {"@id": "ex:gs2", "v:q2": "lit"}
         ]}
      ]
    }"""

    def test_jsonld_named_graph_triples_carry_graph_iri(self):
        triples, _ = jsonld.parse(self.NAMED_DOC)
        by_graph: dict = {}
        for t in triples:
            by_graph.setdefault(t.graph, set()).add((t.subj, t.pred, t.obj))
        assert ("http://ex/s", "http://v/p", "default-graph triple") in by_graph[""]
        # properties of the graph-name node stay in the enclosing graph
        assert (
            "http://ex/g1", "http://v/about", "the graph resource itself"
        ) in by_graph[""]
        assert by_graph["http://ex/g1"] == {
            ("http://ex/gs", "http://v/q", "http://ex/go"),
            ("http://ex/gs2", "http://v/q2", "lit"),
        }

    def test_parse_document_graphs_keyed_with_default_sentinel(self):
        from parser_rdf_ray.parser import parse_document

        result = parse_document(self.NAMED_DOC)
        graphs = result["graphs"]
        assert set(graphs) == {"_:default", "http://ex/g1"}
        assert graphs["_:default"]["triple_count"] == 2
        assert graphs["http://ex/g1"]["triple_count"] == 2
        assert graphs["_:default"]["format"] == "json-ld"

    def test_single_graph_formats_keep_default_only(self):
        from parser_rdf_ray.parser import parse_document

        result = parse_document("<http://s> <http://p> <http://o> .")
        assert set(result["graphs"]) == {"_:default"}
        assert result["graphs"]["_:default"]["triple_count"] == 1

    def test_custom_handler_additional_graphs_merge(self):
        """A registered handler can supply extra graphs via extras
        ['additional_graphs'] (ref: metadata['additional_graphs'] merge) —
        and the side-channel must NOT leak into the prefix map."""
        from parser_rdf_ray.formats.detect import FormatPlugin
        from parser_rdf_ray.model import IRI, LITERAL, Triple
        from parser_rdf_ray.parser import RdfParser

        def sniff(content: str) -> bool:
            return content.startswith("CUSTOM:")

        def parse(content: str):
            triples = [Triple("http://s", IRI, "http://p", "v", LITERAL, "", "", 0)]
            extras = {
                "ex": "http://ex/",
                "additional_graphs": {
                    "http://ex/extra": {"format": "custom", "triple_count": 7}
                },
            }
            return triples, extras

        parser = RdfParser()
        parser.register_handler(FormatPlugin("custom", sniff, parse))
        result = parser.parse("CUSTOM: payload")
        assert result["graphs"]["_:default"]["triple_count"] == 1
        assert result["graphs"]["http://ex/extra"] == {
            "format": "custom", "triple_count": 7
        }
        assert result["prefixes"].get("ex") == "http://ex/"
        assert "additional_graphs" not in result["prefixes"]


class TestNTriplesFastSlowEquivalence:
    """The single-regex fast path must accept exactly what the full
    validator+tokenizer pair accepts (or fall back). Grid-fuzz both paths
    over subjects × objects × spacing × suffix variants and compare."""

    def test_grid_equivalence(self):
        from parser_rdf_ray.formats.ntriples import (
            parse,
            tokenize_line,
            validate_line,
        )
        from parser_rdf_ray.model import ParseError

        subjects = [
            "<http://e/s>",
            "<http://e/s#frag>",
            "_:b0",
            "_:8x",
            "<rel>",
            "_:has:colon",
            "<http://a<b>",
        ]
        objects = [
            "<http://e/o>",
            "<http://e/o#f>",
            "_:b1",
            '"plain"',
            '""',
            '"with # hash"',
            '"semi;colon, comma"',
            '"tab\\there"',
            '"l"@en',
            '"l"@en-US',
            '"l"@2bad',
            '"5"^^<http://www.w3.org/2001/XMLSchema#integer>',
            '"bad\\qescape"',
            '"""triple"""',
            "<http://e/o",
            "<http://e/o<nested>",
        ]
        spacings = [" ", "  ", "\t", ""]
        suffixes = [" .", ".", " . # trailing comment", " ; extra"]

        def slow(line: str):
            return tokenize_line(validate_line(line, 1), 1)

        n_checked = 0
        for s in subjects:
            for o in objects:
                for sp in spacings:
                    for suf in suffixes:
                        line = f"{s}{sp}<http://e/p>{sp}{o}{suf}"
                        try:
                            fast_res = parse(line)
                        except ParseError:
                            fast_res = "ERR"
                        try:
                            slow_res = [slow(line)]
                        except ParseError:
                            slow_res = "ERR"
                        assert fast_res == slow_res, f"divergence on {line!r}"
                        n_checked += 1
        assert n_checked == len(subjects) * len(objects) * len(spacings) * len(suffixes)


class TestRdfParserExtension:
    """Extension surface (§2.6; RdfParser.php:103-106, 214-217;
    tests/Unit/RdfParserTest.php:235-305)."""

    def test_register_handler_checked_before_defaults(self):
        from parser_rdf_ray.formats.detect import FormatPlugin
        from parser_rdf_ray.model import Triple
        from parser_rdf_ray.parser import RdfParser

        def parse_custom(content):
            t = Triple(
                subj="http://ex.org/custom", subj_kind="iri",
                pred="http://ex.org/p", obj="1", obj_kind="literal",
                obj_datatype="", obj_lang="", line_no=1,
            )
            return [t], None

        p = RdfParser()
        # sniff matches JSON-LD-looking content too: custom must win (prepended)
        p.register_handler(FormatPlugin("custom", lambda c: c.startswith("{"), parse_custom))
        assert p.get_supported_formats()[0] == "custom"
        result = p.parse('{"@context": {}}')
        assert result["format"] == "custom"
        assert result["triples"][0].subj == "http://ex.org/custom"
        # a fresh parser is unaffected (no global registry mutation)
        assert RdfParser().get_supported_formats()[0] != "custom"

    def test_extract_restrictions_hook_overridable(self):
        from parser_rdf_ray.parser import RdfParser

        class OwlishParser(RdfParser):
            def extract_restrictions(self, parsed):
                return {"n_triples": len(parsed["triples"])}

        base = RdfParser().parse('<http://a> <http://b> "c" .')
        assert base["restrictions"] == {}
        sub = OwlishParser().parse('<http://a> <http://b> "c" .')
        assert sub["restrictions"] == {"n_triples": 1}


class TestDetectionEdgeCases:
    """Remaining RdfParserTest characterization pins."""

    def test_turtle_detected_after_leading_comment(self):
        assert detect.detect_format("# a comment\n@prefix x: <http://x/> .") == "turtle"

    def test_html_is_not_rdf(self):
        from parser_rdf_ray.parser import can_parse

        assert can_parse("<html><body>hi</body></html>") is False

    def test_whitespace_only_not_parseable(self):
        from parser_rdf_ray.parser import can_parse

        assert can_parse("   \n  ") is False

    def test_prefix_only_turtle_yields_empty_extractions(self):
        from parser_rdf_ray import parse_document

        r = parse_document("@prefix x: <http://x/> .")
        assert r["triples"] == []
        assert r["classes"] == {} and r["properties"] == {} and r["shapes"] == {}
        assert r["prefixes"]["x"] == "http://x/"

    def test_priority_turtle_beats_ntriples_when_both_match(self):
        doc = "@prefix x: <http://x/> .\n<http://a> <http://b> <http://c> ."
        assert detect.detect_format(doc) == "turtle"


class TestNQuads:
    """N-Quads input (beyond-reference: the read side of the N-Quads
    export). Detection must never steal reference-scope content."""

    NQ = (
        "# comment\n"
        "<http://a> <http://p> <http://b> <http://g1> .\n"
        '<http://a> <http://p> "lit"@en .\n'
        '_:x <http://p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> <http://g2> . # trailing\n'
    )

    def test_detection_and_graph_assembly(self):
        r = parse_document(self.NQ)
        assert r["format"] == "n-quads"
        assert r["graphs"]["http://g1"]["triple_count"] == 1
        assert r["graphs"]["http://g2"]["triple_count"] == 1
        assert r["graphs"]["_:default"]["triple_count"] == 1
        by_graph = {}
        for t in r["triples"]:
            by_graph.setdefault(t.graph or "_:default", []).append(t)
        assert by_graph["http://g2"][0].obj == "42"
        assert by_graph["http://g2"][0].obj_datatype.endswith("integer")
        assert by_graph["_:default"][0].obj_lang == "en"

    def test_pure_ntriples_keeps_its_handler(self):
        nt = "<http://a> <http://p> <http://b> .\n<http://a> <http://p> \"x\" ."
        assert detect.detect_format(nt) == "n-triples"

    def test_explicit_format_override(self):
        r = parse_document(
            "<http://a> <http://p> <http://b> <http://g> .",
            {"format": "n-quads"},
        )
        assert r["format"] == "n-quads"
        assert r["triples"][0].graph == "http://g"

    def test_error_message_carries_real_line_number(self):
        bad = (
            "<http://a> <http://p> <http://b> <http://g> .\n"
            '<http://a> <http://p> "bad\\q" <http://g> .\n'
        )
        with pytest.raises(ParseError) as ei:
            parse_document(bad, {"format": "n-quads"})
        assert "line 2" in str(ei.value)
        assert "invalid escape sequence" in str(ei.value)

    def test_object_iri_never_stolen_as_graph(self):
        # a 3-term line whose object is an IRI must stay a default-graph
        # triple with that object (the parse-3-first rule)
        r = parse_document(
            "<http://a> <http://p> <http://obj> .\n"
            "<http://a> <http://p> <http://obj> <http://g> .",
            {"format": "n-quads"},
        )
        t0, t1 = r["triples"]
        assert (t0.obj, t0.graph) == ("http://obj", "")
        assert (t1.obj, t1.graph) == ("http://obj", "http://g")

    def test_sink_round_trip_through_the_plugin(self):
        # serialize via the export path, re-ingest via the format plugin
        import pyarrow as pa

        from parser_rdf_ray.sources.ntriples_sink import serialize_nquads_batch

        # sink contract: subjects are (skolemized) IRIs, default graph is
        # the '_:default' sentinel
        batch = pa.Table.from_pydict(
            {
                "subj": ["http://s1", "http://s2"],
                "subj_kind": ["iri", "iri"],
                "pred": ["http://p", "http://p"],
                "obj": ["ünï \"quoted\"", "http://o"],
                "obj_kind": ["literal", "iri"],
                "obj_datatype": ["", ""],
                "obj_lang": ["de", ""],
                "graph": ["http://g", "_:default"],
            }
        )
        text = "\n".join(
            serialize_nquads_batch(batch).column("line").to_pylist()
        )
        r = parse_document(text, {"format": "n-quads"})
        got = {(t.subj, t.obj, t.graph) for t in r["triples"]}
        assert ("http://s1", 'ünï "quoted"', "http://g") in got
        assert any(o == "http://o" and g == "" for _, o, g in got)

    def test_sniffer_never_throws_on_garbage(self):
        from parser_rdf_ray.formats import nquads

        assert nquads.can_handle("%%% not rdf at all") is False
        assert nquads.can_handle("") is False

    def test_mutation_fuzz_error_contract(self):
        """Scraped-data robustness (the codec-guard discipline applied to
        the new parser): byte-mutated valid quad lines must yield
        ParseError (or parse to something) — never IndexError/KeyError/
        AttributeError — and can_handle must never throw."""
        import random

        from parser_rdf_ray.formats import nquads

        rng = random.Random(99)
        base = (
            '<http://ex/s> <http://ex/p> "v\\u00fc"@de <http://ex/g> .\n'
            "_:b <http://ex/p> <http://ex/o> <http://ex/g2> .\n"
            '<http://ex/s> <http://ex/p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .'
        )
        for _ in range(400):
            b = bytearray(base.encode())
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(32, 127)
            mutated = b.decode("utf-8", "replace")
            assert nquads.can_handle(mutated) in (True, False)  # never raises
            try:
                nquads.parse(mutated)
            except ParseError:
                pass  # the contract
