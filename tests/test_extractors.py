"""Extraction-layer tests mirroring the reference unit suites:
ClassExtractorTest, PropertyExtractorTest, ShapeExtractorTest,
PrefixExtractorTest, BlankNodeSkolemizationTest, RdfsVocabularyCompletenessTest,
NamedGraphSupportTest (key behaviors, same fixtures)."""

import pytest

from parser_rdf_ray import parse_document
from parser_rdf_ray.model import FormatDetectionError, ParseError

PRE = "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n" \
      "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n" \
      "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"


class TestClassExtraction:
    def test_rdfs_and_owl_class(self):
        r = parse_document(PRE + "<http://e/A> a rdfs:Class .\n<http://e/B> a owl:Class .")
        assert set(r["classes"]) == {"http://e/A", "http://e/B"}

    def test_rdfs_vocab_completeness(self):
        # rdfs:Datatype / Container / Literal count as classes
        # (RdfsVocabularyCompletenessTest.php)
        r = parse_document(
            PRE + "<http://e/D> a rdfs:Datatype .\n<http://e/C> a rdfs:Container .\n"
            "<http://e/L> a rdfs:Literal ."
        )
        assert set(r["classes"]) == {"http://e/D", "http://e/C", "http://e/L"}

    def test_multilingual_labels_english_preferred(self):
        r = parse_document(
            PRE + '<http://example.org/Person> a rdfs:Class ;\n'
            '  rdfs:label "Person"@en ;\n  rdfs:label "Persoon"@nl .'
        )
        c = r["classes"]["http://example.org/Person"]
        assert c["labels"] == {"en": "Person", "nl": "Persoon"}
        assert c["label"] == "Person"

    def test_descriptions(self):
        r = parse_document(
            PRE + '<http://e/P> a rdfs:Class ;\n'
            '  rdfs:comment "A human being"@en ;\n  rdfs:comment "Een mens"@nl .'
        )
        c = r["classes"]["http://e/P"]
        assert c["description"] == "A human being"
        assert c["descriptions"] == {"en": "A human being", "nl": "Een mens"}

    def test_no_label_is_none_and_empty_map(self):
        r = parse_document(PRE + "<http://e/Thing> a rdfs:Class .")
        c = r["classes"]["http://e/Thing"]
        assert c["label"] is None and c["labels"] == {}
        assert c["description"] is None and c["descriptions"] == {}
        assert c["parent_classes"] == []

    def test_parent_classes(self):
        r = parse_document(
            PRE + "<http://e/Student> a rdfs:Class ; rdfs:subClassOf <http://e/Person> ."
        )
        assert r["classes"]["http://e/Student"]["parent_classes"] == ["http://e/Person"]

    def test_blank_node_classes_dropped_by_default(self):
        r = parse_document(PRE + "_:anon a owl:Class .\n<http://e/P> a rdfs:Class .")
        assert set(r["classes"]) == {"http://e/P"}

    def test_skolemization_option(self):
        # BlankNodeSkolemizationTest.php:44-104 — urn:bnode: pattern, deterministic
        r = parse_document(
            PRE + "_:anon a owl:Class .", {"includeSkolemizedBlankNodes": True}
        )
        (uri,) = r["classes"]
        assert uri.startswith("urn:bnode:")
        r2 = parse_document(
            PRE + "_:anon a owl:Class .", {"includeSkolemizedBlankNodes": True}
        )
        assert set(r2["classes"]) == set(r["classes"])

    def test_types_in_metadata(self):
        r = parse_document(PRE + "<http://e/P> a rdfs:Class .")
        assert r["classes"]["http://e/P"]["metadata"]["types"] == [
            "http://www.w3.org/2000/01/rdf-schema#Class"
        ]

    def test_custom_annotations_prefixed(self):
        r = parse_document(
            PRE + "@prefix skos: <http://www.w3.org/2004/02/skos/core#> .\n"
            '<http://e/P> a rdfs:Class ; skos:prefLabel "Person"@en .'
        )
        anns = r["classes"]["http://e/P"]["metadata"]["annotations"]
        assert any(a["property"] == "skos:prefLabel" and a["value"] == "Person" for a in anns)

    def test_see_also_is_defined_by(self):
        r = parse_document(
            PRE + "<http://e/P> a rdfs:Class ; rdfs:seeAlso <http://e/doc> ;"
            " rdfs:isDefinedBy <http://e/onto> ."
        )
        md = r["classes"]["http://e/P"]["metadata"]
        assert md["see_also"] == ["http://e/doc"]
        assert md["is_defined_by"] == ["http://e/onto"]

    def test_last_write_wins_keying(self):
        # RdfParser.php:169-179 — re-keying by uri is last-write-wins
        r = parse_document(PRE + "<http://e/P> a rdfs:Class .\n<http://e/P> a owl:Class .")
        assert len(r["classes"]) == 1


class TestPropertyExtraction:
    def test_property_types(self):
        r = parse_document(
            PRE + "<http://e/op> a owl:ObjectProperty .\n"
            "<http://e/dp> a owl:DatatypeProperty .\n"
            "<http://e/ap> a owl:AnnotationProperty .\n"
            "<http://e/rp> a rdf:Property ."
        )
        assert r["properties"]["http://e/op"]["property_type"] == "object"
        assert r["properties"]["http://e/dp"]["property_type"] == "datatype"
        assert r["properties"]["http://e/ap"]["property_type"] == "annotation"
        assert r["properties"]["http://e/rp"]["property_type"] == "datatype"  # default

    def test_functional_property(self):
        r = parse_document(PRE + "<http://e/fp> a owl:FunctionalProperty .")
        p = r["properties"]["http://e/fp"]
        assert p["is_functional"] is True
        assert p["property_type"] == "datatype"

    def test_domain_range_named(self):
        r = parse_document(
            PRE + "<http://e/name> a rdf:Property ; rdfs:domain <http://e/P> ;"
            " rdfs:range <http://www.w3.org/2001/XMLSchema#string> ."
        )
        p = r["properties"]["http://e/name"]
        assert p["domain"] == ["http://e/P"]
        assert p["range"] == ["http://www.w3.org/2001/XMLSchema#string"]

    def test_union_domain_via_rdf_list(self):
        # PropertyExtractor.php:164-218 — owl:unionOf list traversal
        r = parse_document(
            PRE + "<http://e/p> a rdf:Property ;"
            " rdfs:domain [ owl:unionOf ( <http://e/A> <http://e/B> ) ] ."
        )
        assert r["properties"]["http://e/p"]["domain"] == ["http://e/A", "http://e/B"]

    def test_subproperty_inverse(self):
        r = parse_document(
            PRE + "<http://e/p> a rdf:Property ; rdfs:subPropertyOf <http://e/q> ;"
            " owl:inverseOf <http://e/r> ."
        )
        p = r["properties"]["http://e/p"]
        assert p["parent_properties"] == ["http://e/q"]
        assert p["inverse_of"] == ["http://e/r"]

    @pytest.mark.parametrize(
        "comment,expected",
        [
            ("The range is a plain literal value", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"),
            ("Range must be rdfs:Literal here", "http://www.w3.org/2001/XMLSchema#string"),
            ("The range of this is xsd:string", "http://www.w3.org/2001/XMLSchema#string"),
            ("range: an xsd:dateTime stamp", "http://www.w3.org/2001/XMLSchema#dateTime"),
            ("the range is xsd:boolean", "http://www.w3.org/2001/XMLSchema#boolean"),
            ("range should be xsd:integer", "http://www.w3.org/2001/XMLSchema#integer"),
        ],
    )
    def test_range_from_comment(self, comment, expected):
        r = parse_document(
            PRE + f'<http://e/p> a rdf:Property ; rdfs:comment "{comment}" .'
        )
        assert r["properties"]["http://e/p"]["range"] == [expected]

    def test_range_from_comment_only_if_empty(self):
        # precedence: formal range wins (PropertyExtractorTest.php:308-329)
        r = parse_document(
            PRE + "<http://e/p> a rdf:Property ;"
            " rdfs:range <http://e/T> ;"
            ' rdfs:comment "the range is xsd:integer" .'
        )
        assert r["properties"]["http://e/p"]["range"] == ["http://e/T"]


class TestShapeExtraction:
    SHACL = (
        PRE + "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
        "<http://e/PersonShape> a sh:NodeShape ;\n"
        "  sh:targetClass <http://e/Person> ;\n"
        "  sh:property [\n"
        "    sh:path <http://e/name> ;\n"
        '    sh:datatype <http://www.w3.org/2001/XMLSchema#string> ;\n'
        '    sh:minCount 1 ;\n'
        "  ] ;\n"
        "  sh:minCount 2 .\n"
    )

    def test_node_shape(self):
        r = parse_document(self.SHACL)
        s = r["shapes"]["http://e/PersonShape"]
        assert s["target_class"] == "http://e/Person"
        assert s["constraints"] == {"minCount": "2"}

    def test_nested_property_shapes(self):
        r = parse_document(self.SHACL)
        ps = r["shapes"]["http://e/PersonShape"]["property_shapes"]
        assert len(ps) == 1
        assert ps[0]["path"] == "http://e/name"
        assert ps[0]["minCount"] == "1"
        assert ps[0]["datatype"].endswith("#string")

    def test_property_shape_without_path_dropped(self):
        r = parse_document(
            PRE + "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
            "<http://e/S> a sh:NodeShape ; sh:property [ sh:minCount 1 ] ."
        )
        assert r["shapes"]["http://e/S"]["property_shapes"] == []

    def test_rdfxml_shapes_empty(self):
        # ShapeExtractor.php:56-58 — RDF/XML → no shapes
        content = (
            '<?xml version="1.0"?>\n'
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
            ' xmlns:sh="http://www.w3.org/ns/shacl#">\n'
            '<sh:NodeShape rdf:about="http://e/S"/></rdf:RDF>'
        )
        assert parse_document(content)["shapes"] == {}


class TestPrefixExtraction:
    def test_turtle_prefixes(self):
        r = parse_document(PRE + "<http://e/C> a rdfs:Class .")
        assert r["prefixes"]["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"

    def test_sparql_prefix_style(self):
        r = parse_document(
            "PREFIX ex: <http://example.org/>\nex:C a <http://www.w3.org/2000/01/rdf-schema#Class> ."
        )
        assert r["prefixes"]["ex"] == "http://example.org/"

    def test_common_prefixes_add_only(self):
        # X5: well-known prefix added iff a resource URI uses the namespace
        # AND it was not already declared (PrefixExtractorTest.php:124-137)
        r = parse_document(
            "@prefix myrdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
            "<http://e/C> a myrdfs:Class ."
        )
        assert r["prefixes"]["myrdfs"] == "http://www.w3.org/2000/01/rdf-schema#"
        # auto-detected since 'rdfs' itself was not declared
        assert r["prefixes"]["rdfs"] == "http://www.w3.org/2000/01/rdf-schema#"

    def test_declared_wins_over_common(self):
        r = parse_document(
            "@prefix rdfs: <http://my.custom/ns#> .\n"
            "<http://e/s> <http://my.custom/ns#p> <http://e/o> ."
        )
        assert r["prefixes"]["rdfs"] == "http://my.custom/ns#"

    def test_jsonld_context(self):
        r = parse_document(
            '{"@context": {"ex": "http://example.org/"},'
            ' "@id": "ex:X", "@type": "http://www.w3.org/2000/01/rdf-schema#Class"}'
        )
        assert r["prefixes"]["ex"] == "http://example.org/"

    def test_xmlns(self):
        content = (
            '<?xml version="1.0"?>\n'
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
            ' xmlns:ex="http://example.org/">\n'
            '<rdf:Description rdf:about="http://example.org/x"/></rdf:RDF>'
        )
        assert parse_document(content)["prefixes"]["ex"] == "http://example.org/"


class TestParserLevel:
    def test_empty_content_raises(self):
        with pytest.raises(ParseError, match="Cannot parse empty content"):
            parse_document("   \n  ")

    def test_unknown_format_raises_format_detection(self):
        with pytest.raises(FormatDetectionError):
            parse_document("just some plain text, nothing rdf")

    def test_explicit_format_override(self):
        r = parse_document(
            "<http://e/s> <http://e/p> <http://e/o> .", {"format": "n-triples"}
        )
        assert r["format"] == "n-triples"

    def test_explicit_unknown_format(self):
        # n-quads graduated to a registered handler in round 5, so the
        # unknown-name probe uses a format the engine genuinely lacks
        with pytest.raises(FormatDetectionError, match="No handler registered"):
            parse_document("<http://e/s> <http://e/p> <http://e/o> .", {"format": "trig"})

    def test_metadata_format_and_resource_count(self):
        r = parse_document(PRE + "<http://e/A> a rdfs:Class .")
        assert r["metadata"]["format"] == "turtle"
        assert r["metadata"]["resource_count"] == 2  # subject + type object

    def test_graphs_default_sentinel(self):
        r = parse_document(PRE + "<http://e/A> a rdfs:Class .")
        assert "_:default" in r["graphs"]

    def test_raw_content_preserved(self):
        content = PRE + "<http://e/A> a rdfs:Class ."
        assert parse_document(content)["raw_content"] == content

    def test_can_parse_never_throws(self):
        from parser_rdf_ray.parser import can_parse

        assert can_parse("total garbage }{") is False
        assert can_parse(PRE + "<http://e/A> a rdfs:Class .") is True

    def test_integration_all_formats(self):
        # RdfParserPipelineTest.php:30-83 — same extraction across 4 formats
        import pathlib

        fixtures = pathlib.Path("/root/reference/tests/Fixtures/Integration")
        if not fixtures.is_dir():
            pytest.skip("reference tree not mounted")
        for name, fmt in [
            ("sample.ttl", "turtle"),
            ("sample.nt", "n-triples"),
            ("sample.jsonld", "json-ld"),
            ("sample.rdf", "rdf/xml"),
        ]:
            content = (fixtures / name).read_text()
            r = parse_document(content)
            assert r["format"] == fmt, name
            assert "http://example.org/Person" in r["classes"], name
            assert "http://example.org/name" in r["properties"], name
            if fmt != "n-triples":  # NT has no prefix declarations to extract
                assert r["prefixes"].get("ex") == "http://example.org/", name
            assert r["classes"]["http://example.org/Person"]["labels"].get("en") == "Person", name
            prop = r["properties"]["http://example.org/name"]
            assert prop["domain"] == ["http://example.org/Person"], name


class TestAnonymousOwlExpressions:
    """E5 (ClassExtractor.php:80-82; ClassExtractorTest.php:250-268):
    owl:Restriction nodes and nodes carrying OWL set-operation predicates
    are never emitted as classes, even when also typed as a class."""

    def test_owl_restriction_skipped(self):
        doc = PRE + (
            "<http://ex.org/R> a owl:Restriction, owl:Class ; "
            "owl:onProperty <http://ex.org/p> .\n"
            '<http://ex.org/C> a owl:Class ; rdfs:label "C" .\n'
        )
        result = parse_document(doc)
        assert "http://ex.org/C" in result["classes"]
        assert "http://ex.org/R" not in result["classes"]

    def test_union_expression_node_skipped(self):
        doc = PRE + (
            "<http://ex.org/U> a owl:Class ; "
            "owl:unionOf ( <http://ex.org/A> <http://ex.org/B> ) .\n"
            "<http://ex.org/A> a owl:Class .\n"
        )
        result = parse_document(doc)
        assert "http://ex.org/A" in result["classes"]
        assert "http://ex.org/U" not in result["classes"]


class TestXmlFallbackProperties:
    """E21 property path (PropertyExtractor.php:273-483) — element-name
    typing, functional detection, Dublin-Core rdf:type-attribute pattern,
    and XML range-from-comment."""

    XMLNS = (
        'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#"'
    )

    def _props(self, body: str) -> dict:
        doc = f'<?xml version="1.0"?>\n<rdf:RDF {self.XMLNS}>\n{body}\n</rdf:RDF>'
        return parse_document(doc, {"format": "rdf/xml"})["properties"]

    def test_element_name_typing_checked_first(self):
        props = self._props(
            '<owl:ObjectProperty rdf:about="http://ex.org/knows">'
            '<rdf:type rdf:resource="http://www.w3.org/2002/07/owl#DatatypeProperty"/>'
            "</owl:ObjectProperty>"
        )
        # element name wins over the rdf:type child
        assert props["http://ex.org/knows"]["property_type"] == "object"

    def test_functional_from_element_name(self):
        props = self._props(
            '<owl:FunctionalProperty rdf:about="http://ex.org/id"/>'
        )
        assert props["http://ex.org/id"]["is_functional"] is True

    def test_dublin_core_rdf_type_attribute_pattern(self):
        props = self._props(
            '<rdf:Description rdf:about="http://purl.org/dc/terms/title">'
            '<rdf:type rdf:resource="http://www.w3.org/1999/02/22-rdf-syntax-ns#Property"/>'
            '<rdfs:label>Title</rdfs:label>'
            "</rdf:Description>"
        )
        assert "http://purl.org/dc/terms/title" in props
        assert props["http://purl.org/dc/terms/title"]["label"] == "Title"

    def test_xml_range_from_comment(self):
        props = self._props(
            '<rdf:Property rdf:about="http://ex.org/age">'
            "<rdfs:comment>The range of this property is an integer value.</rdfs:comment>"
            "</rdf:Property>"
        )
        assert props["http://ex.org/age"]["range"] == [
            "http://www.w3.org/2001/XMLSchema#integer"
        ]
        assert props["http://ex.org/age"]["metadata"]["source"] == "fallback_rdf_xml"


class TestShapeScalarsAndAliases:
    def test_all_five_shape_targets(self):
        doc = (
            "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
            "<http://ex.org/S> a sh:NodeShape ;\n"
            "  sh:targetClass <http://ex.org/C> ;\n"
            "  sh:targetNode <http://ex.org/n1> ;\n"
            "  sh:targetSubjectsOf <http://ex.org/p1> ;\n"
            "  sh:targetObjectsOf <http://ex.org/p2> ;\n"
            "  sh:path <http://ex.org/p3> .\n"
        )
        s = parse_document(doc)["shapes"]["http://ex.org/S"]
        assert s["target_class"] == "http://ex.org/C"
        assert s["target_node"] == "http://ex.org/n1"
        assert s["target_subjects_of"] == "http://ex.org/p1"
        assert s["target_objects_of"] == "http://ex.org/p2"
        assert s["target_property"] == "http://ex.org/p3"

    def test_top_level_property_shape(self):
        doc = (
            "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
            "<http://ex.org/PS> a sh:PropertyShape ; sh:path <http://ex.org/p> .\n"
        )
        assert "http://ex.org/PS" in parse_document(doc)["shapes"]

    def test_constraint_keys_without_sh_prefix(self):
        doc = (
            "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
            '<http://ex.org/S> a sh:NodeShape ; sh:minCount "1" ; sh:maxCount "5" ; '
            'sh:pattern "^x" .\n'
        )
        c = parse_document(doc)["shapes"]["http://ex.org/S"]["constraints"]
        assert c == {"minCount": "1", "maxCount": "5", "pattern": "^x"}

    def test_blank_node_shape_skipped(self):
        doc = (
            "@prefix sh: <http://www.w3.org/ns/shacl#> .\n"
            "[] a sh:NodeShape ; sh:targetClass <http://ex.org/C> .\n"
            "<http://ex.org/S2> a sh:NodeShape .\n"
        )
        shapes = parse_document(doc)["shapes"]
        assert list(shapes) == ["http://ex.org/S2"]

    def test_prefix_extraction_format_aliases(self):
        from parser_rdf_ray.extract.entities import _prefixes_from_content

        ttl = "@prefix foo: <http://foo.org/> ."
        assert _prefixes_from_content(ttl, "ttl") == _prefixes_from_content(ttl, "turtle")
        xml = '<rdf:RDF xmlns:bar="http://bar.org/"/>'
        assert _prefixes_from_content(xml, "xml") == _prefixes_from_content(xml, "rdf/xml")
