"""Doc-scope triple index + resource-helper semantics.

The reference queries an in-memory object graph through ResourceHelperTrait
(parser-core). Here a document's triples are indexed ONCE into dicts
(SURVEY.md §7.3 hard part 3 — build per-doc indexes once, not per lookup)
and the trait's behaviors, pinned by the reference unit tests, are methods:

- label/comment best-match: exact 'en' preferred, else untagged, else first
  (ClassExtractorTest.php:114-131: en preferred over nl; no-label → None)
- labels/descriptions: lang→value maps (untagged under '')
- multi-valued IRI collection (rdfs:subClassOf etc. — full URIs only)
- named-resource values (rdfs:seeAlso/isDefinedBy: IRIs only)
- custom annotations with prefix-compacted property names
  (ClassExtractorTest.php:381-402)
- anonymous-OWL-expression detection (ClassExtractor.php:80-82)
- RDF list traversal rdf:first/rdf:rest→rdf:nil (PropertyExtractor.php:194-218)
"""

from __future__ import annotations

from collections import defaultdict

from parser_rdf_ray.model import BNODE, IRI, LITERAL, Triple
from parser_rdf_ray.vocab import (
    ANONYMOUS_OWL_PREDICATES,
    CORE_ENTITY_PREDICATES,
    OWL_RESTRICTION,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
)


def _key(kind: str, value: str) -> str:
    """Node key inside a document: IRIs by URI, bnodes namespaced apart."""
    return value if kind == IRI else "_:" + value


class DocGraph:
    """Immutable per-document triple index."""

    __slots__ = ("triples", "by_subj", "by_subj_pred", "subjects", "resource_iris")

    def __init__(self, triples: list[Triple]):
        self.triples = triples
        by_subj: dict[str, list[Triple]] = defaultdict(list)
        by_subj_pred: dict[tuple[str, str], list[Triple]] = defaultdict(list)
        subjects: dict[str, str] = {}  # key -> kind
        resource_iris: set[str] = set()
        for t in triples:
            k = _key(t.subj_kind, t.subj)
            by_subj[k].append(t)
            by_subj_pred[(k, t.pred)].append(t)
            subjects.setdefault(k, t.subj_kind)
            if t.subj_kind == IRI:
                resource_iris.add(t.subj)
            if t.obj_kind == IRI:
                resource_iris.add(t.obj)
        self.by_subj = dict(by_subj)
        self.by_subj_pred = dict(by_subj_pred)
        self.subjects = subjects
        self.resource_iris = resource_iris

    # --- resource enumeration -----------------------------------------
    def resources(self):
        """All subject nodes (key, kind) in first-seen order — the scope the
        reference's graph->resources() iteration visits for extraction."""
        return self.subjects.items()

    def resource_count(self) -> int:
        """metadata['resource_count'] — distinct subjects ∪ IRI objects ∪
        bnode objects (every node that is a 'resource' in the graph)."""
        nodes = set(self.subjects)
        for t in self.triples:
            if t.obj_kind in (IRI, BNODE):
                nodes.add(_key(t.obj_kind, t.obj))
        return len(nodes)

    # --- value access --------------------------------------------------
    def objects(self, key: str, pred: str) -> list[Triple]:
        return self.by_subj_pred.get((key, pred), [])

    def types(self, key: str) -> list[str]:
        return [t.obj for t in self.objects(key, RDF_TYPE) if t.obj_kind == IRI]

    def iri_values(self, key: str, pred: str) -> list[str]:
        """Multi-valued IRI collection — full URIs only (SURVEY.md E8)."""
        out = []
        seen = set()
        for t in self.objects(key, pred):
            if t.obj_kind == IRI and t.obj not in seen:
                seen.add(t.obj)
                out.append(t.obj)
        return out

    def first_value(self, key: str, pred: str) -> str | None:
        """Single-value access: first object's lexical form (IRI or literal),
        the trait's getResourceValue used by ShapeExtractor fields."""
        for t in self.objects(key, pred):
            if t.obj_kind in (IRI, LITERAL):
                return t.obj
        return None

    def lang_map(self, key: str, pred: str) -> dict[str, str]:
        """lang→value map over literal objects; untagged under ''."""
        out: dict[str, str] = {}
        for t in self.objects(key, pred):
            if t.obj_kind == LITERAL:
                out.setdefault(t.obj_lang, t.obj)
        return out

    @staticmethod
    def best_match(lang_values: dict[str, str]) -> str | None:
        """English-preferred single value (ClassExtractorTest.php:114-131)."""
        if "en" in lang_values:
            return lang_values["en"]
        for lang, v in lang_values.items():
            if lang.startswith("en-"):
                return v
        if "" in lang_values:
            return lang_values[""]
        for v in lang_values.values():
            return v
        return None

    def label(self, key: str) -> str | None:
        from parser_rdf_ray.vocab import RDFS_LABEL

        return self.best_match(self.lang_map(key, RDFS_LABEL))

    def labels(self, key: str) -> dict[str, str]:
        from parser_rdf_ray.vocab import RDFS_LABEL

        return {k: v for k, v in self.lang_map(key, RDFS_LABEL).items() if k}

    def comment(self, key: str) -> str | None:
        from parser_rdf_ray.vocab import RDFS_COMMENT

        return self.best_match(self.lang_map(key, RDFS_COMMENT))

    def comments(self, key: str) -> dict[str, str]:
        from parser_rdf_ray.vocab import RDFS_COMMENT

        return {k: v for k, v in self.lang_map(key, RDFS_COMMENT).items() if k}

    def comment_texts(self, key: str) -> list[str]:
        from parser_rdf_ray.vocab import RDFS_COMMENT

        return [t.obj for t in self.objects(key, RDFS_COMMENT) if t.obj_kind == LITERAL]

    def named_values(self, key: str, pred: str) -> list[str]:
        """getNamedResourceValues — IRI objects only (bnodes excluded)."""
        return self.iri_values(key, pred)

    # --- higher-level trait behaviors ----------------------------------
    def is_anonymous_owl_expression(self, key: str) -> bool:
        """A node is an anonymous OWL class expression if it carries OWL
        set-operation predicates or is typed owl:Restriction
        (ClassExtractor.php:80-82; ClassExtractorTest.php:250-268)."""
        for t in self.by_subj.get(key, ()):
            if t.pred in ANONYMOUS_OWL_PREDICATES:
                return True
            if t.pred == RDF_TYPE and t.obj == OWL_RESTRICTION:
                return True
        return False

    def annotations(self, key: str, prefixes: dict[str, str]) -> list[dict]:
        """Non-core predicate/value pairs with prefix-compacted property
        names, e.g. skos:prefLabel (ClassExtractorTest.php:381-402)."""
        # longest-namespace-first for correct compaction
        ns_sorted = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))
        out = []
        for t in self.by_subj.get(key, ()):
            if t.pred in CORE_ENTITY_PREDICATES:
                continue
            prop = t.pred
            for pfx, ns in ns_sorted:
                if prop.startswith(ns):
                    prop = f"{pfx}:{prop[len(ns):]}"
                    break
            out.append({"property": prop, "value": t.obj, "lang": t.obj_lang})
        return out

    def rdf_list_members(self, head_key: str) -> list[str]:
        """rdf:first/rdf:rest chain → member URIs
        (PropertyExtractor.php:194-218). Bounded by doc size (cycle-safe)."""
        members: list[str] = []
        seen: set[str] = set()
        current = head_key
        while current != RDF_NIL and current not in seen:
            seen.add(current)
            first = self.objects(current, RDF_FIRST)
            for t in first:
                if t.obj_kind == IRI:
                    members.append(t.obj)
                elif t.obj_kind == BNODE:
                    members.append("_:" + t.obj)
                break
            rest = self.objects(current, RDF_REST)
            if not rest:
                break
            rt = rest[0]
            current = rt.obj if rt.obj_kind == IRI else "_:" + rt.obj
        return members
