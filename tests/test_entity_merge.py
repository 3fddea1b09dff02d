"""Vectorized entity-merge equivalence pins (stages/extract.py).

The W1 global merge's nested-JSON columns (labels/descriptions/annotations)
merge through the vectorized polars path (_merged_map_frame /
_merged_annotations_frame). These tests pin byte-equivalence against the
retained per-group Python fallback (_merge_json_maps /
_merge_annotation_lists) on conflict-free inputs, the escape fallback's
json.dumps byte format, and the documented conflict rule (per-lang MAX,
phase-stable under salting — where the old json-string-order rule wasn't).

Pure-function tests: no Ray session needed.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from parser_rdf_ray.stages.extract import (
    CLASSES_SCHEMA,
    _class_merge_block,
    _merge_annotation_lists,
    _merge_json_maps,
    merge_classes_global,
)


def _mk_batch(rows):
    cols = {n: [] for n in CLASSES_SCHEMA.names}
    defaults = {
        "label": None,
        "description": None,
        "parent_classes": [],
        "types": [],
        "see_also": [],
        "is_defined_by": [],
        "source": "s",
    }
    for r in rows:
        for n in CLASSES_SCHEMA.names:
            cols[n].append(r.get(n, defaults.get(n)))
    t = pa.Table.from_arrays(
        [pa.array(cols[n], CLASSES_SCHEMA.field(n).type) for n in CLASSES_SCHEMA.names],
        schema=CLASSES_SCHEMA,
    )
    return t.sort_by("uri")  # block contract: keys-sorted


def _row(doc, uri, labels, descs=None, anns=None, label=None):
    return dict(
        doc_id=doc,
        uri=uri,
        label=label if label is not None else (labels.get("en") if labels else None),
        labels_json=json.dumps(labels, sort_keys=True),
        descriptions_json=json.dumps(descs or {}, sort_keys=True),
        annotations_json=json.dumps(anns or [], sort_keys=True),
    )


class TestVectorizedMergeEquivalence:
    def test_matches_per_group_python_path(self):
        rows = [
            _row("d1", "u1", {"en": "Person", "de": "Mensch"},
                 {"en": "a person"},
                 [{"property": "skos:pref", "value": "P", "lang": None}]),
            _row("d2", "u1", {"en": "Person", "fr": "Personne"}, {},
                 [{"property": "skos:pref", "value": "P", "lang": None},
                  {"property": "skos:alt", "value": "Q", "lang": "en"}]),
            _row("d3", "u2", {}, {}, [], label="fallback-label"),
            _row("d4", "u3", {"de": "Katze"}, {"de": "eine Katze"}, []),
            _row("d5", "u1", {"en": "Person"}, {"en": "a person"}, []),
        ]
        out = _class_merge_block("plain")(_mk_batch(rows)).to_pydict()

        def uniq_sorted(jsons):
            return sorted(set(jsons))

        by_uri = {}
        for r in rows:
            by_uri.setdefault(r["uri"], []).append(r)
        uris = sorted(by_uri)
        exp_labels, exp_label = _merge_json_maps(
            [uniq_sorted([r["labels_json"] for r in by_uri[u]]) for u in uris],
            [min((r["label"] for r in by_uri[u] if r["label"] is not None),
                 default=None) for u in uris],
        )
        exp_anns = _merge_annotation_lists(
            [uniq_sorted([r["annotations_json"] for r in by_uri[u]]) for u in uris]
        )
        assert out["uri"] == uris
        assert out["labels_json"] == exp_labels
        assert out["label"] == exp_label
        assert out["annotations_json"] == exp_anns

    def test_escape_fallback_matches_json_dumps(self):
        labels = {"en": 'He said "hi" \\ ünïcode', "de": "tab\there"}
        anns = [{"property": "p", "value": "ünï", "lang": None}]
        out = _class_merge_block("plain")(
            _mk_batch([_row("d1", "u1", labels, {}, anns)])
        ).to_pydict()
        assert out["labels_json"][0] == json.dumps(labels, sort_keys=True)
        assert out["annotations_json"][0] == json.dumps(
            [{"lang": None, "property": "p", "value": "ünï"}],
            sort_keys=True,
        )

    def test_conflict_rule_is_per_lang_max(self):
        # same uri, conflicting en values: max wins regardless of which
        # source map sorts last (phase-stability contract)
        rows = [
            _row("d1", "u1", {"en": "zebra", "de": "aa"}),
            _row("d2", "u1", {"en": "apple"}),
        ]
        out = _class_merge_block("plain")(_mk_batch(rows)).to_pydict()
        assert json.loads(out["labels_json"][0]) == {"en": "zebra", "de": "aa"}
        assert out["label"][0] == "zebra"

    def test_non_string_map_values_use_python_fallback(self):
        # a non-string value in any map rejects the vectorized path for
        # the whole block; the per-group fallback must still produce the
        # dict-union result (display stays the en string, as before)
        rows = [
            dict(
                doc_id="d1",
                uri="u1",
                label="L",
                labels_json=json.dumps({"en": "ok", "x-rank": 3}, sort_keys=True),
                descriptions_json="{}",
                annotations_json="[]",
            ),
            dict(
                doc_id="d2",
                uri="u1",
                label="L",
                labels_json=json.dumps({"de": "gut"}, sort_keys=True),
                descriptions_json="{}",
                annotations_json="[]",
            ),
        ]
        out = _class_merge_block("plain")(_mk_batch(rows)).to_pydict()
        assert out["labels_json"][0] == json.dumps(
            {"de": "gut", "en": "ok", "x-rank": 3}, sort_keys=True
        )
        assert out["label"][0] == "ok"

    def test_all_null_annotation_record_survives_empty_list_placeholder(self):
        # an all-null annotation record shares the (null, null, null) dedup
        # key with the empty-list explode placeholder; _rec in the unique
        # subset guarantees the REAL record always survives (the former
        # keep="any" could nondeterministically keep the placeholder and
        # drop it, diverging from the Python fallback)
        null_rec = {"property": None, "value": None, "lang": None}
        rows = [
            _row("d1", "u1", {}, {}, [null_rec]),
            _row("d2", "u1", {}, {}, []),
        ]
        out = _class_merge_block("plain")(_mk_batch(rows)).to_pydict()
        assert out["annotations_json"][0] == json.dumps(
            [{"lang": None, "property": None, "value": None}], sort_keys=True
        )
        # and matches the per-group Python fallback byte-for-byte
        exp = _merge_annotation_lists(
            [sorted({r["annotations_json"] for r in rows})]
        )
        assert out["annotations_json"] == exp

    def test_empty_maps_and_lists(self):
        rows = [
            _row("d1", "u1", {}, {}, []),
            _row("d2", "u1", {}, {}, []),
        ]
        out = _class_merge_block("plain")(_mk_batch(rows)).to_pydict()
        assert out["labels_json"] == ["{}"]
        assert out["annotations_json"] == ["[]"]
        assert out["n_docs"] == [2]


@pytest.mark.usefixtures("ray_session")
class TestSaltedMergePhaseStability:
    def test_salted_equals_plain(self, monkeypatch):
        import ray.data

        # the size-adaptive gate would route this tiny table to the plain
        # path; force the REAL salted two-phase so the test isn't vacuous
        monkeypatch.setenv("GRAFT_SALTED_MERGE_MIN", "0")

        rows = []
        for i in range(60):
            rows.append(
                _row(
                    f"d{i}",
                    f"http://ex.org/C{i % 7}",
                    {"en": f"L{i % 7}", "de": f"D{i % 7}"},
                    {"en": f"desc{i % 7}"},
                    [{"property": "skos:alt", "value": f"v{i % 3}", "lang": None}],
                )
            )
        b = _mk_batch(rows)
        ds = ray.data.from_arrow(b)
        plain = merge_classes_global(ds).to_pandas().sort_values("uri").reset_index(drop=True)
        salted = (
            merge_classes_global(ray.data.from_arrow(b), salt_buckets=4)
            .to_pandas()
            .sort_values("uri")
            .reset_index(drop=True)
        )
        assert plain.equals(salted)
