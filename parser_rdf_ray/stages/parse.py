"""Parse stage (S2-S5, P1-P17): assembled documents → triple/error rows.

One fused map_batches function: per document, detect format (or use the
pipeline's explicit override), parse, and flat-map to triple rows. Parse
failures become rows with error_type set (RdfParser's exception taxonomy,
RdfParser.php:68-76, turned into data — a poison doc can't kill the job).

The triples+errors union schema keeps the stage single-output (Ray Data
streams one table per stage); downstream splits with a cheap Arrow filter.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from parser_rdf_ray.formats.detect import DEFAULT_PLUGINS, get_plugin
from parser_rdf_ray.model import ParseError
from parser_rdf_ray.vocab import DEFAULT_GRAPH, FORMAT_UNKNOWN

TRIPLES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("graph", pa.string()),
        ("subj", pa.string()),
        ("subj_kind", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_kind", pa.string()),
        ("obj_datatype", pa.string()),
        ("obj_lang", pa.string()),
        ("line_no", pa.int32()),
        ("format", pa.string()),
        ("error_type", pa.string()),  # "" for triple rows
    ]
)


class ParseToTriples:
    """Stateless-per-batch callable; held as a class so format plugins are
    resolved once per actor/worker, not per batch."""

    def __init__(self, format_override: str | None = None, plugins=DEFAULT_PLUGINS):
        self.plugins = plugins
        self.format_override = format_override
        self._override_plugin = (
            get_plugin(format_override, plugins) if format_override else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("rdf_text").to_pylist()
        asm_errors = (
            batch.column("assembly_error").to_pylist()
            if "assembly_error" in batch.column_names
            else [""] * len(doc_ids)
        )

        # Triple rows: accumulate Triple tuples and transpose ONCE with
        # zip(*) (C speed) instead of 12 list appends per triple. Neutral
        # single-core, but the reduced allocation churn lifts the 32-way
        # concurrent end-to-end run ~1.5x (500k → 700-800k triples/s) —
        # small-object churn is what degrades under full-node concurrency.
        all_triples: list = []
        meta: list[tuple[str, str, int]] = []  # (doc_id, format, n_triples)
        err: dict[str, list] = {name: [] for name in TRIPLES_SCHEMA.names}

        def emit_error(doc_id: str, fmt: str, error_type: str, message: str, line_no: int):
            err["doc_id"].append(doc_id)
            err["graph"].append(DEFAULT_GRAPH)
            err["subj"].append("")
            err["subj_kind"].append("")
            err["pred"].append("")
            err["obj"].append(message)
            err["obj_kind"].append("")
            err["obj_datatype"].append("")
            err["obj_lang"].append("")
            err["line_no"].append(line_no)
            err["format"].append(fmt)
            err["error_type"].append(error_type)

        for doc_id, text, asm_err in zip(doc_ids, texts, asm_errors):
            if asm_err:
                emit_error(doc_id, "", "AssemblyError", asm_err, 0)
                continue
            if not text.strip():
                # RdfParser.php:58-61
                emit_error(doc_id, "", "ParseException", "Cannot parse empty content", 0)
                continue

            plugin = self._override_plugin
            if plugin is None:
                for p in self.plugins:
                    try:
                        if p.sniff(text):
                            plugin = p
                            break
                    except Exception:
                        continue
            if plugin is None:
                emit_error(
                    doc_id,
                    FORMAT_UNKNOWN,
                    "FormatDetectionException",
                    "No handler could detect the format of the provided content",
                    0,
                )
                continue

            try:
                triples, _extras = plugin.parse(text)
            except ParseError as e:
                emit_error(doc_id, plugin.name, "ParseException", e.message, e.line_no)
                continue
            except Exception as e:  # foreign error wrap (RdfParser.php:70-76)
                emit_error(
                    doc_id, plugin.name, "ParseException", f"RDF parsing failed: {e}", 0
                )
                continue

            if triples:
                all_triples.extend(triples)
                meta.append((doc_id, plugin.name, len(triples)))

        if all_triples:
            subj, subj_kind, pred, obj, obj_kind, obj_dt, obj_lang, line_no, graph = (
                list(c) for c in zip(*all_triples)
            )
            counts = [m[2] for m in meta]
            doc_col = np.repeat(np.array([m[0] for m in meta], dtype=object), counts)
            fmt_col = np.repeat(np.array([m[1] for m in meta], dtype=object), counts)
            n = len(all_triples)
            # "" → default-graph sentinel; named graphs (JSON-LD @id+@graph)
            # carry their IRI through every downstream stage
            graph_col = [g or DEFAULT_GRAPH for g in graph]
            triple_tbl = pa.Table.from_arrays(
                [
                    pa.array(doc_col, pa.string()),
                    pa.array(graph_col, pa.string()),
                    pa.array(subj, pa.string()),
                    pa.array(subj_kind, pa.string()),
                    pa.array(pred, pa.string()),
                    pa.array(obj, pa.string()),
                    pa.array(obj_kind, pa.string()),
                    pa.array(obj_dt, pa.string()),
                    pa.array(obj_lang, pa.string()),
                    pa.array(line_no, pa.int32()),
                    pa.array(fmt_col, pa.string()),
                    pa.array([""] * n, pa.string()),
                ],
                schema=TRIPLES_SCHEMA,
            )
        else:
            triple_tbl = TRIPLES_SCHEMA.empty_table()

        if not err["doc_id"]:
            return triple_tbl
        err_tbl = pa.Table.from_arrays(
            [pa.array(err[f], TRIPLES_SCHEMA.field(f).type) for f in TRIPLES_SCHEMA.names],
            schema=TRIPLES_SCHEMA,
        )
        return pa.concat_tables([triple_tbl, err_tbl])


def ok_triples(ds):
    """Triple rows only (drop error rows) — Arrow-expression filter."""
    return ds.filter(expr="error_type == ''")


def error_rows(ds):
    return ds.filter(expr="error_type != ''")
