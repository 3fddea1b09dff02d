"""Core IR: the triple record and parse-error taxonomy.

The engine's graph representation is a flat table of Triple rows (not an
object graph — the reference's in-memory EasyRdf graph has no distributed
equivalent; see SURVEY.md §1.3). Term kinds:

    subj_kind ∈ {iri, bnode}
    obj_kind  ∈ {iri, bnode, literal}

Literal objects carry optional ``obj_datatype`` and ``obj_lang`` (mutually
exclusive, per RDF 1.1). Blank nodes are stored with their bare label
(no ``_:`` prefix) in ``subj``/``obj`` when kind == bnode.
"""

from __future__ import annotations

from typing import NamedTuple

IRI = "iri"
BNODE = "bnode"
LITERAL = "literal"


class Triple(NamedTuple):
    subj: str
    subj_kind: str
    pred: str
    obj: str
    obj_kind: str
    obj_datatype: str  # "" when absent
    obj_lang: str  # "" when absent
    line_no: int  # 1-based source line where available, else 0
    # named-graph IRI; "" means the default graph (the parse stage maps ""
    # to the "_:default" sentinel, RdfParser.php:136-154). Only formats
    # that can express named graphs (JSON-LD @id+@graph) set this.
    graph: str = ""


class ParseError(Exception):
    """Per-document parse failure ('ParseException' in the reference,
    RdfParser.php:59-76). At dataset scale these become error *rows*, not
    raised exceptions — one poison document must not kill the job."""

    def __init__(self, message: str, line_no: int = 0):
        super().__init__(message)
        self.message = message
        self.line_no = line_no


class FormatDetectionError(Exception):
    """No handler matched / unknown explicit format (RdfParser.php:244-258)."""

    def __init__(self, message: str):
        super().__init__(message)
        self.message = message


# error_type values for the errors table
ERROR_PARSE = "ParseException"
ERROR_FORMAT = "FormatDetectionException"


def error_row(doc_id: str, stage: str, error_type: str, message: str, line_no: int = 0) -> dict:
    return {
        "doc_id": doc_id,
        "stage": stage,
        "error_type": error_type,
        "message": message,
        "line_no": line_no,
    }
