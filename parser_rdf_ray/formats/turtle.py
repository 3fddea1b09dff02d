"""Turtle sniffer + parser.

The reference delegates Turtle to an external handler whose *behavioral scope*
is pinned by docs/spec-completeness.md:137-148: ``@prefix`` / SPARQL ``PREFIX``
declarations, the ``a`` keyword, predicate lists ``;``, object lists ``,``,
blank-node property lists ``[...]``, collections ``(...)``, typed literals
``^^``, language tags ``@lang``. ``@base`` is intentionally NOT supported
(reference scope). We add numeric/boolean literal shorthand and long strings
(standard Turtle) so real-world fixtures parse.

This is a fresh recursive-descent implementation over a compiled-regex
tokenizer — nothing here ports reference control flow (the reference has none
for Turtle; its handler is a closed-source composer package).
"""

from __future__ import annotations

import itertools
import re

from parser_rdf_ray.model import BNODE, IRI, LITERAL, ParseError, Triple
from parser_rdf_ray.vocab import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD

_DETECT_RE = re.compile(r"^\s*(@prefix|prefix|@base|base)\s", re.I | re.M)
_SPARQL_PREFIX_RE = re.compile(r"^\s*PREFIX\s+[\w\-]*:", re.I | re.M)

# Token regex: order matters (longest / most specific first)
_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<lstr3>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<str>\"(?:[^"\\\n]|\\.)*\"|'(?:[^'\\\n]|\\.)*')
    | (?P<bnode>_:[A-Za-z0-9_][A-Za-z0-9_\-.]*)
    | (?P<prefixed>[A-Za-z][\w\-]*:[\w\-.%:]*|:[\w\-.%:]*|[A-Za-z][\w\-]*:)
    | (?P<kw>@prefix|@base|\ba\b|true|false)
    | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<num>[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
    | (?P<punct>\^\^|[.;,\[\]()])
    | (?P<word>PREFIX|BASE)
    """,
    re.X,
)

_ESC_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf\"'\\\\])")
_ESC_MAP = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def can_handle(content: str) -> bool:
    """Turtle detection: ``@prefix`` or SPARQL ``PREFIX`` present
    (docs/spec-completeness.md:293; tests/Unit/RdfParserTest.php:33-35)."""
    return bool(_DETECT_RE.search(content)) or bool(_SPARQL_PREFIX_RE.search(content))


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s

    def repl(m: re.Match) -> str:
        g = m.group(1)
        if g[0] in "uU":
            return chr(int(g[1:], 16))
        return _ESC_MAP[g[0]]

    return _ESC_RE.sub(repl, s)


# Tokens are plain (kind, value) tuples — tuple construction and index
# access are measurably cheaper than __slots__ objects in this hot loop
# (the tokenizer is ~60% of Turtle parse time).
def _tokenize(content: str) -> list[tuple]:
    # finditer iterates matches at C speed; the contiguity check (a gap
    # between consecutive matches = an unmatchable character) preserves the
    # per-position error semantics of an explicit match loop.
    toks: list[tuple] = []
    append = toks.append
    pos = 0
    for m in _TOKEN_RE.finditer(content):
        start = m.start()
        if start != pos:
            line_no = content.count("\n", 0, pos) + 1
            raise ParseError(
                f"Turtle parsing failed: unexpected character {content[pos]!r} on line {line_no}",
                line_no,
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        value = m.group()
        if kind in ("prefixed", "bnode") and value.endswith("."):
            # PN_LOCAL must not end with '.' — the dot terminates the triple.
            # pos moves backwards, which finditer can't replay: hand the rest
            # of the input to the explicit match-at-position loop.
            stripped = value.rstrip(".")
            pos -= len(value) - len(stripped)
            append((kind, stripped))
            return _tokenize_slow(content, toks, pos)
        append((kind, value))
    if pos != len(content):
        line_no = content.count("\n", 0, pos) + 1
        raise ParseError(
            f"Turtle parsing failed: unexpected character {content[pos]!r} on line {line_no}",
            line_no,
        )
    append(("eof", ""))
    return toks


def _tokenize_slow(content: str, toks: list[tuple], pos: int) -> list[tuple]:
    """Explicit match-at-position loop, used from the point a token was
    '.'-stripped (position moved backwards, which finditer can't replay)."""
    n = len(content)
    while pos < n:
        m = _TOKEN_RE.match(content, pos)
        if not m or m.end() == pos:
            line_no = content.count("\n", 0, pos) + 1
            raise ParseError(
                f"Turtle parsing failed: unexpected character {content[pos]!r} on line {line_no}",
                line_no,
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        value = m.group()
        if kind in ("prefixed", "bnode") and value.endswith("."):
            stripped = value.rstrip(".")
            pos -= len(value) - len(stripped)
            value = stripped
        toks.append((kind, value))
    toks.append(("eof", ""))
    return toks


class TurtleParser:
    def __init__(self, content: str):
        self.toks = _tokenize(content)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[Triple] = []
        self._bnode_ids = itertools.count(1)

    # --- token helpers -------------------------------------------------
    def _peek(self) -> tuple:
        return self.toks[self.i]

    def _next(self) -> tuple:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect_punct(self, ch: str) -> None:
        t = self._next()
        if t[0] != "punct" or t[1] != ch:
            raise ParseError(f"Turtle parsing failed: expected {ch!r}, got {t[1]!r}")

    def _new_bnode(self) -> str:
        return f"genid{next(self._bnode_ids)}"

    # --- grammar -------------------------------------------------------
    def parse(self) -> list[Triple]:
        while self._peek()[0] != "eof":
            t = self._peek()
            if t[0] == "kw" and t[1] == "@prefix":
                self._next()
                self._parse_prefix(require_dot=True)
            elif t[0] == "word" and t[1].upper() == "PREFIX":
                self._next()
                self._parse_prefix(require_dot=False)
            elif t[0] == "kw" and t[1] == "@base":
                raise ParseError("Turtle parsing failed: @base is not supported")
            elif t[0] == "word" and t[1].upper() == "BASE":
                raise ParseError("Turtle parsing failed: BASE is not supported")
            else:
                self._parse_triples_block()
        return self.triples

    def _parse_prefix(self, require_dot: bool) -> None:
        t = self._next()
        if t[0] != "prefixed" or not t[1].endswith(":"):
            raise ParseError(f"Turtle parsing failed: bad prefix declaration near {t[1]!r}")
        prefix = t[1][:-1]
        iri_tok = self._next()
        if iri_tok[0] != "iri":
            raise ParseError("Turtle parsing failed: prefix IRI expected")
        self.prefixes[prefix] = _unescape(iri_tok[1][1:-1])
        if require_dot:
            self._expect_punct(".")
        elif self._peek()[0] == "punct" and self._peek()[1] == ".":
            self._next()  # tolerate SPARQL-style PREFIX with stray dot

    def _parse_triples_block(self) -> None:
        subj_kind, subj = self._parse_subject()
        self._parse_predicate_object_list(subj_kind, subj)
        self._expect_punct(".")

    def _parse_subject(self):
        t = self._next()
        if t[0] == "iri":
            return IRI, _unescape(t[1][1:-1])
        if t[0] == "bnode":
            return BNODE, t[1][2:]
        if t[0] == "prefixed":
            return IRI, self._resolve_prefixed(t[1])
        if t[0] == "punct" and t[1] == "[":
            node = self._parse_bnode_property_list()
            return BNODE, node
        if t[0] == "punct" and t[1] == "(":
            node = self._parse_collection()
            return node
        raise ParseError(f"Turtle parsing failed: invalid subject {t[1]!r}")

    def _resolve_prefixed(self, qname: str) -> str:
        prefix, _, local = qname.partition(":")
        if prefix not in self.prefixes:
            raise ParseError(f"Turtle parsing failed: undefined prefix '{prefix}:'")
        return self.prefixes[prefix] + local

    def _parse_predicate_object_list(self, subj_kind: str, subj: str) -> None:
        while True:
            pred = self._parse_predicate()
            while True:
                self._parse_object(subj_kind, subj, pred)
                if self._peek()[0] == "punct" and self._peek()[1] == ",":
                    self._next()
                    continue
                break
            if self._peek()[0] == "punct" and self._peek()[1] == ";":
                self._next()
                # tolerate trailing ';' before '.' or ']'
                nxt = self._peek()
                if nxt[0] == "punct" and nxt[1] in ".]":
                    return
                continue
            return

    def _parse_predicate(self) -> str:
        t = self._next()
        if t[0] == "kw" and t[1] == "a":
            return RDF_TYPE
        if t[0] == "iri":
            return _unescape(t[1][1:-1])
        if t[0] == "prefixed":
            return self._resolve_prefixed(t[1])
        raise ParseError(f"Turtle parsing failed: invalid predicate {t[1]!r}")

    def _emit(self, s_kind, s, p, o_kind, o, dt="", lang=""):
        self.triples.append(Triple(s, s_kind, p, o, o_kind, dt, lang, 0))

    def _parse_object(self, subj_kind: str, subj: str, pred: str) -> None:
        t = self._next()
        if t[0] == "iri":
            self._emit(subj_kind, subj, pred, IRI, _unescape(t[1][1:-1]))
        elif t[0] == "prefixed":
            self._emit(subj_kind, subj, pred, IRI, self._resolve_prefixed(t[1]))
        elif t[0] == "bnode":
            self._emit(subj_kind, subj, pred, BNODE, t[1][2:])
        elif t[0] in ("str", "lstr3"):
            quote = 3 if t[0] == "lstr3" else 1
            lex = _unescape(t[1][quote:-quote])
            lang = ""
            dt = ""
            nxt = self._peek()
            if nxt[0] == "langtag":
                lang = self._next()[1][1:]
            elif nxt[0] == "punct" and nxt[1] == "^^":
                self._next()
                dt_tok = self._next()
                if dt_tok[0] == "iri":
                    dt = _unescape(dt_tok[1][1:-1])
                elif dt_tok[0] == "prefixed":
                    dt = self._resolve_prefixed(dt_tok[1])
                else:
                    raise ParseError("Turtle parsing failed: invalid datatype")
            self._emit(subj_kind, subj, pred, LITERAL, lex, dt, lang)
        elif t[0] == "num":
            v = t[1]
            if "e" in v.lower():
                dt = XSD + "double"
            elif "." in v:
                dt = XSD + "decimal"
            else:
                dt = XSD + "integer"
            self._emit(subj_kind, subj, pred, LITERAL, v, dt)
        elif t[0] == "kw" and t[1] in ("true", "false"):
            self._emit(subj_kind, subj, pred, LITERAL, t[1], XSD + "boolean")
        elif t[0] == "punct" and t[1] == "[":
            node = self._parse_bnode_property_list()
            self._emit(subj_kind, subj, pred, BNODE, node)
        elif t[0] == "punct" and t[1] == "(":
            kind, node = self._parse_collection()
            self._emit(subj_kind, subj, pred, kind, node)
        else:
            raise ParseError(f"Turtle parsing failed: invalid object {t[1]!r}")

    def _parse_bnode_property_list(self) -> str:
        """'[' already consumed; returns the new bnode label."""
        node = self._new_bnode()
        if self._peek()[0] == "punct" and self._peek()[1] == "]":
            self._next()
            return node
        self._parse_predicate_object_list(BNODE, node)
        self._expect_punct("]")
        return node

    def _parse_collection(self):
        """'(' already consumed; emits rdf:first/rdf:rest chain, returns
        (kind, node) of the list head (rdf:nil for empty)."""
        items: list[tuple[str, str, str, str]] = []
        while not (self._peek()[0] == "punct" and self._peek()[1] == ")"):
            sink: list[Triple] = []
            real, self.triples = self.triples, sink
            # reuse object parsing into a temp sink keyed by placeholder
            try:
                self._parse_object(BNODE, "@collect", "@item")
            finally:
                self.triples = real
            for tr in sink:
                if tr.subj == "@collect" and tr.pred == "@item":
                    items.append((tr.obj_kind, tr.obj, tr.obj_datatype, tr.obj_lang))
                else:
                    self.triples.append(tr)
        self._next()  # ')'
        if not items:
            return IRI, RDF_NIL
        head = self._new_bnode()
        cur = head
        for idx, (okind, oval, odt, olang) in enumerate(items):
            self._emit(BNODE, cur, RDF_FIRST, okind, oval, odt, olang)
            if idx == len(items) - 1:
                self._emit(BNODE, cur, RDF_REST, IRI, RDF_NIL)
            else:
                nxt = self._new_bnode()
                self._emit(BNODE, cur, RDF_REST, BNODE, nxt)
                cur = nxt
        return BNODE, head


def parse(content: str) -> tuple[list[Triple], dict[str, str]]:
    """Parse a Turtle document → (triples, declared prefix map)."""
    p = TurtleParser(content)
    triples = p.parse()
    return triples, p.prefixes
