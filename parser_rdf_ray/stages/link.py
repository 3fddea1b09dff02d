"""Entity linking (north-rule stage with no reference counterpart).

EntityLinker is an actor-pool map_batches stage: the alias dictionary is
put in the object store ONCE (``ray.put``) and each actor dereferences it
ONCE in ``__init__`` — never re-shipped per batch. Batched scoring is a
vectorized lookup: mention surface forms (entity labels / IRI local names)
are matched against the alias dict; hits emit (mention_uri, canonical_uri,
score) link rows that feed the union-find merge below.

Union-find (W4): coreference edges (alias hits + owl:sameAs triples) are a
tiny fraction of the triple set, so the forest is built driver-side over
the collected edge set and broadcast back as a rename map applied in one
vectorized map_batches pass — no iterative shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from parser_rdf_ray.vocab import OWL

OWL_SAMEAS = OWL + "sameAs"

# Below this many entries, broadcast dict state ships inside a task-pool
# fn instance (pickled per task — cheap for small dicts, and no actor
# cold-start, which costs ~2s per autoscaling pool at sandbox scale).
# Above it, the state goes through ray.put + an actor pool so each actor
# deserializes it ONCE (per-task unpickling of a GB-scale dict would
# dominate). Same reasoning as similarity.BruteForceScorer, which stays a
# task pool at any size because numpy plasma reads are zero-copy — python
# dicts are not.
SMALL_STATE_MAX_ENTRIES = 65_536


def linker_stage(triples_ds, alias_dict: dict):
    """EntityLinker wired with the right compute strategy for the alias
    dict's size (task instance when small, actor pool when large)."""
    if len(alias_dict) <= SMALL_STATE_MAX_ENTRIES:
        return triples_ds.map_batches(
            EntityLinker(alias_dict), batch_format="pyarrow", zero_copy_batch=True
        )
    import ray

    alias_ref = ray.put(alias_dict)
    return triples_ds.map_batches(
        EntityLinker,
        fn_constructor_args=(alias_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )

LINKS_SCHEMA = pa.schema(
    [
        ("mention_uri", pa.string()),
        ("canonical_uri", pa.string()),
        ("surface", pa.string()),
        ("score", pa.float32()),
    ]
)


def _local_name(uri: str) -> str:
    for sep in ("#", "/", ":"):
        idx = uri.rfind(sep)
        if idx >= 0 and idx < len(uri) - 1:
            return uri[idx + 1 :]
    return uri


class EntityLinker:
    """Callable class for map_batches(..., concurrency=N) actor pools.

    alias_ref: a ray.ObjectRef to dict[surface_lower -> canonical_uri]
    (or a plain dict for Ray-free unit tests). Loaded once per actor,
    along with the Arrow value_set of alias surfaces the prefilter uses.

    Vectorized hot path: the full triple stream never runs row-by-row
    Python. Local names are computed once per DISTINCT subject
    (dictionary-encode → Python over the small dictionary → take), hits
    are found with pc.is_in against the alias-surface set, and only hit
    rows — a tiny fraction of a real corpus — enter the emit loop.
    """

    def __init__(self, alias_ref):
        import ray

        if isinstance(alias_ref, dict):
            self.aliases = alias_ref
        else:
            self.aliases = ray.get(alias_ref)
        self._surface_set = pa.array(list(self.aliases.keys()), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Input: triple rows. Mentions scored: IRI subjects whose local
        name (or rdfs:label object on the row) hits the alias dict."""
        import numpy as np
        import pyarrow.compute as pc

        aliases = self.aliases
        subj = pc.cast(batch.column("subj").combine_chunks(), pa.string())
        iri_mask = pc.equal(batch.column("subj_kind"), "iri")

        # local names once per distinct subject, broadcast back via take
        enc = pc.dictionary_encode(subj)
        locals_of_dict = pa.array(
            [_local_name(v).lower() for v in enc.dictionary.to_pylist()], pa.string()
        )
        local_arr = pc.take(locals_of_dict, enc.indices)

        subj_hit = pc.and_(iri_mask, pc.is_in(local_arr, value_set=self._surface_set))
        obj_lower = pc.utf8_lower(pc.cast(batch.column("obj"), pa.string()))
        label_hit = pc.and_(
            pc.and_(iri_mask, pc.ends_with(batch.column("pred"), pattern="label")),
            pc.is_in(obj_lower, value_set=self._surface_set),
        )
        any_hit = np.asarray(
            pc.or_(subj_hit, label_hit).to_numpy(zero_copy_only=False), dtype=bool
        )
        out = {n: [] for n in LINKS_SCHEMA.names}
        if any_hit.any():
            hit_idx = np.flatnonzero(any_hit)
            subjs = subj.take(pa.array(hit_idx)).to_pylist()
            locs = local_arr.take(pa.array(hit_idx)).to_pylist()
            s_hits = np.asarray(subj_hit.to_numpy(zero_copy_only=False), dtype=bool)[hit_idx]
            l_hits = np.asarray(label_hit.to_numpy(zero_copy_only=False), dtype=bool)[hit_idx]
            labels = obj_lower.take(pa.array(hit_idx)).to_pylist()
            seen: set[tuple[str, str]] = set()
            for i, s in enumerate(subjs):
                surfaces = []
                if s_hits[i]:
                    surfaces.append(locs[i])
                if l_hits[i]:
                    surfaces.append(labels[i])
                for surface in surfaces:
                    canonical = aliases.get(surface)
                    if canonical is None or canonical == s:
                        continue
                    key = (s, canonical)
                    if key in seen:
                        continue
                    seen.add(key)
                    out["mention_uri"].append(s)
                    out["canonical_uri"].append(canonical)
                    out["surface"].append(surface)
                    # exact-match score; fuzzy scoring would grade edit distance
                    out["score"].append(1.0)
        return pa.Table.from_arrays(
            [pa.array(out[n], LINKS_SCHEMA.field(n).type) for n in LINKS_SCHEMA.names],
            schema=LINKS_SCHEMA,
        )


class UnionFind:
    """Driver-side disjoint-set with deterministic (lexicographic-min) roots
    so the rename map is stable across runs and resumes."""

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # lexicographic-min winner → deterministic canonical representative
        winner, loser = (ra, rb) if ra < rb else (rb, ra)
        self.parent[loser] = winner

    def rename_map(self) -> dict[str, str]:
        return {x: self.find(x) for x in list(self.parent)}


def build_rename_map(edges: list[tuple[str, str]]) -> dict[str, str]:
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return uf.rename_map()


def sameas_edges(triples_ds) -> list[tuple[str, str]]:
    """Collect owl:sameAs edges (tiny vs the triple set) to the driver.

    Bounded collect: sameAs assertions are authored metadata, orders of
    magnitude rarer than triples. A corpus that breaks the bound needs the
    distributed union-find alternative (iterative min-label propagation,
    see pipelines/kg_build.py:connected_components) instead of the
    driver-side rename map."""
    import pyarrow.compute as pc

    from parser_rdf_ray.collect import bounded_take_all

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch.column("pred"), OWL_SAMEAS),
            pc.equal(batch.column("obj_kind"), "iri"),
        )
        return batch.filter(mask).select(["subj", "obj"])

    small = triples_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    rows = bounded_take_all(small, what="owl:sameAs edge collect", ceiling=5_000_000)
    return [(r["subj"], r["obj"]) for r in rows]


class _Renamer:
    """Vectorized subj/obj rename: index_in against the rename-key array,
    take the replacement where it hits, keep the original elsewhere —
    zero per-row Python. Key/value arrays are built lazily once per actor
    (ref mode) or ship pre-built inside the task fn (small-dict mode)."""

    def __init__(self, renames_or_ref):
        self._src = renames_or_ref
        self.keys = None
        self.vals = None

    def _ensure(self):
        if self.keys is not None:
            return
        renames = self._src
        if not isinstance(renames, dict):
            import ray

            renames = ray.get(renames)
        self.keys = pa.array(list(renames.keys()), pa.string())
        self.vals = pa.array(list(renames.values()), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        self._ensure()
        for col in ("subj", "obj"):
            c = pc.cast(batch.column(col).combine_chunks(), pa.string())
            idx = pc.index_in(c, value_set=self.keys)
            new = pc.if_else(pc.is_valid(idx), pc.take(self.vals, idx), c)
            batch = batch.set_column(batch.column_names.index(col), col, new)
        return batch


def apply_rename(ds, rename_map: dict[str, str]):
    """Broadcast rename with size-adaptive compute (see
    SMALL_STATE_MAX_ENTRIES): small maps ride the task fn, large maps go
    ray.put → actor pool so each actor deserializes once."""
    if not rename_map:
        return ds
    if len(rename_map) <= SMALL_STATE_MAX_ENTRIES:
        return ds.map_batches(
            _Renamer(rename_map), batch_format="pyarrow", zero_copy_batch=True
        )
    import ray

    ref = ray.put(rename_map)
    return ds.map_batches(
        _Renamer,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
