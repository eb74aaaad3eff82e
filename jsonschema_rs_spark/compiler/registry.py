"""In-document reference registry: `$id` base URIs, `$anchor`,
`$dynamicAnchor`, `$recursiveAnchor`.

The Spark analog of the reference's referencing crate
(jsonschema-referencing/src/anchors.rs — exported lib.rs:4,18 — and
resolver.rs:65): one pre-order walk of the schema document collects

- every embedded resource root declared by `$id` (absolute or relative,
  resolved against the enclosing base URI),
- every `(base_uri, anchor)` pair from `$anchor` / `$dynamicAnchor`,
- the OUTERMOST `$dynamicAnchor` per name and the outermost
  `$recursiveAnchor: true` schema — the static approximation used when
  compiling `$dynamicRef` / `$recursiveRef` (see compile sites): the
  dynamic scope of a depth-unrolled compilation always starts at the
  document root, so the first-in-pre-order dynamic anchor IS the one a
  runtime resolver would find for the metaschema-style recursive tree.
  Documents whose dynamic scope would legitimately re-bind mid-instance
  (two same-named $dynamicAnchors on sibling branches) are a documented
  deviation.

Remote retrievers stay a non-goal (reference retriever.rs); every URI
must resolve to a resource embedded in THIS document.
"""

from __future__ import annotations

from typing import Any
from urllib.parse import urldefrag, urljoin

from jsonschema_rs_spark.errors import ReferencingError, SchemaError

# keys whose values are data, not schema locations — never walked, so a
# '$anchor' key inside an enum literal can't poison the registry. Applied
# only in SCHEMA position (ADVICE r2): inside a map-of-schemas container
# a property literally NAMED 'enum'/'const'/... still holds a schema.
_DATA_KEYS = frozenset(["enum", "const", "default", "examples"])

# keys whose value is a MAP whose values are schemas (the map's keys are
# data — property names, pattern strings, definition names). The map
# itself is NOT a schema node: its keys must not register $id/$anchor,
# and _DATA_KEYS does not apply to them.
_MAP_OF_SCHEMAS_KEYS = frozenset([
    "properties", "patternProperties", "$defs", "definitions",
    "dependentSchemas", "dependencies",
])


class RefRegistry:
    def __init__(self, root: Any, resources: dict[str, Any] | None = None,
                 legacy_id: bool = False, retriever=None,
                 base_uri: str | None = None):
        """`resources`: extra documents keyed by absolute URI — the
        offline analog of the reference's referencing::Registry /
        ValidationOptions::with_retriever (retriever.rs), letting
        schemas $ref across documents without any network. Each
        resource is walked like an embedded $id resource (its own
        anchors, nested $ids, dynamic anchors all register).

        `legacy_id`: draft-4 dialect — the base-URI keyword is `id`
        (specification/mod.rs draft-4 id_of); `$id` in a draft-4
        document is just an unknown property.

        `retriever`: callable (absolute URI) -> document, consulted
        lazily at resolve time for URIs in neither the embedded
        resources nor `resources` — the reference's Retriever trait
        (retriever.rs; jsonschema-py `retriever=` kwarg). The registry
        performs no I/O itself.

        `base_uri`: external base URI that a RELATIVE root `$id` (and,
        transitively, every relative `$ref`/`$id` below it) resolves
        against — the analog of the reference's
        ValidationOptions::with_base_uri (options.rs:273-299), for
        schemas loaded from sources with no inherent base URL. A root
        with no `$id` at all adopts `base_uri` as its base directly."""
        self.legacy_id = legacy_id
        self.retriever = retriever
        self.root = root
        self.base_by_oid: dict[int, str] = {}
        # node id → JSON-pointer within its enclosing resource ("" for a
        # resource root) — gives every subschema a canonical
        # `base#pointer` location for structured output (evaluation.rs
        # schemaLocation)
        self.ptr_by_oid: dict[int, str] = {}
        self.by_uri: dict[str, Any] = {}
        self.anchors: dict[tuple[str, str], Any] = {}
        self.dynamic_anchors: dict[str, Any] = {}
        self.dynamic_by_base: dict[tuple[str, str], Any] = {}
        self.recursive_root: Any = None
        self._id_key = "id" if legacy_id else "$id"
        root_base = urldefrag(base_uri).url if base_uri else ""
        if isinstance(root, dict) \
                and isinstance(root.get(self._id_key), str):
            # a relative root $id resolves against the external base
            # (with_base_uri semantics); urljoin("", abs) = abs keeps
            # the no-base behavior unchanged
            root_base = urljoin(root_base,
                                urldefrag(root[self._id_key]).url)
        self.root_base = root_base
        self.by_uri[root_base] = root
        if base_uri:
            # the root is also addressable under the raw external base
            # (e.g. a $ref back to the retrieval URI of an $id-less root)
            self.by_uri.setdefault(urldefrag(base_uri).url, root)
        self._walk(root, root_base, is_root=True)
        for uri, doc in (resources or {}).items():
            self._register_resource(uri, doc)

    def _register_resource(self, uri: str, doc: Any) -> None:
        """Register an external document under its retrieval URI (and
        its declared $id, if any); its anchors and nested $ids walk like
        an embedded resource."""
        base = urldefrag(uri).url
        self.by_uri.setdefault(base, doc)
        if isinstance(doc, dict) \
                and isinstance(doc.get(self._id_key), str):
            # registered under its retrieval URI AND its declared $id
            declared = urljoin(base, urldefrag(doc[self._id_key]).url)
            self.by_uri.setdefault(declared, doc)
            base = declared
        self._walk(doc, base, is_root=True)

    def _retrieve(self, uri: str) -> Any:
        """Consult the user retriever for an unknown absolute URI and
        register the returned document (Retriever trait analog,
        retriever.rs; errors become ReferencingError — a SchemaError
        subclass — like the reference's Resolve error propagation)."""
        try:
            doc = self.retriever(uri)
        except Exception as exc:
            raise ReferencingError(
                f"retriever failed for {uri!r}: {exc}", "$ref") from exc
        if not isinstance(doc, (dict, bool)):
            raise ReferencingError(
                f"retriever returned a non-schema ({type(doc).__name__}) "
                f"for {uri!r}", "$ref")
        self._register_resource(uri, doc)
        return self.by_uri[urldefrag(uri).url]

    # -- collection --------------------------------------------------------

    def _walk(self, node: Any, base: str, is_root: bool = False,
              ptr: str = "") -> None:
        if isinstance(node, list):
            for i, v in enumerate(node):
                self._walk(v, base, ptr=f"{ptr}/{i}")
            return
        if not isinstance(node, dict):
            return
        if not is_root and isinstance(node.get(self._id_key), str):
            id_val = node[self._id_key]
            if id_val.startswith("#"):
                # legacy draft-4/7 fragment-only $id ("$id": "#foo") is an
                # ANCHOR registration, not a new resource — urljoining it
                # would resolve back to the enclosing base and clobber the
                # parent in by_uri (ADVICE r2, medium)
                if len(id_val) > 1:
                    self.anchors[(base, id_val[1:])] = node
            elif urldefrag(id_val).url == "":
                # empty $id (or "#" alone) also urljoins to the enclosing
                # base — ignore rather than overwrite the parent resource
                pass
            else:
                new_base = urljoin(base, urldefrag(id_val).url)
                prev = self.by_uri.get(new_base)
                if prev is not None and prev is not node:
                    raise SchemaError(
                        f"duplicate $id {new_base!r}: two distinct schema "
                        f"resources declare the same URI", "$id")
                base = new_base
                self.by_uri[base] = node
                ptr = ""  # new resource root: pointers restart here
        self.base_by_oid[id(node)] = base
        self.ptr_by_oid[id(node)] = ptr
        a = node.get("$anchor")
        if isinstance(a, str):
            self.anchors[(base, a)] = node
        da = node.get("$dynamicAnchor")
        if isinstance(da, str):
            self.anchors[(base, da)] = node
            # pre-order walk → first occurrence is the outermost
            self.dynamic_anchors.setdefault(da, node)
            # per-resource dynamic anchors: the compile-time dynamic
            # scope searches these outermost-first (resolver.rs:117)
            self.dynamic_by_base.setdefault((base, da), node)
        if node.get("$recursiveAnchor") is True and self.recursive_root is None:
            self.recursive_root = node
        for k, v in node.items():
            ke = k.replace("~", "~0").replace("/", "~1")
            if k in _MAP_OF_SCHEMAS_KEYS and isinstance(v, dict):
                # the container map is NOT a schema node: walk its VALUES
                # as schemas (so a property literally named 'enum' or
                # '$anchor' is just a name, while $id/$anchor inside its
                # SCHEMA still register — ADVICE r2, low)
                for name, sub in v.items():
                    ne = name.replace("~", "~0").replace("/", "~1")
                    self._walk(sub, base, ptr=f"{ptr}/{ke}/{ne}")
            elif k not in _DATA_KEYS:
                self._walk(v, base, ptr=f"{ptr}/{ke}")

    # -- resolution --------------------------------------------------------

    def base_of(self, referrer: Any) -> str:
        return self.base_by_oid.get(id(referrer), self.root_base)

    def location_of(self, node: Any) -> str | None:
        """Canonical `base#pointer` location of a walked schema node
        (structured-output schemaLocation), or None if the node wasn't
        part of the walk (e.g. a dialect-filtered copy)."""
        oid = id(node)
        if oid not in self.ptr_by_oid:
            return None
        base = self.base_by_oid.get(oid, self.root_base)
        ptr = self.ptr_by_oid[oid]
        # with a base URI the location is "uri#ptr" (root = "uri#");
        # without one it is the bare pointer ("" for the root) —
        # matching the reference's serialized schemaLocation forms
        return f"{base}#{ptr}" if base else ptr

    def resolve(self, ref: str, referrer: Any) -> Any:
        """Resolve `ref` (URI-reference with optional fragment) against
        the referring schema's base URI to an in-document subschema."""
        base = self.base_of(referrer)
        uri, frag = urldefrag(ref)
        target_uri = urljoin(base, uri) if uri else base
        doc = self.by_uri.get(target_uri)
        if doc is None and self.retriever is not None and target_uri:
            doc = self._retrieve(target_uri)
        if doc is None:
            raise ReferencingError(
                f"unresolvable $ref {ref!r}: no embedded or registered "
                f"resource for {target_uri!r} (supply it via "
                f"ValidationOptions.resources or a compile-time "
                f"ValidationOptions.retriever; network retrieval is a "
                f"non-goal)", "$ref")
        if not frag:
            return doc
        if frag.startswith("/"):
            return self._pointer(doc, frag, ref)
        target = self.anchors.get((urljoin(base, uri) if uri else base, frag))
        if target is None:
            raise ReferencingError(
                f"unresolvable anchor in $ref {ref!r}", "$ref")
        return target

    def resolve_dynamic(self, ref: str, referrer: Any) -> Any:
        """`$dynamicRef`: the outermost same-named `$dynamicAnchor` in the
        document if one exists (static approximation of the runtime
        dynamic-scope search, keywords/ref_.rs:293 compile_dynamic_ref);
        otherwise behaves exactly like `$ref` (per spec, when the initial
        target has no matching $dynamicAnchor)."""
        _, frag = urldefrag(ref)
        if frag and not frag.startswith("/") \
                and frag in self.dynamic_anchors:
            return self.dynamic_anchors[frag]
        return self.resolve(ref, referrer)

    def resolve_dynamic_in_scope(self, ref: str, referrer: Any,
                                 scope: list[str]) -> Any:
        """`$dynamicRef` with the 2020-12 dynamic-scope search: resolve
        the initial target like $ref; if the initial target's RESOURCE
        declares a same-named $dynamicAnchor (the spec's bookending
        requirement), re-resolve to the OUTERMOST resource in `scope`
        (the compile path's sequence of entered base URIs) declaring the
        anchor; otherwise plain $ref semantics. Fixes the r2 global-
        outermost approximation's sibling-branch divergence
        (resolver.rs:117, ref_.rs:293)."""
        _, frag = urldefrag(ref)
        if frag and not frag.startswith("/"):
            try:
                initial = self.resolve(ref, referrer)
            except SchemaError:
                return self.resolve_dynamic(ref, referrer)
            init_base = self.base_of(initial)
            if (init_base, frag) in self.dynamic_by_base:
                for base in scope:
                    node = self.dynamic_by_base.get((base, frag))
                    if node is not None:
                        return node
            return initial
        return self.resolve_dynamic(ref, referrer)

    def resolve_recursive(self) -> Any:
        """`$recursiveRef: "#"` (2019-09): the outermost schema carrying
        `$recursiveAnchor: true`, else the document root
        (keywords/ref_.rs:214-278)."""
        return self.recursive_root if self.recursive_root is not None \
            else self.root

    def _pointer(self, doc: Any, frag: str, ref: str) -> Any:
        node = doc
        for tok in frag[1:].split("/"):
            tok = tok.replace("~1", "/").replace("~0", "~")
            if isinstance(node, dict) and tok in node:
                node = node[tok]
            elif isinstance(node, list) and tok.isdigit() \
                    and int(tok) < len(node):
                node = node[int(tok)]
            else:
                raise SchemaError(f"unresolvable $ref {ref!r}", "$ref")
        return node
