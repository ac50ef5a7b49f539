"""Declarative node / relationship model DSL.

Re-expresses the reference's Pydantic model layer (reference:
``src/neontology/commonmodel.py``, ``basenode.py``, ``baserelationship.py``)
as table specs that compile to Spark ``StructType`` schemas plus a constraint
list. This is the catalog the whole engine hangs off:

* ``Property`` — one typed column with nullability + merge policy, the
  analogue of a Pydantic field with ``json_schema_extra`` usage markers
  (``commonmodel.py:33-39``: ``_set_on_match`` / ``_set_on_create`` /
  ``_always_set``; ``baserelationship.py:36-46``: ``_merge_on``).
* ``NodeModel`` — one node table per primary label
  (``basenode.py:81-93``): primary label, secondary labels, primary
  property, typed fields. ``abstract=True`` mirrors
  ``__primarylabel__ is None`` (``basenode.py:89-93``).
* ``RelationshipModel`` — one edge table per relationship type
  (``baserelationship.py:19-34``) with source/target key columns.
* ``ModelCatalog`` — the runtime registry (``utils.py:10-40, 80-139``)
  mapping labels/types to specs; also derives the auto uniqueness
  constraints (``utils.py:156-176``).

Type domain is exactly the reference whitelist (``graphengine.py:22-34``)
with the export-coercion rules of ``_export_type_converter``
(``graphengine.py:45-84``): dict/map types are a hard TypeError, lists must
be homogeneous (free under ArrayType), UUID/Enum collapse to string.

Everything in this module is driver-side, executed once per run; it never
touches data, so it is scale-independent by construction.
"""

from __future__ import annotations

import datetime as _dt
import enum
import uuid
from dataclasses import dataclass, field
from typing import Optional, Union

from pyspark.sql import types as T

from .identifiers import check_identifier


class MergePolicy(enum.Enum):
    """Column-level merge policy (reference ``commonmodel.py:33-39``)."""

    ALWAYS_SET = "always_set"  # written on both create & match
    SET_ON_CREATE = "set_on_create"  # written only when key is new
    SET_ON_MATCH = "set_on_match"  # written only when key already exists
    MERGE_ON = "merge_on"  # part of edge identity (rels only)


# ---------------------------------------------------------------------------
# Type domain — reference graphengine.py:22-34 whitelist → Spark types
# ---------------------------------------------------------------------------

_PY_TO_SPARK: dict[type, T.DataType] = {
    str: T.StringType(),
    int: T.LongType(),
    float: T.DoubleType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    bytearray: T.BinaryType(),
    _dt.date: T.DateType(),
    _dt.datetime: T.TimestampType(),
    _dt.time: T.StringType(),  # Spark has no TimeType; reference str()s it
    _dt.timedelta: T.DayTimeIntervalType(),
    uuid.UUID: T.StringType(),  # str() fallback, graphengine.py:80-81
}

_ALLOWED_ATOMIC = (
    T.StringType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.DecimalType,
    T.BooleanType,
    T.BinaryType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DayTimeIntervalType,
)


class UnsupportedTypeError(TypeError):
    """Raised for types outside the reference domain (e.g. dict/map —
    reference ``graphengine.py:59-60``)."""


_DDL_ATOMIC: dict[str, T.DataType] = {
    "string": T.StringType(),
    "str": T.StringType(),
    "byte": T.ByteType(),
    "tinyint": T.ByteType(),
    "short": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "int32": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "int64": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "interval day to second": T.DayTimeIntervalType(),
}


def _parse_ddl(s: str) -> T.DataType:
    """Session-free DDL parser for the engine's (closed) type domain —
    avoids ``T._parse_datatype_string``'s JVM dependency so models can be
    declared before any SparkSession exists."""
    name = s.strip().lower()
    if name in _DDL_ATOMIC:
        return _DDL_ATOMIC[name]
    if name.startswith("array<") and name.endswith(">"):
        return T.ArrayType(_parse_ddl(name[6:-1]))
    if name.startswith("map<") and name.endswith(">"):
        # constructed only so resolve_type can reject it with the domain error
        inner = name[4:-1]
        depth, split_at = 0, None
        for i, ch in enumerate(inner):
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                split_at = i
                break
        if split_at is None:
            raise UnsupportedTypeError(f"malformed map type: {s!r}")
        return T.MapType(_parse_ddl(inner[:split_at]), _parse_ddl(inner[split_at + 1 :]))
    if name.startswith("decimal"):
        import re as _re

        m = _re.match(r"decimal\((\d+),\s*(\d+)\)", name)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        return T.DecimalType()
    raise UnsupportedTypeError(f"unsupported DDL type string: {s!r}")


def resolve_type(dtype: object) -> T.DataType:
    """Normalize a python type / Spark DataType / DDL string to a Spark type,
    enforcing the reference's domain rules:

    * ``dict`` / ``MapType`` / ``StructType`` → :class:`UnsupportedTypeError`
      (property maps forbidden, ``graphengine.py:59-60``).
    * ``list[T]`` / ``ArrayType`` → allowed iff the element type is an
      allowed atomic (homogeneity is enforced by the schema itself,
      mirroring ``graphengine.py:66-75``).
    * Enum classes → StringType (str() fallback ``graphengine.py:80-81``).
    """
    if isinstance(dtype, str):
        dtype = _parse_ddl(dtype)
    if isinstance(dtype, type):
        if issubclass(dtype, enum.Enum):
            return T.StringType()
        if dtype is dict:
            raise UnsupportedTypeError(
                "dict-valued properties are forbidden (reference graphengine.py:59-60)"
            )
        if dtype in (tuple, set, frozenset, list):
            raise UnsupportedTypeError(
                "bare sequence types need an element type; use ArrayType(elem) "
                "or 'array<elem>'"
            )
        spark = _PY_TO_SPARK.get(dtype)
        if spark is None:
            # reference str()-coerces unknown types (graphengine.py:80-81)
            return T.StringType()
        return spark
    if isinstance(dtype, (T.MapType, T.StructType)):
        raise UnsupportedTypeError(
            f"{dtype.simpleString()} properties are forbidden "
            "(reference graphengine.py:59-60: dict → TypeError)"
        )
    if isinstance(dtype, T.ArrayType):
        elem = dtype.elementType
        if not isinstance(elem, _ALLOWED_ATOMIC):
            raise UnsupportedTypeError(
                f"array element type {elem.simpleString()} outside the "
                "supported domain (reference graphengine.py:66-75)"
            )
        return dtype
    if isinstance(dtype, _ALLOWED_ATOMIC):
        return dtype
    if isinstance(dtype, T.NullType):
        raise UnsupportedTypeError("NullType columns are not allowed")
    raise UnsupportedTypeError(f"unsupported property type: {dtype!r}")


# ---------------------------------------------------------------------------
# Property / model specs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Property:
    """One typed column of a node/relationship table.

    ``required=True`` ⇔ reference non-Optional field (NOT NULL constraint);
    ``alias`` mirrors Pydantic field aliases (``commonmodel.py:90``,
    test ``tests/test_basenode.py:1658-1712``): checks operate on the
    logical ``name``; storage uses ``alias`` when set.
    ``enum_values`` records a closed value domain (``schema_utils.py:95-102``).
    """

    name: str
    dtype: object = str
    required: bool = True
    policy: MergePolicy = MergePolicy.ALWAYS_SET
    alias: Optional[str] = None
    enum_values: Optional[tuple] = None

    def __post_init__(self):
        check_identifier(self.name, "property name")
        if self.alias is not None:
            check_identifier(self.alias, "property alias")
        object.__setattr__(self, "dtype", resolve_type(self.dtype))
        if self.enum_values is not None:
            object.__setattr__(self, "enum_values", tuple(self.enum_values))

    @property
    def storage_name(self) -> str:
        return self.alias or self.name

    def struct_field(self) -> T.StructField:
        return T.StructField(self.storage_name, self.dtype, nullable=not self.required)


class ModelError(ValueError):
    """Bad model declaration (mirrors reference pydantic ValidationError /
    NotImplementedError on abstract instantiation, basenode.py:89-93)."""


@dataclass
class NodeModel:
    """One node table per primary label (reference ``basenode.py:81-93``)."""

    label: str
    primary_property: str
    properties: list[Property]
    secondary_labels: tuple = ()
    abstract: bool = False

    def __post_init__(self):
        if not self.abstract:
            check_identifier(self.label, "primary label")
        for lbl in self.secondary_labels:
            check_identifier(lbl, "secondary label")
        names = [p.name for p in self.properties]
        if len(set(names)) != len(names):
            raise ModelError(f"duplicate property names in {self.label}: {names}")
        if self.primary_property not in names:
            raise ModelError(
                f"primary property {self.primary_property!r} not among "
                f"declared properties of {self.label}"
            )
        pp = self.prop(self.primary_property)
        if not pp.required:
            raise ModelError("primary property must be required (non-null)")
        self.secondary_labels = tuple(self.secondary_labels)

    # -- registered related queries (reference basenode.py:20-78) ----------
    # The reference attaches query methods to model classes via
    # @related_nodes / @related_property and discovers them with
    # get_related_node_methods (basenode.py:117-151). Spark analogue: named
    # query functions registered on the model, each (tables, key, **kw) ->
    # DataFrame; the "(#ThisNode)" template substitution becomes the
    # explicit key argument.
    def related_nodes(self, name: Optional[str] = None):
        """Decorator registering a related-NODES query on this model."""

        def deco(fn):
            self._related_registry()[name or fn.__name__] = ("nodes", fn)
            return fn

        return deco

    def related_property(self, name: Optional[str] = None):
        """Decorator registering a related-PROPERTY (scalar aggregate)
        query on this model (reference @related_property,
        basenode.py:47-78)."""

        def deco(fn):
            self._related_registry()[name or fn.__name__] = ("property", fn)
            return fn

        return deco

    def _related_registry(self) -> dict:
        if not hasattr(self, "_related_queries"):
            object.__setattr__(self, "_related_queries", {})
        return self._related_queries

    def get_related_node_methods(self) -> dict:
        """Discovery: {name: fn} of registered related-nodes queries
        (reference get_related_node_methods, basenode.py:117-151)."""
        return {
            k: fn for k, (kind, fn) in self._related_registry().items()
            if kind == "nodes"
        }

    def get_related_property_methods(self) -> dict:
        return {
            k: fn for k, (kind, fn) in self._related_registry().items()
            if kind == "property"
        }

    def run_related(self, name: str, *args, **kwargs):
        """Execute a registered query by name (unknown name ⇒ KeyError,
        matching attribute-lookup failure on the reference class)."""
        return self._related_registry()[name][1](*args, **kwargs)

    # -- accessors ---------------------------------------------------------
    def prop(self, name: str) -> Property:
        for p in self.properties:
            if p.name == name:
                return p
        raise KeyError(name)

    @property
    def all_labels(self) -> tuple:
        """{primary} ∪ secondaries (reference graphengine.py:188-193)."""
        return (self.label, *self.secondary_labels)

    @property
    def pp_storage(self) -> str:
        return self.prop(self.primary_property).storage_name

    def struct_type(self) -> T.StructType:
        """Schema with required fields first (reference sorts required
        first in ``basenode.py:620-625``)."""
        req = [p.struct_field() for p in self.properties if p.required]
        opt = [p.struct_field() for p in self.properties if not p.required]
        return T.StructType(req + opt)

    def required_columns(self) -> list[str]:
        return [p.storage_name for p in self.properties if p.required]

    def columns_by_policy(self, policy: MergePolicy) -> list[str]:
        return [p.storage_name for p in self.properties if p.policy is policy]

    def rename_map(self) -> dict[str, str]:
        """logical name → storage (alias) name, where they differ."""
        return {p.name: p.alias for p in self.properties if p.alias}

    def markdown_schema(self) -> str:
        """Markdown doc, the analogue of the reference's Jinja schema dump
        (``schema_utils.py:53-89``)."""
        lines = [
            f"## {self.label}",
            "",
            f"- primary property: `{self.primary_property}`",
            f"- labels: {', '.join(self.all_labels)}",
            "",
            "| property | type | required | policy |",
            "|---|---|---|---|",
        ]
        for p in sorted(self.properties, key=lambda q: (not q.required, q.name)):
            lines.append(
                f"| {p.name} | {p.dtype.simpleString()} | "
                f"{'yes' if p.required else 'no'} | {p.policy.value} |"
            )
        return "\n".join(lines) + "\n"


@dataclass
class RelationshipModel:
    """One edge table per relationship type (reference
    ``baserelationship.py:19-34``). ``source_label``/``target_label`` name
    the endpoint node models; ``source_prop``/``target_prop`` default to the
    endpoint primary properties but may be any property
    (``baserelationship.py:157-221`` — alternate-key matching, J3)."""

    rel_type: str
    source_label: str
    target_label: str
    properties: list[Property] = field(default_factory=list)
    source_column: str = "source"
    target_column: str = "target"
    abstract: bool = False

    def __post_init__(self):
        if not self.abstract:
            check_identifier(self.rel_type, "relationship type")
        check_identifier(self.source_column, "source column")
        check_identifier(self.target_column, "target column")
        names = [p.name for p in self.properties]
        if len(set(names)) != len(names):
            raise ModelError(f"duplicate property names in {self.rel_type}")
        clash = {self.source_column, self.target_column} & set(names)
        if clash:
            raise ModelError(f"property names clash with endpoint columns: {clash}")

    @property
    def merge_on(self) -> list[str]:
        """Edge-identity properties (reference ``baserelationship.py:36-46``):
        same (src, tgt, merge_on values) ⇒ overwrite, else new edge."""
        return [p.storage_name for p in self.properties if p.policy is MergePolicy.MERGE_ON]

    def struct_type(self, key_type: T.DataType = T.StringType()) -> T.StructType:
        fields = [
            T.StructField(self.source_column, key_type, nullable=False),
            T.StructField(self.target_column, key_type, nullable=False),
        ]
        fields += [p.struct_field() for p in self.properties]
        return T.StructType(fields)

    def columns_by_policy(self, policy: MergePolicy) -> list[str]:
        return [p.storage_name for p in self.properties if p.policy is policy]

    def markdown_schema(self) -> str:
        """Markdown doc for one relationship type — the analogue of the
        reference's ``md_rel_tables`` row (``schema_utils.py:67-89``:
        rel type, source/target labels, property table)."""
        lines = [
            f"## (:{self.source_label})-[:{self.rel_type}]->"
            f"(:{self.target_label})",
            "",
            f"- merge_on: {', '.join(self.merge_on) or '(none)'}",
            "",
            "| property | type | required | policy |",
            "|---|---|---|---|",
        ]
        for p in sorted(self.properties, key=lambda q: (not q.required, q.name)):
            lines.append(
                f"| {p.name} | {p.dtype.simpleString()} | "
                f"{'yes' if p.required else 'no'} | {p.policy.value} |"
            )
        return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# Catalog — reference utils.py:10-40, 80-139, 156-176
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class UniquenessConstraint:
    """Analogue of ``apply_constraint`` (reference neo4jengine.py:285-298):
    enforcement is a groupBy-count violation query, not an index."""

    label: str
    prop: str

    @property
    def name(self) -> str:
        return f"unique__{self.label}__{self.prop}"


class ModelCatalog:
    """Runtime registry of labels/types → specs (reference
    ``utils.py:10-40`` walks ``__subclasses__()``; we register explicitly —
    no global mutable singleton, see SURVEY.md §3)."""

    def __init__(self):
        self.nodes: dict[str, NodeModel] = {}
        self.rels: dict[str, RelationshipModel] = {}
        self._constraints: list[UniquenessConstraint] = []

    def register_node(self, model: NodeModel) -> NodeModel:
        if model.abstract:
            raise ModelError(
                f"abstract model {model.label!r} cannot be registered "
                "(reference basenode.py:89-93)"
            )
        if model.label in self.nodes:
            raise ModelError(f"duplicate primary label {model.label!r}")
        self.nodes[model.label] = model
        return model

    def register_rel(self, model: RelationshipModel) -> RelationshipModel:
        if model.abstract:
            raise ModelError(f"abstract relationship {model.rel_type!r}")
        for lbl in (model.source_label, model.target_label):
            if lbl not in self.nodes:
                raise ModelError(
                    f"relationship {model.rel_type!r} references unknown label {lbl!r}"
                )
        if model.rel_type in self.rels:
            raise ModelError(f"duplicate relationship type {model.rel_type!r}")
        self.rels[model.rel_type] = model
        return model

    def rels_by_source(self, label: str) -> list[RelationshipModel]:
        return [r for r in self.rels.values() if r.source_label == label]

    def rels_by_target(self, label: str) -> list[RelationshipModel]:
        return [r for r in self.rels.values() if r.target_label == label]

    def auto_constraints(self) -> list[UniquenessConstraint]:
        """Derive uniqueness constraints from every (label, pp) pair —
        the analogue of ``auto_constrain_neo4j`` (utils.py:156-176)."""
        return [
            UniquenessConstraint(m.label, m.pp_storage) for m in self.nodes.values()
        ]

    # explicit constraint management (neo4jengine.py:285-328)
    def apply_constraint(self, label: str, prop: str) -> UniquenessConstraint:
        check_identifier(label, "label")
        check_identifier(prop, "property")
        c = UniquenessConstraint(label, prop)
        if c not in self._constraints:
            self._constraints.append(c)
        return c

    def drop_constraint(self, name: str) -> None:
        before = len(self._constraints)
        self._constraints = [c for c in self._constraints if c.name != name]
        if len(self._constraints) == before:
            raise ValueError(f"no constraint named {name!r}")

    def get_constraints(self) -> list[str]:
        return [c.name for c in self._constraints]

    def markdown_schema(self) -> str:
        """Whole-graph schema doc: every node model then every
        relationship model, labels sorted — the catalog-level analogue
        of the reference's Jinja schema dump (``schema_utils.py:53-89``
        driven over ``neontology_schema`` objects)."""
        parts = ["# Graph schema", ""]
        for label in sorted(self.nodes):
            parts.append(self.nodes[label].markdown_schema())
        for rt in sorted(self.rels):
            parts.append(self.rels[rt].markdown_schema())
        return "\n".join(parts)
