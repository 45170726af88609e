"""Job-spec data model.

Mirrors the reference IR (``model/job/*.java`` in
neo4j-partners/dataflow-flex-templates): JobSpec → Sources + Targets
(+ Config, Actions); each Target carries a Transform and a list of
Mappings. See SURVEY.md §1.1–1.2 for the file:line parity map:

- Source       ≅ model/job/Source.java:20-37
- Target       ≅ model/job/Target.java:20-36
- Mapping      ≅ model/job/Mapping.java:15-28
- Transform    ≅ model/job/Transform.java (group/aggregations/where/
                 order_by/limit), Aggregation ≅ model/job/Aggregation.java:8-11
- Config       ≅ model/job/Config.java:12-36
- JobSpec      ≅ model/job/JobSpec.java:22-26
- enums        ≅ model/enums/{RoleType,FragmentType,TargetType,SaveMode,
                 PropertyType,ActionExecuteAfter}.java
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dc_field


class TargetType(str, enum.Enum):
    node = "node"
    edge = "edge"


class SaveMode(str, enum.Enum):
    append = "append"
    merge = "merge"


class RoleType(str, enum.Enum):
    key = "key"
    label = "label"
    property = "property"
    type = "type"


class FragmentType(str, enum.Enum):
    node = "node"
    source = "source"
    target = "target"
    rel = "rel"


class PropertyType(str, enum.Enum):
    # Reference: model/enums/PropertyType.java (14 values).
    String = "String"
    Integer = "Integer"
    Long = "Long"
    Float = "Float"
    BigDecimal = "BigDecimal"
    Boolean = "Boolean"
    Date = "Date"
    LocalDateTime = "LocalDateTime"
    ByteArray = "ByteArray"
    Time = "Time"
    Point = "Point"
    Duration = "Duration"
    LocalTime = "LocalTime"
    DateTime = "DateTime"


# Spark-side type for each declared PropertyType (SURVEY.md §1.3 table).
SPARK_TYPE_FOR_PROPERTY: dict[PropertyType, str] = {
    PropertyType.String: "string",
    PropertyType.Integer: "bigint",
    PropertyType.Long: "bigint",
    PropertyType.Float: "double",
    PropertyType.BigDecimal: "decimal(38,9)",
    PropertyType.Boolean: "boolean",
    PropertyType.Date: "date",
    PropertyType.LocalDateTime: "timestamp",
    PropertyType.ByteArray: "binary",
    PropertyType.Time: "string",
    PropertyType.Point: "string",
    PropertyType.Duration: "decimal(38,9)",
    PropertyType.LocalTime: "timestamp",
    PropertyType.DateTime: "timestamp",
}


class ActionExecuteAfter(str, enum.Enum):
    start = "start"
    sources = "sources"
    nodes = "nodes"
    edges = "edges"
    loads = "loads"
    preloads = "preloads"
    async_ = "async"
    action = "action"
    source = "source"
    node = "node"
    edge = "edge"


class SourceType(str, enum.Enum):
    text = "text"
    bigquery = "bigquery"   # kept for spec compat; executed as spark.sql
    parquet = "parquet"
    iceberg = "iceberg"
    inline = "inline"       # inline `data` rows embedded in the spec


@dataclass
class Aggregation:
    """One SQL aggregate expression with an output alias.

    Reference: model/job/Aggregation.java:8-11 (`expr`, `field`).
    """

    expr: str
    field: str


@dataclass
class WindowSpec:
    """Event-time window declaration — a streaming extension to the
    reference's spec language (north_rule: tumbling/sliding/session
    windows with watermarks; SURVEY §2.10). Absent in the reference,
    which is batch-only (GcpToNeo4j.java:292-293)."""

    kind: str = "tumbling"          # tumbling | sliding | session
    duration: str = ""              # tumbling/sliding window length
    slide: str = ""                 # sliding only
    gap: str = ""                   # session only


@dataclass
class JoinSpec:
    """Source-to-source join declared inside a target's transform —
    the reference's own roadmap item ("Supporting join transformations
    inside the job", docs/README.md:182), never parsed or implemented
    there; this grammar ships it:

        "transform": {"join": {"with": "<source name>",
                               "on": ["key", ...],
                               "how": "inner" | "left",
                               "broadcast": true|false}}

    Keys are same-named columns on both sides (equi-join); the joined
    source contributes only columns the primary source doesn't already
    have (deterministic collision rule). In streaming jobs the joined
    side is read once as a STATIC frame → a stream-static join."""

    with_source: str = ""
    on: list[str] = dc_field(default_factory=list)
    how: str = "inner"              # inner | left
    broadcast: bool = False         # hint: joined side is dimension-small


@dataclass
class Transform:
    """Per-target relational transform (the whole "planner" surface of
    the reference — utils/ModelUtils.getTargetSql:153-229)."""

    group: bool = False
    aggregations: list[Aggregation] = dc_field(default_factory=list)
    where: str = ""
    order_by: str = ""
    limit: int = -1
    window: "WindowSpec | None" = None   # streaming extension
    join: "JoinSpec | None" = None       # roadmap-item extension
    #: Multi-shard ingest: other sources appended (unionByName, missing
    #: columns null) to the target's source BEFORE join/where/group.
    #: Batch-only — in a streaming job a static union would re-append
    #: every micro-batch (SpecStreamJob rejects it).
    union: list[str] = dc_field(default_factory=list)

    @property
    def is_identity(self) -> bool:
        # Reference: ModelUtils.targetHasTransforms:126-134.
        return not (
            self.group
            or self.aggregations
            or self.where
            or self.order_by
        )


@dataclass
class Mapping:
    """One source-field (or constant) → graph-element binding.

    Reference: model/job/Mapping.java:15-28.
    """

    role: RoleType = RoleType.property
    fragment: FragmentType = FragmentType.node
    name: str = ""        # graph-side property name
    field: str = ""       # source column ("" if constant)
    constant: str = ""    # literal value ("" if field-bound)
    type: PropertyType | None = None
    unique: bool = False
    indexed: bool = False
    mandatory: bool = False
    default: str | None = None
    label: str = ""       # node label this key resolves against (edge ends)

    @property
    def is_constant(self) -> bool:
        return self.constant != "" and self.field == ""


@dataclass
class Source:
    """A named, schema'd relational input.

    Reference: model/job/Source.java:20-37.
    """

    name: str
    source_type: SourceType = SourceType.text
    uri: str = ""
    delimiter: str = ","
    separator: str = ""           # row separator for inline blobs
    query: str = ""               # SQL text (bigquery-type sources)
    csv_format: str = "DEFAULT"   # named CSV dialect (SourceMapper.java:28-52)
    field_names: list[str] = dc_field(default_factory=list)
    inline: list[list] = dc_field(default_factory=list)  # parsed inline rows
    table: str = ""               # parquet/iceberg table path or name


@dataclass
class Target:
    """Declarative mapping from source rows to ONE graph entity type.

    Reference: model/job/Target.java:20-36.
    """

    name: str
    source: str
    target_type: TargetType = TargetType.node
    active: bool = True
    save_mode: SaveMode = SaveMode.merge
    transform: Transform = dc_field(default_factory=Transform)
    mappings: list[Mapping] = dc_field(default_factory=list)
    sequence: int = 0
    execute_after: str = ""
    execute_after_name: str = ""
    automap: bool = False

    # ---- mapping lookups (reference: utils/ModelUtils.java) -------------

    def mappings_by(
        self, fragment: FragmentType | None = None, role: RoleType | None = None
    ) -> list[Mapping]:
        out = []
        for m in self.mappings:
            if fragment is not None and m.fragment != fragment:
                continue
            if role is not None and m.role != role:
                continue
            out.append(m)
        return out

    @property
    def labels(self) -> list[str]:
        """Node labels (node targets) — constants or field-bound."""
        return [
            m.constant or m.field
            for m in self.mappings_by(FragmentType.node, RoleType.label)
        ]

    @property
    def edge_type(self) -> str:
        for m in self.mappings_by(FragmentType.rel, RoleType.type):
            return m.constant or m.field
        return ""

    @property
    def key_mappings(self) -> list[Mapping]:
        if self.target_type == TargetType.node:
            return self.mappings_by(FragmentType.node, RoleType.key)
        return self.mappings_by(role=RoleType.key)

    @property
    def mapped_fields(self) -> list[str]:
        """Ordered distinct source fields referenced by any mapping.

        Reference: ModelUtils field list for generated SQL (:176-187).
        """
        seen: list[str] = []
        for m in self.mappings:
            if m.field and m.field not in seen:
                seen.append(m.field)
        return seen


@dataclass
class Config:
    """Runtime knobs. Reference: model/job/Config.java:12-36.

    NOTE: the reference has a JSON-key swap bug (`node_write_batch_size`
    assigns nodeParallelism and vice versa, flagged "not currently
    implemented" at Config.java:29-33). We keep the JSON keys but wire
    them CORRECTLY: parallelism → repartition width, batch size →
    micro-batch commit granularity.
    """

    reset_db: bool = False
    index_all_properties: bool = False
    audit_uri: str = ""
    audit_format: str = "parquet"
    node_parallelism: int = 5
    edge_parallelism: int = 1
    node_batch_size: int = 5000
    edge_batch_size: int = 1000
    #: JSON keys the spec actually set — knobs are APPLIED only when
    #: explicit (the defaults exist for reference parity; silently
    #: repartitioning every job to width 5/1 would be a de-optimization)
    explicit_keys: frozenset = frozenset()

    def wants(self, key: str) -> bool:
        return key in self.explicit_keys


@dataclass
class Action:
    """Pre/post hook. Reference: model/job/Action.java + actions/*."""

    name: str
    action_type: str = "cypher"   # cypher | bigquery | http_get | http_post
    options: dict = dc_field(default_factory=dict)
    headers: dict = dc_field(default_factory=dict)
    execute_after: str = "loads"
    execute_after_name: str = ""


@dataclass
class JobSpec:
    """Reference: model/job/JobSpec.java:22-26."""

    sources: dict[str, Source] = dc_field(default_factory=dict)
    targets: list[Target] = dc_field(default_factory=list)
    config: Config = dc_field(default_factory=Config)
    options: dict = dc_field(default_factory=dict)
    actions: list[Action] = dc_field(default_factory=list)

    @property
    def node_targets(self) -> list[Target]:
        return [t for t in self.targets if t.target_type == TargetType.node and t.active]

    @property
    def edge_targets(self) -> list[Target]:
        return [t for t in self.targets if t.target_type == TargetType.edge and t.active]
