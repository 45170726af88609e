"""Target → Spark plan compiler.

The reference's entire relational "planner" is one string-built SQL per
target (utils/ModelUtils.getTargetSql:153-229):

    SELECT {mapped fields}{, agg exprs} FROM PCOLLECTION
    [WHERE w] [GROUP BY mapped fields] [ORDER BY o] [LIMIT n]

We generate the same SQL against a temp view and hand it to Catalyst —
which, unlike Beam's Calcite detour, gives partial+final hash
aggregation, whole-stage codegen, and pushdown for free — then apply a
typed projection per the target's mappings (rename / try_cast /
constant-literal / mandatory-filter; semantics of
transforms/CastExpandTargetRowFn.java:29-40 and
utils/DataCastingUtils.java:62-128: cast failure → null, missing value
→ mapping default).

MERGE-mode dedup (Cypher ``MERGE ... SET n+=props`` last-writer-wins,
database/CypherGenerator.java:63-71) is realized as a window rank over
the natural key ordered by the deterministic tie-break
(event-time/ordinal DESC) — SURVEY.md §7.3.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.spec.model import (
    SPARK_TYPE_FOR_PROPERTY,
    FragmentType,
    Mapping,
    RoleType,
    SaveMode,
    Target,
    TargetType,
)

#: Name of the hidden arrival-order column used for last-writer-wins
#: tie-breaks. Batch: monotonically_increasing_id at ingest; streaming:
#: (event_time, source offset). SURVEY.md §7.3 "deterministic tie-break".
ORDINAL_COL = "__ord__"

_IDENT_RE = re.compile(r"[^a-zA-Z0-9_]")


def make_valid_identifier(name: str) -> str:
    """Reference: ModelUtils.makeValidNeo4jIdentifier:240-251
    (regex ``[^a-zA-Z0-9_]`` → ``_``)."""
    return _IDENT_RE.sub("_", name)


def _q(ident: str) -> str:
    return "`" + ident.replace("`", "``") + "`"


def _edge_sort_field(target: Target) -> str:
    """Reference: ModelUtils.getRelationshipKeyField(target, TARGET) —
    edge targets are implicitly sorted by the target-node key field
    "to reduce locking" (ModelUtils.java:157-163,215-218)."""
    for m in target.mappings_by(FragmentType.target, RoleType.key):
        if m.field:
            return m.field
    return ""


def generate_target_sql(
    target: Target,
    source_cols: list[str],
    view: str = "PCOLLECTION",
    generate_sort: bool = True,
    carry_ordinal: bool = False,
) -> str:
    """String-parity SQL with ModelUtils.getTargetSql:153-229.

    ``source_cols`` is the source schema's column list; mapped fields
    not present there (aggregation aliases) are excluded from the
    SELECT/GROUP BY lists exactly as the reference does (:176-187).
    Ordering rules (reference :156-168,200-218): edge targets sort by
    the target-end key field ASC when present, else transform.order_by;
    the ORDER BY is emitted only when the provider supports sort
    (``generate_sort``); LIMIT is emitted regardless.
    """
    tr = target.transform

    order_by = ""
    if target.target_type == TargetType.edge:
        sort_field = _edge_sort_field(target)
        if sort_field:
            order_by = f"{_q(sort_field)} ASC"
        elif tr.order_by:
            order_by = tr.order_by
    elif tr.order_by:
        order_by = tr.order_by

    if not (tr.group or tr.aggregations):
        sql = f"SELECT * FROM {view}"
        if tr.where:
            sql += f" WHERE {tr.where}"
        if order_by and generate_sort:
            sql += f" ORDER BY {order_by}"
        if tr.limit is not None and tr.limit >= 0:
            sql += f" LIMIT {tr.limit}"
        return sql

    present = [f for f in target.mapped_fields if f in source_cols]
    if not present:
        raise ValueError(
            f"could not find mapped fields for target: {target.name}"
        )  # parity: ModelUtils.java:185-186
    select_parts = [_q(f) for f in present]
    for agg in tr.aggregations:
        select_parts.append(f"{agg.expr} AS {_q(agg.field)}")
    if carry_ordinal and ORDINAL_COL in source_cols:
        # Streaming sinks need a cross-batch LWW order even for grouped
        # targets: carry the group's max arrival/event ordinal through.
        select_parts.append(f"MAX({_q(ORDINAL_COL)}) AS {_q(ORDINAL_COL)}")
    sql = f"SELECT {', '.join(select_parts)} FROM {view}"
    if tr.where:
        sql += f" WHERE {tr.where}"
    sql += f" GROUP BY {', '.join(_q(f) for f in present)}"
    if order_by and generate_sort:
        sql += f" ORDER BY {order_by}"
    if tr.limit is not None and tr.limit >= 0:
        sql += f" LIMIT {tr.limit}"
    return sql


def _typed_expr(m: Mapping) -> "F.Column":
    """One mapping → one typed output column.

    Cast semantics per DataCastingUtils.sourceTextToTargetObjects
    (:62-128): parse failure → null (``try_cast``), missing value →
    mapping default/constant fallback (:79-89).
    """
    spark_t = SPARK_TYPE_FOR_PROPERTY[m.type] if m.type is not None else None
    col = F.lit(m.constant) if m.is_constant else F.col(m.field)
    if spark_t:
        col = col.try_cast(spark_t)
    if m.default is not None:
        default = F.lit(m.default)
        if spark_t:
            default = default.try_cast(spark_t)
        col = F.coalesce(col, default)
    return col


def lww_latest(df: DataFrame, keys: list[str], order_col: str,
               keep_order: bool = False) -> DataFrame:
    """Last-writer-wins per key via aggregation.

    ``max(struct(order, cols...))`` beats the row_number()-window
    formulation at scale because it has MAP-SIDE PARTIAL COMBINE:
    duplicate keys collapse to one row per key BEFORE the shuffle, so
    shuffle volume is bounded by distinct keys, whereas the window must
    shuffle every input row and then sort each partition. (Spark plans
    this as SortAggregate — struct buffers aren't hash-mutable — but
    the sort is on the grouping key over already-combined data.)
    Requires a non-null ``order_col``; ties break deterministically on
    the remaining struct fields.
    """
    others = [c for c in df.columns if c not in keys and c != order_col]
    packed = F.max(F.struct(F.col(order_col),
                            *[F.col(c) for c in others])).alias("__w__")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(packed)
    tail = [F.col(f"__w__.{order_col}").alias(order_col)] if keep_order else []
    return out.select(
        *[F.col(k) for k in keys],
        *[F.col(f"__w__.{c}").alias(c) for c in others],
        *tail,
    )


@dataclass
class CompiledTarget:
    """Output-column layout of a target (graph property names)."""

    target: Target
    #: output column name per mapping (sanitized graph property name)
    out_cols: list[tuple[Mapping, str]]
    key_cols: list[str]           # node natural-key output columns
    src_key_cols: list[str]       # edge source-end key columns
    tgt_key_cols: list[str]       # edge target-end key columns
    prop_cols: list[str]


def apply_join(left: DataFrame, right: DataFrame, join) -> DataFrame:
    """Source-to-source equi-join declared in a target's transform
    (spec/model.py JoinSpec — the reference's docs/README.md:182
    roadmap item, shipped here). Keys are same-named columns; the
    joined side contributes only columns the primary side doesn't
    already have (its ordinal never leaks — the primary's event-time
    ordinal stays the LWW order). ``broadcast=true`` marks a
    dimension-small side; otherwise Catalyst/AQE picks the strategy.
    Works unchanged as a stream-static join when ``left`` streams."""
    missing = [k for k in join.on
               if k not in left.columns or k not in right.columns]
    if missing:
        raise ValueError(
            f"join keys missing from a side: {missing} "
            f"(left: {left.columns}, right: {right.columns})")
    keep = [c for c in right.columns
            if c in join.on
            or (c not in left.columns and c != ORDINAL_COL)]
    r = right.select(*keep)
    if join.broadcast:
        r = F.broadcast(r)
    return left.join(r, on=list(join.on), how=join.how)


def compile_target(target: Target, source_cols: list[str] | None = None) -> CompiledTarget:
    out_cols: list[tuple[Mapping, str]] = []
    key_cols: list[str] = []
    src_key: list[str] = []
    tgt_key: list[str] = []
    prop_cols: list[str] = []
    used: set[str] = set()
    for m in target.mappings:
        if m.role in (RoleType.label, RoleType.type):
            continue
        name = make_valid_identifier(m.name or m.field or m.constant)
        if name in used:
            name = f"{name}_{len(used)}"
        used.add(name)
        out_cols.append((m, name))
        if m.role == RoleType.key:
            if m.fragment == FragmentType.source:
                src_key.append(name)
            elif m.fragment == FragmentType.target:
                tgt_key.append(name)
            else:
                key_cols.append(name)
        else:
            prop_cols.append(name)
    return CompiledTarget(
        target=target,
        out_cols=out_cols,
        key_cols=key_cols,
        src_key_cols=src_key,
        tgt_key_cols=tgt_key,
        prop_cols=prop_cols,
    )


def apply_target(
    spark: SparkSession,
    source_df: DataFrame,
    target: Target,
    dedup: bool | None = None,
    keep_ordinal: bool = False,
) -> DataFrame:
    """Run one target's full relational plan over a source DataFrame.

    Steps (all lazily declared; Catalyst plans the physical execution):
      1. generated SQL (projection/filter/group/agg/sort/limit);
      2. typed projection (rename/cast/constants/mandatory);
      3. MERGE-mode last-writer-wins dedup on the natural key.

    Returns a DataFrame whose columns are the sanitized graph property
    names — the engine's canonical per-target relation.
    """
    # automap: auto-generate a property mapping for every source column
    # not already mapped. The reference PARSES this flag but never
    # implemented it (model/helpers/TargetMapper.java:64 assigns it,
    # docs/README.md:183 lists "Implement automap" as roadmap) — here
    # it is live, so it is opt-in (automap: true) rather than the
    # reference parser's dead-code default. Ignored for grouped
    # targets, where auto-added columns would silently change the
    # GROUP BY set.
    tr0 = target.transform
    if target.automap and not (tr0.group or tr0.aggregations):
        from dataclasses import replace as _dc_replace

        mapped = {m.field for m in target.mappings if m.field}
        extras = [
            Mapping(role=RoleType.property, field=c, name=c)
            for c in source_df.columns
            if c not in mapped and c != ORDINAL_COL
        ]
        if extras:
            target = _dc_replace(target,
                                 mappings=list(target.mappings) + extras)

    ct = compile_target(target, source_df.columns)

    view = f"tgt_{make_valid_identifier(target.name)}_{id(source_df) & 0xFFFF}"
    base = source_df
    tr = target.transform

    if tr.is_identity and tr.limit < 0:
        shaped = base
    else:
        # The implicit edge sort-by-target-key (O2, ModelUtils:215-218)
        # exists only to reduce Neo4j write-lock contention; for an
        # Iceberg/parquet sink it would add a full range-partition
        # shuffle + global sort for nothing, so suppress it in the
        # physical plan (generate_target_sql keeps the capability for
        # string parity; explicit transform.order_by is honored).
        implicit_edge_sort_only = (
            target.target_type == TargetType.edge and not tr.order_by
            and tr.limit < 0)
        # Non-grouping SQL is SELECT * — the ordinal flows through for
        # LWW dedup; grouping SQL projects mapped fields only (the
        # ordinal is consumed by the aggregation, as in the reference
        # where arrival order beyond the GROUP BY is meaningless).
        sql = generate_target_sql(target, source_df.columns, view,
                                  generate_sort=not implicit_edge_sort_only,
                                  carry_ordinal=keep_ordinal)
        base.createOrReplaceTempView(view)
        shaped = spark.sql(sql)

    exprs = []
    if ORDINAL_COL in shaped.columns:
        exprs.append(F.col(ORDINAL_COL))
    mandatory_checks = []
    for m, name in ct.out_cols:
        exprs.append(_typed_expr(m).alias(name))
        if m.mandatory:
            mandatory_checks.append(name)
    projected = shaped.select(*exprs)
    for name in mandatory_checks:
        projected = projected.filter(F.col(name).isNotNull())

    # MERGE dedup (A4): last writer wins per natural key — applied for
    # ALL merge targets, grouped or not: Cypher MERGE collapses per key
    # at the database even after a GROUP BY over all mapped fields
    # (CypherGenerator.java:63-71). Arrival order is nondeterministic in
    # the reference (parallel writers); our canonical tie-break is the
    # ingest ordinal when available, else a deterministic descending
    # sort over the stringified non-key columns (documented in
    # SURVEY.md §7.3 and used identically by batch oracle and stream).
    do_dedup = dedup if dedup is not None else target.save_mode == SaveMode.merge
    keys = ct.key_cols if target.target_type == TargetType.node else (
        ct.src_key_cols + ct.tgt_key_cols
    )
    if do_dedup and keys and (tr.group or tr.aggregations):
        # GROUP BY already makes rows unique per its grouping columns.
        # When every field-derived non-key output column is absent from
        # the source (i.e. it's an aggregation alias or a constant),
        # the grouping columns ARE the key columns — the MERGE dedup
        # would be a no-op, so skip the extra shuffle+agg entirely.
        extra_group_cols = [
            name for m, name in ct.out_cols
            if name not in keys and not m.is_constant
            and m.field and m.field in source_df.columns
        ]
        # The skip is only sound when the key columns are cast-free:
        # grouping ran on RAW source values, keys are the TYPED outputs,
        # and a cast can merge distinct raw groups into one key ('1',
        # ' 1', '01' → 1; unparseable → null) — which would emit
        # duplicate-key rows from a merge target. Keys with a declared
        # type keep the LWW dedup on the post-cast values.
        keys_cast_free = all(
            m.type is None for m, name in ct.out_cols if name in keys)
        if not extra_group_cols and keys_cast_free:
            do_dedup = False
    out_order = [c for c in projected.columns if c != ORDINAL_COL]
    if keep_ordinal and ORDINAL_COL in projected.columns:
        out_order.append(ORDINAL_COL)
    if do_dedup and keys:
        if ORDINAL_COL in projected.columns:
            # Hash-agg LWW: partial combine + no sort (see lww_latest).
            projected = lww_latest(projected, keys, ORDINAL_COL,
                                   keep_order=keep_ordinal)
        else:
            # No arrival ordinal → deterministic fallback: greatest
            # stringified non-key tuple wins (documented tie-break).
            # Expressed as max(struct(sort keys, values)) rather than a
            # row_number window: the aggregate gets map-side partial
            # combine (shuffle bounded by distinct keys) and needs no
            # per-partition sort — the plan that survives 100x scale.
            non_key = [c for c in projected.columns if c not in keys]
            if not non_key:
                projected = projected.dropDuplicates(keys)
            else:
                packed = F.max(F.struct(
                    *[F.col(c).cast("string").alias(f"__s{i}__")
                      for i, c in enumerate(non_key)],
                    F.struct(*[F.col(c) for c in non_key]).alias("__v__"),
                )).alias("__w__")
                projected = (
                    projected.groupBy(*[F.col(k) for k in keys])
                    .agg(packed)
                    .select(*[F.col(k) for k in keys],
                            *[F.col(f"__w__.__v__.{c}").alias(c)
                              for c in non_key])
                )
    if not keep_ordinal and ORDINAL_COL in projected.columns:
        projected = projected.drop(ORDINAL_COL)
    return projected.select(*out_order)
