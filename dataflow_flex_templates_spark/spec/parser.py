"""Job-spec JSON → :class:`JobSpec` IR.

Parses BOTH mapping grammars of the reference:

- compact/transposed (``{"labels": [...], "keys": [...], "properties":
  {...}}``) — semantics of model/helpers/TransposedMappingMapper.java:
  nodes :40-83, edges :85-119, typed buckets :155-200, quoted-constant
  rule :267-289, duplicate-mapping error :291-300;
- verbose (array of mapping objects) — semantics of
  model/helpers/VerboseMappingMapper.java:15-44 (role==key forces
  unique=indexed=true, :31-34).

Top-level layout mirrors model/helpers/JobSpecMapper.java:24-105 and
SourceMapper.java:28-94 (CSV dialects, inline data).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from dataflow_flex_templates_spark.spec.model import (
    Action,
    Aggregation,
    Config,
    FragmentType,
    JobSpec,
    Mapping,
    PropertyType,
    RoleType,
    SaveMode,
    Source,
    SourceType,
    Target,
    TargetType,
    Transform,
    JoinSpec,
    WindowSpec,
)

# Named CSV dialects → Spark csv-reader options.
# Reference: model/helpers/SourceMapper.java:28-52 maps these names to
# org.apache.commons.csv.CSVFormat presets; we map to the equivalent
# Spark `spark.read.csv` options (sep/quote/escape).
CSV_DIALECTS: dict[str, dict[str, str]] = {
    "DEFAULT": {"sep": ",", "quote": '"', "escape": '"'},
    "EXCEL": {"sep": ",", "quote": '"', "escape": '"'},
    "RFC4180": {"sep": ",", "quote": '"', "escape": '"'},
    "INFORMIX_UNLOAD": {"sep": "|", "quote": '"', "escape": "\\"},
    "INFORMIX_UNLOAD_CSV": {"sep": ",", "quote": '"', "escape": "\\"},
    "MONGODB_CSV": {"sep": ",", "quote": '"', "escape": '"'},
    "MONGODB_TSV": {"sep": "\t", "quote": '"', "escape": '"'},
    "MYSQL": {"sep": "\t", "quote": "", "escape": "\\"},
    "ORACLE": {"sep": ",", "quote": '"', "escape": "\\"},
    "POSTGRESQL_CSV": {"sep": ",", "quote": '"', "escape": '"'},
    "POSTGRESQL_TEXT": {"sep": "\t", "quote": '"', "escape": "\\"},
    "TDF": {"sep": "\t", "quote": '"', "escape": '"'},
}


class SpecParseError(ValueError):
    pass


def _is_quoted_constant(v: str) -> bool:
    # Reference: TransposedMappingMapper.java:267-289 — double-quoted
    # values are constants, unquoted are field references.
    return len(v) >= 2 and v.startswith('"') and v.endswith('"')


def _unquote(v: str) -> str:
    return v[1:-1] if _is_quoted_constant(v) else v


def _field_name_pairs(entry: Any) -> list[tuple[str, str]]:
    """A bucket entry is a bare string (field==name), a one-element dict
    {field: name}, or a dict of several such pairs."""
    if isinstance(entry, str):
        return [(entry, entry)]
    if isinstance(entry, dict):
        return [(k, v) for k, v in entry.items()]
    raise SpecParseError(f"unparseable mapping entry: {entry!r}")


_TYPED_BUCKETS: dict[str, PropertyType] = {
    # Reference: TransposedMappingMapper.java:155-200.
    "dates": PropertyType.Date,
    "doubles": PropertyType.Float,
    "longs": PropertyType.Long,
    "strings": PropertyType.String,
    "booleans": PropertyType.Boolean,
    "points": PropertyType.Point,
}


def _bucket_entries(bucket: Any) -> list[Any]:
    """Property buckets may be a list of entries or a single dict of
    field→name pairs (the reference accepts both shapes — see
    text-northwind-jobspec.json `doubles` vs `longs`)."""
    if bucket is None:
        return []
    if isinstance(bucket, list):
        return bucket
    if isinstance(bucket, dict):
        return [{k: v} for k, v in bucket.items()]
    return [bucket]


def _parse_transposed_properties(
    props: dict, fragment: FragmentType, out: list[Mapping]
) -> None:
    for key, flags in (("unique", dict(unique=True, indexed=True)),
                       ("indexed", dict(indexed=True)),
                       ("mandatory", dict(mandatory=True))):
        for entry in _bucket_entries(props.get(key)):
            for fld, name in _field_name_pairs(entry):
                out.append(Mapping(role=RoleType.property, fragment=fragment,
                                   field=_unquote(fld) if not _is_quoted_constant(fld) else "",
                                   constant=_unquote(fld) if _is_quoted_constant(fld) else "",
                                   name=name, **flags))
    for bucket, ptype in _TYPED_BUCKETS.items():
        for entry in _bucket_entries(props.get(bucket)):
            for fld, name in _field_name_pairs(entry):
                is_const = _is_quoted_constant(fld)
                out.append(Mapping(role=RoleType.property, fragment=fragment,
                                   field="" if is_const else fld,
                                   constant=_unquote(fld) if is_const else "",
                                   name=name, type=ptype))


def parse_transposed_node_mappings(m: dict) -> list[Mapping]:
    """Reference: TransposedMappingMapper.parseNode:40-83."""
    out: list[Mapping] = []
    for lbl in m.get("labels", []) or []:
        is_const = _is_quoted_constant(lbl)
        out.append(Mapping(role=RoleType.label, fragment=FragmentType.node,
                           constant=_unquote(lbl) if is_const else "",
                           field="" if is_const else lbl,
                           name=_unquote(lbl)))
    if "label" in m:
        lbl = m["label"]
        is_const = _is_quoted_constant(lbl)
        out.append(Mapping(role=RoleType.label, fragment=FragmentType.node,
                           constant=_unquote(lbl) if is_const else "",
                           field="" if is_const else lbl,
                           name=_unquote(lbl)))
    for entry in _bucket_entries(m.get("keys")):
        for fld, name in _field_name_pairs(entry):
            out.append(Mapping(role=RoleType.key, fragment=FragmentType.node,
                               field=fld, name=name,
                               unique=True, indexed=True))
    _parse_transposed_properties(m.get("properties", {}) or {}, FragmentType.node, out)
    _check_duplicates(out)
    return out


def parse_transposed_edge_mappings(m: dict) -> list[Mapping]:
    """Reference: TransposedMappingMapper.parseEdge:85-119."""
    out: list[Mapping] = []
    if "type" in m:
        t = m["type"]
        is_const = _is_quoted_constant(t)
        out.append(Mapping(role=RoleType.type, fragment=FragmentType.rel,
                           constant=_unquote(t) if is_const else "",
                           field="" if is_const else t,
                           name=_unquote(t)))
    for frag_key, frag in (("source", FragmentType.source), ("target", FragmentType.target)):
        end = m.get(frag_key, {}) or {}
        label = _unquote(end.get("label", ""))
        for entry in _bucket_entries(end.get("key")):
            for fld, name in _field_name_pairs(entry):
                out.append(Mapping(role=RoleType.key, fragment=frag,
                                   field=fld, name=name, label=label,
                                   unique=True, indexed=True))
        # label itself recorded as a label mapping on the fragment
        if label:
            out.append(Mapping(role=RoleType.label, fragment=frag,
                               constant=label, name=label))
    _parse_transposed_properties(m.get("properties", {}) or {}, FragmentType.rel, out)
    _check_duplicates(out)
    return out


def _check_duplicates(mappings: list[Mapping]) -> None:
    # Reference: TransposedMappingMapper.java:291-300 — duplicate field
    # mappings in one target are an error. Key + property on the same
    # field across different (fragment, role) is allowed only when
    # names differ; exact duplicates throw.
    seen: set[tuple] = set()
    for m in mappings:
        sig = (m.fragment, m.role, m.field or ("\x00" + m.constant), m.name)
        if sig in seen:
            raise SpecParseError(f"duplicate mapping: {sig}")
        seen.add(sig)


def parse_verbose_mappings(entries: list[dict], target_type: TargetType) -> list[Mapping]:
    """Reference: VerboseMappingMapper.java:15-44."""
    out: list[Mapping] = []
    default_fragment = (
        FragmentType.node if target_type == TargetType.node else FragmentType.rel
    )
    for e in entries:
        role = RoleType(e.get("role", "property"))
        fragment = FragmentType(e.get("fragment", default_fragment.value))
        ptype = PropertyType(e["type"]) if e.get("type") else None
        m = Mapping(
            role=role,
            fragment=fragment,
            name=e.get("name", ""),
            field=e.get("field", ""),
            constant=str(e.get("constant", "") or ""),
            type=ptype,
            unique=bool(e.get("unique", False)),
            indexed=bool(e.get("indexed", False)),
            mandatory=bool(e.get("mandatory", False)),
            default=e.get("default"),
            label=_unquote(str(e.get("label", "") or "")),
        )
        if role == RoleType.key:
            # Reference: VerboseMappingMapper.java:31-34.
            m.unique = True
            m.indexed = True
        if not m.name:
            m.name = m.field or m.constant
        out.append(m)
    _check_duplicates(out)
    return out


def _parse_transform(t: dict | None) -> Transform:
    t = t or {}
    aggs = [Aggregation(expr=a["expr"], field=a["field"])
            for a in t.get("aggregations", []) or []]
    w = t.get("window")
    window = None
    if w:
        window = WindowSpec(
            kind=w.get("type", w.get("kind", "tumbling")),
            duration=w.get("duration", "") or "",
            slide=w.get("slide", "") or "",
            gap=w.get("gap", "") or "",
        )
    j = t.get("join")
    join = None
    if j:
        join = JoinSpec(
            with_source=j.get("with", j.get("with_source", "")) or "",
            on=[str(k) for k in (j.get("on", []) or [])],
            how=(j.get("how", "inner") or "inner").lower(),
            broadcast=bool(j.get("broadcast", False)),
        )
    return Transform(
        group=bool(t.get("group", False)),
        aggregations=aggs,
        where=t.get("where", "") or "",
        order_by=t.get("order_by", "") or "",
        limit=int(t.get("limit", -1) if t.get("limit") is not None else -1),
        window=window,
        join=join,
        union=[str(u) for u in (t.get("union", []) or [])],
    )


def _parse_target(raw: dict, idx: int) -> Target:
    # Compact grammar nests under "node"/"edge"; verbose is flat with
    # an explicit "type". Reference: TargetMapper.java.
    if "node" in raw:
        body, ttype = raw["node"], TargetType.node
    elif "edge" in raw:
        body, ttype = raw["edge"], TargetType.edge
    else:
        body, ttype = raw, TargetType(raw.get("type", "node"))

    mappings_raw = body.get("mappings", [])
    if isinstance(mappings_raw, dict):
        mappings = (parse_transposed_node_mappings(mappings_raw)
                    if ttype == TargetType.node
                    else parse_transposed_edge_mappings(mappings_raw))
    else:
        mappings = parse_verbose_mappings(mappings_raw, ttype)

    # Default execute_after: nodes wait on sources, edges on nodes
    # (reference: TargetMapper.java:65-74).
    default_after = "sources" if ttype == TargetType.node else "nodes"
    return Target(
        name=body.get("name", f"target_{idx}"),
        source=body.get("source", ""),
        target_type=ttype,
        active=bool(body.get("active", True)),
        save_mode=SaveMode(body.get("mode", "merge")),
        transform=_parse_transform(body.get("transform")),
        mappings=mappings,
        sequence=int(body.get("sequence", 0)),
        execute_after=body.get("execute_after", default_after),
        execute_after_name=body.get("execute_after_name", ""),
        automap=bool(body.get("automap", False)),
    )


def _parse_source(raw: dict) -> Source:
    stype_raw = raw.get("type", "text").lower()
    inline_rows: list[list] = []
    data = raw.get("data")
    if data is not None:
        stype_raw = "inline"
        if isinstance(data, str):
            # delimited blob with a row separator, each line CSV-parsed
            # with full quote semantics (reference: Source.java:39-74 +
            # TextParserUtils.parseDelimitedLine — Commons CSV)
            import csv as _csv
            import io as _io

            rowsep = raw.get("separator") or "\n"
            delim = raw.get("delimiter") or ","
            # drop only truly EMPTY lines (StringUtils.isEmpty parity,
            # TextParserUtils.parseDelimitedLine) — whitespace-only
            # cells are data
            lines = [ln for ln in data.split(rowsep) if ln != ""]
            inline_rows = list(
                _csv.reader(_io.StringIO("\n".join(lines)),
                            delimiter=delim, quotechar='"'))
        else:
            inline_rows = [list(r) for r in data]
    fields_raw = raw.get("ordered_field_names", "")
    field_names = ([f.strip() for f in fields_raw.split(",") if f.strip()]
                   if isinstance(fields_raw, str)
                   else list(fields_raw))
    try:
        stype = SourceType(stype_raw)
    except ValueError:
        stype = SourceType.text
    return Source(
        name=raw.get("name", "source"),
        source_type=stype,
        uri=raw.get("uri", ""),
        delimiter=raw.get("delimiter", ","),
        separator=raw.get("separator", ""),
        query=raw.get("query", ""),
        csv_format=raw.get("format", "DEFAULT").upper(),
        field_names=field_names,
        inline=inline_rows,
        table=raw.get("table", ""),
    )


def _parse_config(raw: dict | None) -> Config:
    raw = raw or {}
    # The reference swaps node_write_batch_size ↔ node_write_parallelism
    # when assigning fields (Config.java:29-33, a flagged bug). We wire
    # the JSON keys to their INTENDED meanings.
    return Config(
        reset_db=bool(raw.get("reset_db", False)),
        index_all_properties=bool(raw.get("index_all_properties", False)),
        audit_uri=raw.get("audit_gs_uri", raw.get("audit_uri", "")) or "",
        audit_format=raw.get("avro_type", raw.get("audit_format", "parquet")) or "parquet",
        node_parallelism=int(raw.get("node_write_parallelism", 5)),
        edge_parallelism=int(raw.get("edge_write_parallelism", 1)),
        node_batch_size=int(raw.get("node_write_batch_size", 5000)),
        edge_batch_size=int(raw.get("edge_write_batch_size", 1000)),
        explicit_keys=frozenset(raw),
    )


def _parse_action(raw: dict) -> Action:
    return Action(
        name=raw.get("name", "action"),
        action_type=raw.get("type", "cypher").lower(),
        options={k: v for d in (raw.get("options") or []) for k, v in
                 (d.items() if isinstance(d, dict) else [])}
        if isinstance(raw.get("options"), list) else (raw.get("options") or {}),
        headers=raw.get("headers") or {},
        execute_after=raw.get("execute_after", "loads"),
        execute_after_name=raw.get("execute_after_name", ""),
    )


def parse_job_spec(spec: dict | str | Path) -> JobSpec:
    """Parse a job-spec JSON document (dict, JSON string, or file path).

    Reference lifecycle: JobSpecMapper.java:24-105.
    """
    if isinstance(spec, Path):
        spec = json.loads(spec.read_text())
    elif isinstance(spec, str):
        s = spec.lstrip()
        if s.startswith("{") or s.startswith("["):
            spec = json.loads(spec)
        else:
            spec = json.loads(Path(spec).read_text())

    sources: dict[str, Source] = {}
    raw_sources = spec.get("sources")
    if raw_sources is None and "source" in spec:
        raw_sources = [spec["source"]]
    for raw in raw_sources or []:
        s = _parse_source(raw)
        sources[s.name] = s

    targets = [_parse_target(t, i) for i, t in enumerate(spec.get("targets", []) or [])]
    actions = [_parse_action(a) for a in spec.get("actions", []) or []]

    # Options arrive either as one dict or as a list of single-key
    # dicts (the Spark-connector-style syntax in the reference's
    # json-musicians-jobspec-options-syntax.json fixture).
    opts_raw = spec.get("options") or {}
    if isinstance(opts_raw, list):
        opts = {k: v for d in opts_raw for k, v in d.items()}
    else:
        opts = dict(opts_raw)

    return JobSpec(
        sources=sources,
        targets=targets,
        config=_parse_config(spec.get("config")),
        options=opts,
        actions=actions,
    )
