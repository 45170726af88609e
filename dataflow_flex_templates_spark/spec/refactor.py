"""Job-spec rewriting — the reference's `InputRefactoring` stage.

Mirrors model/InputRefactoring.java:38-108 (SURVEY.md §3.1):
- `$var` token substitution into source URIs/SQL and action options
  (regex parity with utils/ModelUtils.java:41,358-378);
- target auto-naming + `sequence` numbering (:64-71);
- `optimizeJobSpec` = stable nodes-before-edges sort (:75-81) —
  preserved so downstream write ordering (D2) is deterministic.
"""

from __future__ import annotations

import re

from dataflow_flex_templates_spark.spec.model import (
    FragmentType,
    JobSpec,
    Mapping,
    RoleType,
    SaveMode,
    Target,
    TargetType,
)

#: The reference's whitelist of Spark-connector-style job options
#: (InputValidator.java:35-44). The reference VALIDATES these but never
#: builds anything from them ("this options array was created to allow
#: mimicing Spark syntax" — JobSpecMapper.java:75); we go one step
#: further and synthesize runnable targets (below).
CONNECTOR_OPTION_KEYS = frozenset({
    "relationship",
    "relationship.save.strategy",
    "relationship.source.labels",
    "relationship.source.save.mode",
    "relationship.source.node.keys",
    "relationship.target.labels",
    "relationship.target.node.keys",
    "relationship.target.node.properties",
    "relationship.target.save.mode",
})


def _parse_labels(s: str) -> list[str]:
    return [x for x in s.split(":") if x.strip()]


def _parse_field_map(s: str) -> list[tuple[str, str]]:
    """``"field:prop,field2:prop2"`` → [(field, prop), ...]."""
    out = []
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        f, _, p = part.partition(":")
        out.append((f.strip(), (p or f).strip()))
    return out


def synthesize_connector_targets(spec: JobSpec) -> None:
    """Build node/edge targets from Spark-Neo4j-connector-style options
    (json-musicians-jobspec-options-syntax.json fixture).

    Connector ``overwrite``/``match``/``merge`` save modes and the
    ``keys`` save strategy all resolve nodes by key — our keyed MERGE
    upsert (LWW) is the faithful analogue for every mode.
    """
    opts = spec.options
    if spec.targets or "relationship" not in opts:
        return
    rel_type = str(opts["relationship"])
    source_name = next(iter(spec.sources), "")
    src_labels = _parse_labels(opts.get("relationship.source.labels", ""))
    tgt_labels = _parse_labels(opts.get("relationship.target.labels", ""))
    src_keys = _parse_field_map(opts.get("relationship.source.node.keys", ""))
    tgt_keys = _parse_field_map(opts.get("relationship.target.node.keys", ""))
    tgt_props = _parse_field_map(
        opts.get("relationship.target.node.properties", ""))

    def node_target(label: str, keys, props) -> Target:
        maps = [Mapping(role=RoleType.label, constant=label)]
        maps += [Mapping(role=RoleType.key, field=f, name=p,
                         unique=True, indexed=True) for f, p in keys]
        maps += [Mapping(role=RoleType.property, field=f, name=p)
                 for f, p in props]
        return Target(name=label, source=source_name,
                      target_type=TargetType.node,
                      save_mode=SaveMode.merge, mappings=maps)

    edge_maps = [Mapping(role=RoleType.type, fragment=FragmentType.rel,
                         constant=rel_type)]
    edge_maps += [Mapping(role=RoleType.key, fragment=FragmentType.source,
                          field=f, name=p,
                          label=src_labels[0] if src_labels else "")
                  for f, p in src_keys]
    edge_maps += [Mapping(role=RoleType.key, fragment=FragmentType.target,
                          field=f, name=p,
                          label=tgt_labels[0] if tgt_labels else "")
                  for f, p in tgt_keys]

    spec.targets.extend([
        node_target(src_labels[0] if src_labels else "Source",
                    src_keys, []),
        node_target(tgt_labels[0] if tgt_labels else "Target",
                    tgt_keys, tgt_props),
        Target(name=rel_type, source=source_name,
               target_type=TargetType.edge, save_mode=SaveMode.merge,
               mappings=edge_maps),
    ])

# Reference token pattern: ModelUtils.java:41 — `$alphanumeric_` tokens.
_TOKEN_RE = re.compile(r"\$([a-zA-Z0-9_]+)")


def replace_variable_tokens(text: str, tokens: dict[str, str]) -> str:
    """Reference: ModelUtils.replaceVariableTokens:358-378."""
    if not text:
        return text

    def sub(m: re.Match) -> str:
        return str(tokens.get(m.group(1), m.group(0)))

    return _TOKEN_RE.sub(sub, text)


def refactor_job_spec(
    spec: JobSpec,
    runtime_tokens: dict[str, str] | None = None,
    read_query: str = "",
    input_file_pattern: str = "",
) -> JobSpec:
    """Apply runtime overrides, token substitution, sequence numbering,
    nodes-first sort.

    ``read_query`` / ``input_file_pattern`` are the template's runtime
    source overrides (InputRefactoring.rewriteSource:83-100 via
    OptionsParamsMapper:20-23): when set they replace every source's
    SQL / URI before token substitution.

    Mutates and returns `spec` (matching the reference's in-place
    InputRefactoring.refactorJobSpec).
    """
    synthesize_connector_targets(spec)

    tokens = dict(spec.options)
    tokens.update(runtime_tokens or {})
    str_tokens = {k: str(v) for k, v in tokens.items()}

    for src in spec.sources.values():
        uri = input_file_pattern or src.uri
        sql = read_query or src.query
        src.uri = replace_variable_tokens(uri, str_tokens)
        src.query = replace_variable_tokens(sql, str_tokens)

    for a in spec.actions:
        a.options = {
            k: replace_variable_tokens(v, str_tokens) if isinstance(v, str) else v
            for k, v in a.options.items()
        }

    # Auto-name + sequence (reference: InputRefactoring.java:64-71).
    for i, t in enumerate(spec.targets):
        if not t.name:
            t.name = f"{t.target_type.value}_target_{i}"
        t.sequence = i

    # Stable nodes-first ordering (reference: InputRefactoring.java:75-81,
    # Target.compareTo at Target.java:46-54).
    spec.targets.sort(
        key=lambda t: (0 if t.target_type == TargetType.node else 1, t.sequence)
    )
    return spec
