"""Job-spec validation.

Mirrors model/InputValidator.java:80-213 rule-for-rule (SURVEY.md §3.1):
- every target names an existing source;
- no ORDER BY inside source SQL (:91-98) — Spark supports it, so we
  downgrade the reference's hard error to a warning but keep the rule
  observable for parity tests;
- edge targets: source/target key + label presence (:125-149);
- node targets: ≥1 label and ≥1 key (:150-163);
- aggregation output fields must not collide with mapped fields
  (:165-172);
- action option/param sanity (:186-210).
"""

from __future__ import annotations

import re

from dataflow_flex_templates_spark.spec.model import (
    FragmentType,
    JobSpec,
    RoleType,
    TargetType,
)

_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)


class SpecValidationError(ValueError):
    def __init__(self, errors: list[str]):
        self.errors = errors
        super().__init__("; ".join(errors))


def validate_job_spec(spec: JobSpec, strict_order_by: bool = False,
                      strict: bool = False) -> list[str]:
    """Return a list of warnings; raise SpecValidationError on errors.

    ``strict=True`` restores the reference's hard-error behavior for
    every rule this engine deliberately downgrades to a warning
    (unknown job options per InputValidator.java:175-184, ORDER BY in
    source SQL per :91-98) — for users linting specs against reference
    semantics."""
    strict_order_by = strict_order_by or strict
    errors: list[str] = []
    warnings: list[str] = []

    if not spec.sources:
        errors.append("job spec defines no sources")
    if not spec.targets and not spec.actions:
        errors.append("job spec defines no targets and no actions")

    for name, src in spec.sources.items():
        if src.query and _ORDER_BY_RE.search(src.query):
            # Reference: InputValidator.java:91-98 (hard error there).
            msg = f"source '{name}': ORDER BY in source query"
            (errors if strict_order_by else warnings).append(
                msg + ("" if strict_order_by else " (allowed in Spark; reference rejects)")
            )

    for t in spec.targets:
        where = f"target '{t.name}'"
        if t.source and t.source not in spec.sources:
            errors.append(f"{where}: unknown source '{t.source}'")
        j = t.transform.join
        if j is not None:
            if not j.with_source:
                errors.append(f"{where}: join needs a 'with' source")
            elif j.with_source not in spec.sources:
                errors.append(f"{where}: join with unknown source "
                              f"'{j.with_source}'")
            elif j.with_source == t.source:
                errors.append(f"{where}: join 'with' must name a "
                              f"different source than the target's")
            if not j.on:
                errors.append(f"{where}: join needs at least one 'on' key")
            if j.how not in ("inner", "left"):
                errors.append(f"{where}: join 'how' must be inner|left, "
                              f"got '{j.how}'")
        for u in t.transform.union:
            if u not in spec.sources:
                errors.append(f"{where}: union with unknown source '{u}'")
            elif u == t.source:
                errors.append(f"{where}: union must name a different "
                              f"source than the target's")
        if t.target_type == TargetType.node:
            if not t.labels:
                errors.append(f"{where}: node target needs at least one label")
            if not t.mappings_by(FragmentType.node, RoleType.key):
                errors.append(f"{where}: node target needs at least one key")
        else:
            if not t.edge_type:
                errors.append(f"{where}: edge target needs a type")
            for frag in (FragmentType.source, FragmentType.target):
                if not t.mappings_by(frag, RoleType.key):
                    errors.append(f"{where}: edge target needs a {frag.value} key")
        # Aggregation aliases must not collide with mapped source fields
        # (reference: InputValidator.java:165-172).
        mapped = set(t.mapped_fields)
        agg_fields = {a.field for a in t.transform.aggregations}
        overlap = mapped & agg_fields - {m.field for m in t.mappings if m.field in agg_fields}
        # An aggregation alias may itself be mapped (it becomes a column);
        # the error case is an aggregation alias shadowing a *source*
        # field that is also grouped on.
        group_fields = mapped - agg_fields
        bad = group_fields & agg_fields
        if bad:
            errors.append(f"{where}: aggregation aliases shadow grouped fields: {sorted(bad)}")
        del overlap

    # Connector-style option whitelist (InputValidator.java:35-44,
    # 175-184). The reference hard-errors on ANY unknown option; we keep
    # that for relationship.* keys (clear typos) and warn on others,
    # since plain options also serve as $token values in this engine.
    from dataflow_flex_templates_spark.spec.refactor import (
        CONNECTOR_OPTION_KEYS,
    )

    for key in spec.options:
        if key in CONNECTOR_OPTION_KEYS:
            continue
        if key.startswith("relationship") or strict:
            errors.append(f"invalid option specified: {key}")
        else:
            warnings.append(f"option '{key}' used only for $token substitution")

    known_names = set(spec.sources) | {t.name for t in spec.targets} | {
        a.name for a in spec.actions}
    for a in spec.actions:
        if a.action_type in ("http_get", "http_post") and "url" not in a.options:
            errors.append(f"action '{a.name}': http action needs a url option")
        if a.action_type in ("cypher", "bigquery", "sql") and not (
            a.options.get("cypher") or a.options.get("sql")
        ):
            errors.append(f"action '{a.name}': needs a sql/cypher option")
        if a.execute_after_name and a.execute_after_name not in known_names:
            warnings.append(
                f"action '{a.name}': execute_after_name "
                f"'{a.execute_after_name}' matches no source/target/action "
                "— it will never fire")

    if errors:
        raise SpecValidationError(errors)
    return warnings
