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

from dataflow_flex_templates_spark.spec.model import JobSpec, TargetType

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
