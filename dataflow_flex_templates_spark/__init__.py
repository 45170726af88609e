"""dataflow_flex_templates_spark — a from-scratch PySpark-native
streaming graph-ETL engine with the query/data-processing capabilities
of the ``neo4j-partners/dataflow-flex-templates`` Dataflow template.

The reference (Java / Apache Beam) compiles a JSON *job spec* — sources,
node/edge *targets* with field mappings, transforms, actions — into a
Beam pipeline that upserts rows into Neo4j. This engine compiles the
same spec language into Spark DataFrame / Structured Streaming plans and
materializes the property graph as ``nodes`` / ``relationships`` tables
with exactly-once, MERGE-style last-writer-wins semantics.

Nothing here is a port: execution is Catalyst/Tungsten all the way down;
custom code is confined to the spec compiler, the keyed-dedup state
function, the exactly-once sink, and vectorized (Arrow) audio/text UDFs.
"""

__version__ = "0.1.0"

from dataflow_flex_templates_spark.spec.model import (  # noqa: F401
    Aggregation,
    Config,
    FragmentType,
    JobSpec,
    Mapping,
    PropertyType,
    RoleType,
    SaveMode,
    Source,
    Target,
    TargetType,
    Transform,
)
from dataflow_flex_templates_spark.spec.parser import parse_job_spec  # noqa: F401
