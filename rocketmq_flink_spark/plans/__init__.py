"""Query catalog + oracle harness.

`catalog.REGISTRY` maps query name -> (spark callable, DuckDB oracle SQL).
This is the engine's declared capability surface: every operator from
SURVEY.md §2 that is implemented has an entry here, and __spark_entry__
exposes the registry to the driver's correctness gate.
"""

from rocketmq_flink_spark.plans.catalog import REGISTRY, QueryDef  # noqa: F401
