"""Topic/tag selectors (SURVEY.md §2.4 R1-R3).

The reference routes each outgoing record to a (topic, tag) via
TopicSelector implementations (legacy/common/selector/):
- DefaultTopicSelector.java:19-41 — constant topic/tag;
- SimpleTopicSelector.java:25-75 — topic/tag read from record fields,
  falling back to defaults when absent.

Spark-first equivalent: selectors are plain Column expressions consumed
by encode_rows(topic_col=...) / the `tags` routing options — Catalyst
evaluates them JVM-side, and the multi-topic sink groups rows by the
resulting topic value.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def default_topic_selector(topic: str) -> Column:
    """Constant topic for every record (DefaultTopicSelector)."""
    return F.lit(topic)


def simple_topic_selector(topic_field: str, default_topic: str) -> Column:
    """Topic from a record field with a default (SimpleTopicSelector:
    tuple field lookup, default when the field is null/missing)."""
    return F.coalesce(F.col(topic_field).cast("string"), F.lit(default_topic))


def default_tag_selector(tag: str) -> Column:
    """Constant tag (DefaultTopicSelector's tag half)."""
    return F.lit(tag)


def simple_tag_selector(tag_field: str, default_tag: str) -> Column:
    """Tag from a record field with a default."""
    return F.coalesce(F.col(tag_field).cast("string"), F.lit(default_tag))
