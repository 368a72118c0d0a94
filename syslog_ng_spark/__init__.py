"""syslog_ng_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of syslog-ng (reference:
/root/reference), plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing), designed for 100 TB-scale
clusters.

Everything is declarative DataFrame/SQL; Catalyst owns the physical
plan. See SURVEY.md for the operator inventory.
"""

from syslog_ng_spark.session import get_session  # noqa: F401

__version__ = "0.1.0"
