"""sydraQL front-end: lexer → parser → validator → DataFrame translator.

This mirrors the reference query pipeline (src/sydra/query/exec.zig:14-61:
parse → validate → logical plan → optimize → physical → Volcano executor)
but stops at the logical level: the "physical plan" is a Spark DataFrame and
Catalyst replaces the reference's optimizer + executor entirely
(SURVEY.md §4.3).
"""

from sydradb_spark.sydraql.engine import SydraQLEngine  # noqa: F401
from sydradb_spark.sydraql.parser import parse  # noqa: F401
from sydradb_spark.sydraql.validator import validate  # noqa: F401
