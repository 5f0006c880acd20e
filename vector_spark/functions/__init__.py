"""VRL-stdlib → Spark Column translation layer (SURVEY.md §2.4).

Import surface:
    from vector_spark.functions import parse, strings, conditions, ip, grok
"""

from vector_spark.functions import conditions, grok, ip, parse, strings  # noqa: F401
