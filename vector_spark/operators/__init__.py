"""Vector transform inventory as Spark DataFrame stages (SURVEY.md §2.2)."""

from vector_spark.operators.aggregate import Aggregate  # noqa: F401
from vector_spark.operators.base import FallibleTransform, Transform, compose  # noqa: F401
from vector_spark.operators.dedupe import Dedupe  # noqa: F401
from vector_spark.operators.fields import (  # noqa: F401
    AddFields,
    AddTags,
    AnsiStripper,
    Coercer,
    Concat,
    RemoveFields,
    RemoveTags,
    RenameFields,
    render_template,
)
from vector_spark.operators.filter import FieldFilter, Filter  # noqa: F401
from vector_spark.operators.log_to_metric import LogToMetric, MetricSpec, sink_metrics  # noqa: F401
from vector_spark.operators.merge import MergePartials  # noqa: F401
from vector_spark.operators.metric_to_log import MetricToLog  # noqa: F401
from vector_spark.operators.reduce import Reduce  # noqa: F401
from vector_spark.operators.remap import (  # noqa: F401
    GrokParser,
    JsonParser,
    KeyValueParser,
    RegexParser,
    Remap,
    Split,
    Tokenizer,
)
from vector_spark.operators.route import Route  # noqa: F401
from vector_spark.operators.sample import Sample  # noqa: F401
from vector_spark.operators.tag_cardinality_limit import TagCardinalityLimit  # noqa: F401
