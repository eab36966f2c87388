"""legend_community_delta_spark — a PySpark-native Legend analytics engine.

A standalone re-implementation of the capabilities of
finos/legend-community-delta (see SURVEY.md): PURE entity models compiled
to Spark schemas, data-quality expectations, derived columns and full SQL
queries — plus large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) the original never had.

Public API (SURVEY §2.D parity):

>>> from legend_community_delta_spark import Legend, LegendFileLoader
>>> legend = LegendFileLoader.loadResources("/path/to/entities")
>>> legend.get_schema("db::entity::employee")
>>> legend.get_expectations("db::mapping::employee_delta")
>>> df = legend.query("db::service::skills")
"""

from .dataframe import dq_metrics, legend_transform, legend_validate
from .legend import Legend, LegendFileLoader
from .model.entities import LegendModelError
from .model.loader import LegendModel, load_dicts, load_resources

__all__ = [
    "Legend",
    "LegendFileLoader",
    "LegendModel",
    "LegendModelError",
    "dq_metrics",
    "legend_transform",
    "legend_validate",
    "load_dicts",
    "load_resources",
]

__version__ = "0.1.0"
