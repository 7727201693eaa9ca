"""ex_hivent_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the `hivent/ex-hivent` reference (an
Elixir event-bus client: event envelope, emit/consume/partition/quarantine
semantics), extended with a batch relational operator surface, Structured
Streaming consumers, and LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Everything is built on the public PySpark DataFrame/SQL API: plans are
declared declaratively so Catalyst handles pushdown, pruning, join
selection, and AQE handles skew/coalescing at scale. No custom Catalyst
rules are needed (see SURVEY.md §4.2).
"""

__version__ = "0.1.0"

from ex_hivent_spark.session import get_session  # noqa: F401
from ex_hivent_spark.catalog import Catalog, TABLES  # noqa: F401
