"""datafusion_federation_spark — a PySpark-native federation + analytics
engine with the capabilities of datafusion-contrib/datafusion-federation
(reference read-only at /root/reference), re-architected Spark-first.

Layers:
- expressions / plans: the logical IR (SURVEY.md §2C surface)
- federation: largest single-provider subtree grouping (§2B)
- unparser + dialects: plan -> remote SQL (the reference used DataFusion's)
- sources: providers, executors (DuckDB/JDBC/Spark), catalog
- schema_cast: remote-result coercion (§2A)
- compiler: local residue -> declarative DataFrame ops (Catalyst executes)
- operators: 100 TB-scale LLM-pipeline extensions (dedup, similarity,
  text analysis, multimodal)
"""

from .engine import FederationEngine, PlanBuilder  # noqa: F401
from .expressions import (  # noqa: F401
    agg, col, func, lit, AggFunc, Alias, Between, BinaryOp, Case, Cast, Col,
    Cube, Exists, Expr, Func, GroupingSets, InList, InSubquery, Like, Lit,
    Placeholder, Rollup, ScalarSubquery, ScalarVariable, SetComparison,
    SimilarTo, SortKey, Star, Unnest, WindowFrame, WindowFunc,
    bind_placeholders,
)
from .federation import ScanResult, federate  # noqa: F401
from .plans.nodes import Analyze  # noqa: F401
from .sources import (  # noqa: F401
    DuckDBExecutor, EphemeralPostgres, FederatedCatalog,
    FederationProvider, FlightSQLExecutor, JDBCExecutor,
    LocalSparkProvider, PostgresExecutor, RemoteTable, RemoteTableRef,
    SQLExecutor, SQLiteExecutor, SQLProvider, SparkSQLExecutor,
    TableHandle, UnknownTableError,
)
from .unparser import Unparser  # noqa: F401

__version__ = "0.1.0"
