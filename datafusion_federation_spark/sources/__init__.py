from .table import RemoteTable, RemoteTableRef, TableHandle  # noqa: F401
from .provider import (  # noqa: F401
    DuckDBExecutor, FederationProvider, FlightSQLExecutor, JDBCExecutor,
    LocalSparkProvider, SQLExecutor, SQLiteExecutor, SQLProvider,
    SparkSQLExecutor,
)
from .catalog import FederatedCatalog, UnknownTableError  # noqa: F401
from .partitioned import (  # noqa: F401
    PartitionedDuckDBExecutor, read_duckdb_partitioned,
)
from .postgres import (  # noqa: F401
    EphemeralPostgres, PartitionedPostgresExecutor, PostgresExecutor,
    ephemeral_postgres_available, read_postgres_partitioned,
)
