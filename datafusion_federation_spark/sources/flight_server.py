"""In-process Arrow Flight server over a DuckDB connection — the
Flight-as-SQL-transport shape FlightSQLExecutor speaks (reference
executor dialect 'flight', src/sql/executor.rs:32-33):

- do_get(Ticket=SQL bytes) -> Arrow record-batch stream
- list_flights()           -> table-name descriptors (discovery)
- get_schema(path)         -> LIMIT-0 Arrow schema (introspection)

Shared by the live tests (tests/test_flight_executor.py), the runnable
demo (examples/flight_demo.py), and the oracle-gate row q77 — one
server definition so the three can't drift. Import is lazy-guarded:
environments without pyarrow.flight get the ImportError at
construction, not module import.
"""

from __future__ import annotations

import threading


class DuckDBFlightServer:
    """Start with ``DuckDBFlightServer(conn)``; ``.port`` is the bound
    ephemeral port; ``.shutdown()`` stops serving. The DuckDB
    connection is guarded by a lock (DuckDB connections are not
    thread-safe; Flight handlers run on gRPC threads)."""

    def __init__(self, conn, location: str = "grpc://127.0.0.1:0"):
        import pyarrow.flight as fl

        lock = threading.Lock()

        class _Impl(fl.FlightServerBase):
            def do_get(self, context, ticket):
                sql = ticket.ticket.decode("utf-8")
                with lock:
                    table = conn.execute(sql).fetch_arrow_table()
                return fl.RecordBatchStream(table)

            def list_flights(self, context, criteria):
                with lock:
                    rows = conn.execute(
                        "SELECT table_name FROM information_schema."
                        "tables WHERE table_schema = 'main'").fetchall()
                for (name,) in rows:
                    desc = fl.FlightDescriptor.for_path(name)
                    with lock:
                        sch = conn.execute(
                            f'SELECT * FROM "{name}" LIMIT 0'
                        ).fetch_arrow_table()
                    yield fl.FlightInfo(sch.schema, desc, [], -1, -1)

            def get_schema(self, context, descriptor):
                name = descriptor.path[0].decode("utf-8")
                with lock:
                    sch = conn.execute(
                        f'SELECT * FROM "{name}" LIMIT 0'
                    ).fetch_arrow_table()
                return fl.SchemaResult(sch.schema)

        self._impl = _Impl(location)

    @property
    def port(self) -> int:
        return self._impl.port

    def shutdown(self) -> None:
        self._impl.shutdown()
