"""Federated catalog — schema discovery + registry.

Mirrors SQLSchemaProvider / MultiSchemaProvider (reference
datafusion-federation/src/sql/schema.rs:12-143): discover table names from
each remote, fetch schemas, register handles under local names;
first-match-wins across providers (schema.rs:131-138).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .provider import LocalSparkProvider, SQLProvider
from .table import RemoteTable, RemoteTableRef, TableHandle


class UnknownTableError(KeyError):
    """A name is not in the federation catalog (r13). Subclassing
    KeyError keeps every existing `except KeyError` fallback working,
    while letting engine.sql's DML routing catch EXACTLY the
    unresolved-table case instead of any KeyError a deep code path
    might raise — a broad catch there would silently reroute genuine
    bugs to the view fallback."""

_LOCAL = LocalSparkProvider()


class FederatedCatalog:
    def __init__(self, spark):
        self.spark = spark
        self._tables: Dict[str, TableHandle] = {}

    # ------------------------------------------------------------------
    def _register_local_file(self, name: str, path: str,
                             fmt: str) -> TableHandle:
        """Shared path-backed registration (parquet/ORC — one place for
        the schema-capture policy, review r7).

        Schema is captured at registration (a footer read, no data
        scan) for the same reason register_local_df attaches it:
        without it this table's columns are invisible to filter-side
        attribution, so a bare remote-column predicate above a
        local⋈remote join could not be PROVEN unambiguous and
        push_filters refused to move it into the remote claim (found
        r7: `WHERE n_regionkey < 4` shipped `SELECT * FROM nation`).
        Unreadable-at-registration schemas (e.g. TIMESTAMP(NANOS)
        without the legacy conf — the events fixture) degrade to None:
        registration still succeeds, optimizer passes just stay
        conservative for that table, and the read error surfaces at
        first use exactly as before."""
        try:
            schema = self.spark.read.format(fmt).load(path).schema
        except Exception:  # noqa: BLE001 - degrade, do not fail register
            schema = None
        h = TableHandle(local_name=name, provider=_LOCAL,
                        fallback_path=path, schema=schema,
                        fallback_format=fmt)
        self._tables[name] = h
        return h

    def register_local_parquet(self, name: str, path: str) -> TableHandle:
        """A native Spark table (Nop provider in the lattice); see
        _register_local_file for the schema-capture policy."""
        return self._register_local_file(name, path, "parquet")

    def register_local_csv(self, name: str, path: str,
                           header: bool = True,
                           infer_schema: bool = True,
                           **options) -> TableHandle:
        """A native Spark table from CSV (the reference's own examples
        are CSV-backed: examples/df-csv.rs registers test.csv). Reads
        through Spark's CSV source — schema inference at registration,
        then the standard temp-view local path (same optimizer
        visibility as any register_local_df table)."""
        reader = self.spark.read.option("header", str(header).lower()) \
            .option("inferSchema", str(infer_schema).lower())
        for k, v in options.items():
            reader = reader.option(k, v)
        return self.register_local_df(name, reader.csv(path))

    def register_local_json(self, name: str, path: str,
                            **options) -> TableHandle:
        """A native Spark table from JSON-lines (schema inferred at
        registration; pass explicit reader options through)."""
        reader = self.spark.read
        for k, v in options.items():
            reader = reader.option(k, v)
        return self.register_local_df(name, reader.json(path))

    def register_local_orc(self, name: str, path: str) -> TableHandle:
        """A native Spark table from ORC (footer schema, predicate
        pushdown and column pruning all come from Spark's built-in ORC
        source) — completes the file-format set Spark ships natively
        (parquet/CSV/JSON/ORC)."""
        return self._register_local_file(name, path, "orc")

    def register_local_df(self, name: str, df) -> TableHandle:
        """A native Spark table from an EXISTING DataFrame (temp view
        under the hood) — for inputs that need Spark-side preparation a
        raw path read cannot express (e.g. the events fixture's
        TIMESTAMP(NANOS) normalization, queries.t)."""
        df.createOrReplaceTempView(name)
        # schema attached: scan pruning / filter-side attribution /
        # shell schema inference all read it (review r5 — without it
        # this table's columns are invisible to every optimizer pass)
        h = TableHandle(local_name=name, provider=_LOCAL,
                        schema=df.schema)
        self._tables[name] = h
        return h

    def register_remote(self, provider: SQLProvider, local_name: str,
                        remote_name: Optional[str] = None,
                        schema=None) -> TableHandle:
        """Register one remote table under a local name; schema fetched
        from the remote when not supplied (SQLTableSource::new analog,
        reference src/sql/table.rs:126-133)."""
        remote = RemoteTable.named(remote_name or local_name, schema=schema)
        if schema is None:
            try:
                # full dotted name: introspecting only the last part would
                # read a same-named table from the default search path on
                # schema-qualified remotes
                remote.schema = provider.executor.get_table_schema(
                    self.spark, ".".join(remote.ref.parts))
            except NotImplementedError:
                pass
        h = TableHandle(local_name=local_name, provider=provider,
                        remote=remote, schema=remote.schema)
        self._tables[local_name] = h
        return h

    def discover(self, provider: SQLProvider,
                 prefix: str = "") -> List[TableHandle]:
        """Register every table the remote reports
        (SQLSchemaProvider::new — executor.table_names())."""
        out = []
        for name in provider.executor.table_names():
            local = prefix + RemoteTableRef.parse(name).name
            if local in self._tables:   # first-match-wins
                continue
            out.append(self.register_remote(provider, local, name))
        return out

    # ------------------------------------------------------------------
    def table(self, name: str) -> TableHandle:
        try:
            return self._tables[name]
        except KeyError:
            raise UnknownTableError(
                f"table {name!r} not registered; have "
                f"{sorted(self._tables)}")

    def tables(self) -> List[str]:
        return sorted(self._tables)
