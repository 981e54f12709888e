"""RemoteTableRef parsing — port of the reference's table_reference tests
(/root/reference/datafusion-federation/src/sql/table_reference.rs:154-290):
bare/partial names, positional args, whitespace tolerance, named args,
case preservation, quoted parts.
"""

from __future__ import annotations

import pytest

from datafusion_federation_spark.dialects import get_dialect, split_table_name
from datafusion_federation_spark.sources.table import RemoteTableRef

ANSI = get_dialect("ansi")


def test_bare_table_reference():
    r = RemoteTableRef.parse("table")
    assert list(r.parts) == ["table"] and r.args is None
    # case preserved (table_reference.rs:168-171)
    r = RemoteTableRef.parse("Table")
    assert list(r.parts) == ["Table"]


def test_bare_with_args():
    r = RemoteTableRef.parse("table(1, 2)")
    assert list(r.parts) == ["table"]
    assert r.args == ["1", "2"]


def test_bare_with_args_and_whitespace():
    # "table (1, 2)" — whitespace between name and args tolerated
    r = RemoteTableRef.parse("table (1, 2)")
    assert list(r.parts) == ["table"]
    assert r.args == ["1", "2"]


def test_partial_reference():
    r = RemoteTableRef.parse("schema.table")
    assert list(r.parts) == ["schema", "table"]
    assert r.name == "table"


def test_partial_with_args():
    r = RemoteTableRef.parse("schema.table(1, 2)")
    assert list(r.parts) == ["schema", "table"]
    assert r.args == ["1", "2"]


def test_named_args():
    # postgres-style named args (table_reference.rs:267-289)
    r = RemoteTableRef.parse("Table (user_id => 1, age => 2)")
    assert list(r.parts) == ["Table"]
    assert r.args == ["user_id => 1", "age => 2"]


def test_string_arg_with_comma():
    r = RemoteTableRef.parse("view(name => 'a,b')")
    assert r.args == ["name => 'a,b'"]


def test_to_sql_roundtrip():
    r = RemoteTableRef.parse('"default".remote_table')
    assert r.to_sql(ANSI) == '"default"."remote_table"'
    r = RemoteTableRef.parse("table_b1(1)")
    assert r.to_sql(ANSI) == '"table_b1"(1)'


def test_full_three_part_name():
    r = RemoteTableRef.parse("cat.schema.table")
    assert list(r.parts) == ["cat", "schema", "table"]


def test_too_many_parts_rejected():
    with pytest.raises(ValueError):
        split_table_name("a.b.c.d")


def test_quoted_part_with_dot():
    parts = split_table_name('"my.schema".table')
    assert parts == ["my.schema", "table"]
