from .nodes import (  # noqa: F401
    Aggregate, Distinct, Filter, Join, Limit, Plan, Project, RemoteQueryNode,
    Scan, SetOp, Sort, SubqueryAlias, Union, Window, walk_plan,
)
