from .nodes import (  # noqa: F401
    Aggregate, Distinct, Filter, Join, LateralJoin, Limit, OneRow, Plan,
    Project,
    RemoteQueryNode,
    RecursiveCTE, RecursiveRef, Scan, SetOp, Sort, SubqueryAlias, Union,
    Window, walk_plan,
)
