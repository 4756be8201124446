from .query import Field, Filter, Join, Query, build_dataframe  # noqa: F401
