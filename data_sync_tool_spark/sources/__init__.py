from .lake import LakeTable  # noqa: F401
from .registry import read_table, TPCH_TABLES  # noqa: F401
