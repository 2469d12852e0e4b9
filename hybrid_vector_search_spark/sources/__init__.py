from .loaders import TABLES, fan_out, load_table, register_views  # noqa: F401
